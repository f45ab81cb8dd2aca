"""Checkpoint/resume state management (axis B of the north rule)."""
