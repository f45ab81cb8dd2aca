"""Plan inspection utilities (explain dumps for the headline queries)."""
