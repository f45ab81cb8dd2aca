"""Table sources: driver parquet star schema + derived interleaved corpus."""
