"""spark-submit job entry points (replay, maintenance)."""
