"""End-to-end job plans (spark-submit entry points)."""
