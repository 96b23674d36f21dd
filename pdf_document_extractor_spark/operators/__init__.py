"""Spark DataFrame operators (declarative, Catalyst-optimizable)."""
