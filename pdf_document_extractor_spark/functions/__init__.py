"""Scalar function library (JVM-side Catalyst expressions, no Python UDFs)."""
