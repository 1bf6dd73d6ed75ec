"""Scoring kernels and pandas-UDF wrappers (the engine's function library)."""
