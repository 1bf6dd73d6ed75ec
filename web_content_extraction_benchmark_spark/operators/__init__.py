"""Relational and large-scale data-pipeline operators (DataFrame-first)."""
