"""Catalog queries — filled in incrementally."""
