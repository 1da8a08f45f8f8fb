"""Scalar / array / JSON expression surface (SURVEY §2.8)."""
