"""Operator library (SURVEY §2)."""
