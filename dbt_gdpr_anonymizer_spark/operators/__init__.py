"""Validation, audit, and large-scale corpus operators."""
