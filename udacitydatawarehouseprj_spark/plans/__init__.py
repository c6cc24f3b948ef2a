"""Logical plans — the star-schema build and physical layout policy."""
