"""Placeholder — populated during round 1 build."""
