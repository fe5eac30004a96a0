"""Utilities: terminal styling, volume computation."""
