"""Optimization drivers and logging."""
