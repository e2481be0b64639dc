"""Placeholder — populated as layers are built."""
