"""Placeholder — filled in the text wave."""
