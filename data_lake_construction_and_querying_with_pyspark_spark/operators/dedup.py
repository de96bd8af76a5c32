"""Placeholder — filled in the dedup wave."""
