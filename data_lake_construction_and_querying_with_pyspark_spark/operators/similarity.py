"""Placeholder — filled in the similarity wave."""
