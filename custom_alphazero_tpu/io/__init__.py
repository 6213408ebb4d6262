"""Checkpointing, metrics, run layout."""
