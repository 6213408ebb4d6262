"""Visualization and profiling tools."""
