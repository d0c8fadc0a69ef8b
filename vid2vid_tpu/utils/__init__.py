"""Visualization, logging, image conversion utilities."""
