"""Georeferenced-image data model and data providers."""
