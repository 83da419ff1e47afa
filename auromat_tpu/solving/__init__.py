"""Offline astrometric calibration: star-field masking + astrometry.net.

This is host-side CV/subprocess work (reference layer L4) that produces the
``.wcs`` solutions consumed by the device georeferencing pipeline.
"""
