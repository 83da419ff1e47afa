"""Coordinate-system math: the numeric core of the framework.

Device code (jax.numpy, dtype-polymorphic, jit/vmap-safe):
  transform, intersection, wcs
Host code (per-frame float64 scalars/3x3 matrices):
  frames, igrf
"""
