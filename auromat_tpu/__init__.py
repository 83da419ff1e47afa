"""
auromat_tpu — a TPU-native (JAX/XLA/Pallas) aurora georeferencing framework.

A ground-up redesign of the capabilities of ESA's AUROMAT toolkit
(reference: /root/reference/auromat) for TPU hardware:

* the per-pixel camera->sky->Earth georeferencing chain (WCS TAN projection,
  ray/ellipsoid intersection, frame rotations, Bowring geodetic conversion)
  is a fused, jit-compiled device computation (`auromat_tpu.ops.georef`),
* regridding onto fixed plate-carree grids is a device binning kernel
  (`auromat_tpu.ops.regrid`),
* frame batches `vmap`/`pjit` over `jax.sharding.Mesh` axes
  (`auromat_tpu.parallel`),
* file I/O (FITS/CDF/netCDF/images), TLE ephemeris and star-field solving
  remain thin host-side layers feeding device arrays.

Precision note: the library enables JAX x64 support at import time. Geodetic
parity with the CPU reference (<1e-6 deg) requires float64 in the coordinate
chain; on TPU hardware the hot kernels use float32 with compensated
("double-float") arithmetic instead — see `auromat_tpu.ops.dfloat`.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from auromat_tpu import constants  # noqa: E402,F401
