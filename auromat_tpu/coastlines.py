"""Bundled coarse world coastline for out-of-box map backgrounds.

The reference draws coastlines via Basemap's bundled GSHHS data
(reference draw.py:319-362). Here a coarse hand-digitized coastline
(~2-4 deg fidelity, auroral-zone coasts densest) ships as an npz resource
(auromat_tpu/resources/coastlines_coarse.npz, regenerable with
tools/build_coastlines.py) — geographic context for diagnostic plots.
For publication-grade maps pass your own GSHHS/Natural Earth polylines to
``draw_stereographic(coastlines=...)``.
"""

import os

import numpy as np

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "resources", "coastlines_coarse.npz")
_cache = None


def coastline_latlon():
    """The bundled coastline as an (n, 2) float32 array of [lat, lon]
    polyline vertices with NaN separators between segments (the format
    ``draw_stereographic(coastlines=...)`` consumes)."""
    global _cache
    if _cache is None:
        with np.load(_PATH) as d:
            _cache = np.stack([d["lats"], d["lons"]], axis=-1)
    return _cache
