"""Small-scale demonstrations of the BASELINE.json workload configs.

Config 1 (single ISS frame, CPU parity) is tests/test_georef_parity.py.
Configs 4-5 (frame-sharded burst; mesh-sharded mosaic with psum'd bins) are
tests/test_sharding.py. This module covers the remaining batch shapes:

* config 2 - multi-station batch (THEMIS-style): stations stacked on a
  batch axis, one vmapped georef + summed partial bins;
* config 3 - one frame at the reference's 3 emission altitudes (90/110/150
  km, reference themis.py:286-323) via vmap over DynGeorefParams.altitude.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auromat_tpu.coordinates.wcs import TanWcs
from auromat_tpu.io import fits
from auromat_tpu.ops.georef import (
    DynGeorefParams,
    GeorefParams,
    georef_latlon_dyn,
    georeference_points,
)
from auromat_tpu.ops.regrid import bin_partial, finalize_mean, fixed_grid

RES = os.path.join(os.path.dirname(__file__), "resources")


@pytest.fixture(scope="module")
def frame_params():
    header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
    pos = np.array(fits.get_shifted_spacecraft_position(header)[:3])
    return GeorefParams.from_wcs(
        TanWcs(header), pos, fits.get_photo_time(header), 110.0
    )


def _pixel_grid(params, stride=64):
    px, py = np.meshgrid(
        np.arange(0, params.width, stride, dtype=np.float64),
        np.arange(0, params.height, stride, dtype=np.float64),
    )
    return px, py


def test_config3_multi_altitude_vmap(frame_params):
    """One frame georeferenced at 90/110/150 km in ONE vmapped call."""
    altitudes = [90.0, 110.0, 150.0]
    p110 = DynGeorefParams.from_static(frame_params)
    batched = jax.tree.map(
        lambda x: jnp.stack([x] * 3), p110
    )._replace(altitude=jnp.asarray(altitudes, dtype=jnp.float64))
    px, py = _pixel_grid(frame_params)

    out = jax.vmap(lambda d: georef_latlon_dyn(d, px, py, dtype=jnp.float64))(
        batched
    )
    assert out["lat"].shape == (3,) + px.shape

    # each altitude slice must equal the independent single-altitude run
    for i, alt in enumerate(altitudes):
        p = dataclasses.replace(frame_params, altitude=alt)
        lat_i, lon_i = georeference_points(p, px, py)[:2]
        np.testing.assert_allclose(
            np.asarray(out["lat"][i]), np.asarray(lat_i), atol=1e-9, equal_nan=True
        )
        np.testing.assert_allclose(
            np.asarray(out["lon"][i]), np.asarray(lon_i), atol=1e-9, equal_nan=True
        )

    # a higher emission altitude pushes the horizon out: strictly more hits
    hits = [int((~np.isnan(np.asarray(out["lat"][i]))).sum()) for i in range(3)]
    assert hits[0] <= hits[1] <= hits[2]


def test_config2_station_batch_regrid(frame_params):
    """Multi-station batch: vmapped georef + one combined regrid equals the
    per-station loop (the reference's 24-ASI serial loop, themis.py:465-473).
    Synthetic 'stations' = the real frame with shifted camera positions."""
    shifts = np.array([[0.0, 0.0, 0.0], [10.0, -5.0, 3.0], [-8.0, 12.0, -6.0]])
    dyns = [
        DynGeorefParams.from_static(
            dataclasses.replace(
                frame_params,
                camera_pos=tuple(np.asarray(frame_params.camera_pos) + s),
            )
        )
        for s in shifts
    ]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *dyns)
    px, py = _pixel_grid(frame_params)
    grid = fixed_grid((6, 4), 40.0, 65.0, -115.0, -85.0)

    def station_bins(d):
        out = georef_latlon_dyn(d, px, py, dtype=jnp.float64,
                                with_elevation=True)
        data = out["elevation"][..., None].astype(jnp.float32)
        return bin_partial(grid, out["lat"].astype(jnp.float32),
                           out["lon"].astype(jnp.float32), data, "sorted")

    counts_b, sums_b = jax.vmap(station_bins)(batched)
    count = jnp.sum(counts_b, axis=0)
    sums = jnp.sum(sums_b, axis=0)

    # oracle: serial per-station loop
    count_ref = np.zeros_like(np.asarray(count))
    sums_ref = np.zeros_like(np.asarray(sums))
    for d in dyns:
        c, s = station_bins(d)
        count_ref += np.asarray(c)
        sums_ref += np.asarray(s)
    np.testing.assert_array_equal(np.asarray(count), count_ref)
    np.testing.assert_allclose(np.asarray(sums), sums_ref, rtol=1e-6)

    means = np.asarray(finalize_mean(count, sums))
    assert np.isfinite(means[np.asarray(count) > 0]).all()
