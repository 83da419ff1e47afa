"""Pallas regrid kernel vs the XLA binning oracle (interpret mode on CPU)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from auromat_tpu.ops.regrid import bin_mean, fixed_grid
from auromat_tpu.ops.regrid_pallas import bin_mean_pallas


def synthetic(n=64, m=128, lat0=60.0, lon0=-100.0, spread=0.01, seed=7,
              holes=True, spill_rows=0):
    rng = np.random.default_rng(seed)
    lats = lat0 + np.cumsum(rng.random((n, m)) * spread, axis=0)
    lons = lon0 + np.cumsum(rng.random((n, m)) * spread, axis=1)
    if spill_rows:
        # emulate the horizon: a few rows whose cells spread far beyond any
        # 32x32 window
        lats[:spill_rows] += np.linspace(0, 20, m)[None, :]
        lons[:spill_rows] += np.linspace(0, 30, m)[None, :]
    if holes:
        yy, xx = np.mgrid[:n, :m]
        hole = (yy - n / 2) ** 2 + (xx - m / 2) ** 2 < (n / 6) ** 2
        lats[hole] = np.nan
        lons[hole] = np.nan
    # production contract: image channels are integer-valued (uint8/uint16
    # cast to float); the last channel (elevation) is arbitrary float
    data = np.round(rng.random((n, m, 4)) * 255).astype(np.float32)
    data[..., -1] = rng.random((n, m)) * 90
    return lats.astype(np.float32), lons.astype(np.float32), data


def nudge_off_edges(lats, lons, g, eps=1e-4):
    """Push samples off bin edges: the kernel bins in f32, the oracle in
    f64 — a sample within an f32 ulp of an edge may legitimately flip."""
    fy = (g.lat0 + g.lat_step / 2 - lats) / g.lat_step
    fx = (lons - (g.lon0 - g.lon_step / 2)) / g.lon_step
    lats = np.where(np.abs(fy - np.round(fy)) < eps, lats - g.lat_step * 4 * eps, lats)
    lons = np.where(np.abs(fx - np.round(fx)) < eps, lons + g.lon_step * 4 * eps, lons)
    return lats.astype(np.float32), lons.astype(np.float32)


@pytest.mark.parametrize("spill_rows", [0, 4])
def test_matches_oracle(spill_rows):
    lats, lons, data = synthetic(spill_rows=spill_rows)
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    count_ref, means_ref = bin_mean(g, lats, lons, data)
    count, means = bin_mean_pallas(g, lats, lons, data, interpret=True)
    count_ref, means_ref = np.asarray(count_ref), np.asarray(means_ref)
    count, means = np.asarray(count), np.asarray(means)
    assert_allclose(count, count_ref)
    assert np.array_equal(np.isnan(means), np.isnan(means_ref))
    m = ~np.isnan(means_ref)
    # plain-f32 matmul accumulation vs the compensated oracle: order noise
    # only (values are 0..255-scale imagery)
    assert_allclose(means[m], means_ref[m], rtol=1e-3, atol=0.05)


def test_non_tile_aligned_shape():
    lats, lons, data = synthetic(n=50, m=100)
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    count_ref, means_ref = bin_mean(g, lats, lons, data)
    count, means = bin_mean_pallas(g, lats, lons, data, interpret=True)
    assert_allclose(np.asarray(count), np.asarray(count_ref))
    m = ~np.isnan(np.asarray(means_ref))
    assert_allclose(np.asarray(means)[m], np.asarray(means_ref)[m],
                    rtol=1e-3, atol=0.05)


def test_all_masked_tile():
    lats, lons, data = synthetic()
    lats[:32, :64] = np.nan
    lons[:32, :64] = np.nan
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    count_ref, _ = bin_mean(g, lats, lons, data)
    count, _ = bin_mean_pallas(g, lats, lons, data, interpret=True)
    assert_allclose(np.asarray(count), np.asarray(count_ref))


def test_full_mode_float_channels():
    """'full' mode carries arbitrary float channels (uint16-scale).

    Compared against a float64 numpy oracle: at 65535-scale magnitudes the
    sorted path's f32 inner cumsum itself drifts ~1e-3 relative, while the
    base-256 digit split stays near-exact."""
    from auromat_tpu.ops.regrid import bin_indices

    lats, lons, data = synthetic()
    rng = np.random.default_rng(3)
    data = rng.random(data.shape).astype(np.float32) * 65535
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    flat, valid = map(np.asarray, bin_indices(g, lats.ravel(), lons.ravel()))
    nb = g.n_lat * g.n_lon
    n_ch = data.shape[-1]
    c_ref = np.bincount(flat[valid], minlength=nb).reshape(g.n_lat, g.n_lon)
    s_ref = np.zeros((nb, n_ch))
    np.add.at(s_ref, flat[valid],
              data.reshape(-1, n_ch)[valid].astype(np.float64))
    with np.errstate(invalid="ignore"):
        means_ref = s_ref.reshape(g.n_lat, g.n_lon, n_ch) / c_ref[..., None]
    count, means = bin_mean_pallas(g, lats, lons, data, "full", True)
    assert_allclose(np.asarray(count), c_ref)
    m = c_ref > 0
    assert_allclose(np.asarray(means)[m], means_ref[m], rtol=1e-5, atol=0.05)


def test_tiled_xla_matches_oracle():
    from auromat_tpu.ops.regrid import bin_partial_tiled, bin_partial

    lats, lons, data = synthetic(spill_rows=4)
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    cr, sr = bin_partial(g, lats, lons, data)
    c, s = bin_partial_tiled(g, lats, lons, data, "uint8")
    assert_allclose(np.asarray(c), np.asarray(cr))
    assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-4, atol=0.05)


def test_tiled_xla_full_mode():
    from auromat_tpu.ops.regrid import bin_partial_tiled, bin_partial

    lats, lons, data = synthetic()
    rng = np.random.default_rng(5)
    data = rng.random(data.shape).astype(np.float32) * 65535
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    cr, sr = bin_partial(g, lats, lons, data)
    c, s = bin_partial_tiled(g, lats, lons, data, "full")
    assert_allclose(np.asarray(c), np.asarray(cr))
    m = np.asarray(cr) > 0
    rel = np.abs(np.asarray(s)[m] - np.asarray(sr)[m]) / np.maximum(np.asarray(sr)[m], 1)
    assert rel.max() < 1e-4


def test_window_xla_matches_oracle():
    from auromat_tpu.ops.regrid import bin_partial_window, bin_partial

    lats, lons, data = synthetic(n=128, m=192, spill_rows=6)
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    cr, sr = bin_partial(g, lats, lons, data)
    c, s = bin_partial_window(g, lats, lons, data, "uint8")
    assert_allclose(np.asarray(c), np.asarray(cr))
    assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-4, atol=0.05)


def test_taint_semantics_match_sorted():
    """bin_mean_pallas_taint must reproduce the reference NaN-data
    semantics: a NaN sample at VALID coordinates taints its bin's mean in
    that channel only (numpy histogram2d behavior, which bin_mean keeps)."""
    from auromat_tpu.ops.regrid_pallas import bin_mean_pallas_taint

    lats, lons, data = synthetic()
    rng = np.random.default_rng(11)
    # NaN some data values at valid coordinates, per channel independently
    for ch in range(data.shape[-1]):
        hit = rng.random(data.shape[:2]) < 0.02
        data[..., ch] = np.where(hit, np.nan, data[..., ch])
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    count_ref, means_ref = map(np.asarray, bin_mean(g, lats, lons, data))
    count, means = map(np.asarray,
                       bin_mean_pallas_taint(g, lats, lons, data,
                                             interpret=True))
    assert_allclose(count, count_ref)
    assert np.array_equal(np.isnan(means), np.isnan(means_ref))
    m = ~np.isnan(means_ref)
    assert m.any() and (~m).any()
    assert_allclose(means[m], means_ref[m], rtol=1e-3, atol=0.05)


def test_bin_mean_rgbelev_matches_sorted_on_sanitized_data():
    """The flagship-kernel mean binning (ops.georegrid.bin_mean_rgbelev —
    resample's TPU fast path for RGB+elevation payloads) vs the sorted
    oracle on a sanitized-mapping-shaped payload (data NaN exactly where
    coordinates are NaN, per the mask invariants): identical counts and
    bit-equal integer channels, elevation to f32 tolerance."""
    from auromat_tpu.ops.georegrid import bin_mean_rgbelev

    lats, lons, data = synthetic()
    # sanitized pattern: NaN data exactly at the invalid (hole) pixels
    invalid = np.isnan(lats)
    data = np.where(invalid[..., None], np.nan, data)
    g = fixed_grid(25, np.nanmin(lats), np.nanmax(lats) + 0.1,
                   np.nanmin(lons), np.nanmax(lons) + 0.1)
    lats, lons = nudge_off_edges(lats, lons, g)
    count_ref, means_ref = map(np.asarray, bin_mean(g, lats, lons, data))
    count, means = map(np.asarray,
                       bin_mean_rgbelev(g, lats, lons, data, interpret=True))
    assert_allclose(count, count_ref)
    assert np.array_equal(np.isnan(means), np.isnan(means_ref))
    m = ~np.isnan(means_ref[..., :3])
    assert np.array_equal(means[..., :3][m], means_ref[..., :3][m])
    me = ~np.isnan(means_ref[..., 3])
    assert_allclose(means[..., 3][me], means_ref[..., 3][me],
                    rtol=1e-3, atol=0.05)
