"""Fused georegrid fast path vs the XLA oracle (interpret mode on CPU),
plus the f32-vs-f64 bin-assignment error budget it relies on."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from auromat_tpu.coordinates.wcs import TanWcs
from auromat_tpu.io import fits
from auromat_tpu.ops.georef import (DynGeorefParams, GeorefParams,
                                    georef_latlon_dyn, georeference_points)
from auromat_tpu.ops.georegrid import bin_rgbelev_from_indices, georegrid_mean
from auromat_tpu.ops.regrid import bin_indices, bin_mean, fixed_grid

RES = os.path.join(os.path.dirname(__file__), "resources")


def small_params(w=128, h=96):
    """Real ISS calibration scaled down to a small pixel grid."""
    header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
    base = GeorefParams.from_wcs(
        TanWcs(header),
        fits.get_shifted_spacecraft_position(header)[:3],
        fits.get_photo_time(header),
        altitude=110.0,
    )
    scale = base.width / w
    return GeorefParams(
        width=w, height=h,
        cd=tuple(tuple(v * scale for v in row) for row in base.cd),
        px_ref=base.px_ref / scale, py_ref=base.py_ref / scale,
        rotmat=base.rotmat, camera_pos=base.camera_pos,
        altitude=base.altitude,
        mat_j2000_to_geo=base.mat_j2000_to_geo,
        mat_j2000_to_sm=base.mat_j2000_to_sm,
    ), base


@pytest.fixture(scope="module")
def setup():
    params, _ = small_params()
    dyn = DynGeorefParams.from_static(params, dtype=jnp.float32)
    h, w = params.height, params.width
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (3, h, w)).astype(np.float32)
    grid = fixed_grid((36, 25), 47.0, 62.0, -112.0, -91.0)
    return params, dyn, img, grid


def oracle(dyn, img, grid, mask=None):
    h, w = img.shape[1:]
    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    out = georef_latlon_dyn(dyn, px, py, dtype=jnp.float32,
                            with_elevation=True)
    lat, lon = out["lat"], out["lon"]
    if mask is not None:
        lat = jnp.where(mask, jnp.nan, lat)
        lon = jnp.where(mask, jnp.nan, lon)
    data = jnp.concatenate(
        [jnp.transpose(img, (1, 2, 0)), out["elevation"][..., None]], axis=-1)
    return bin_mean(grid, lat, lon, data, "sorted"), out


class TestGeoregrid:
    def test_matches_oracle(self, setup):
        _, dyn, img, grid = setup
        (count_ref, means_ref), out = oracle(dyn, img, grid)
        count, means = georegrid_mean(grid, dyn, img, interpret=True)
        count, means = np.asarray(count), np.asarray(means)
        count_ref, means_ref = np.asarray(count_ref), np.asarray(means_ref)
        assert count.sum() > 0
        # the fused path and the oracle are SEPARATE XLA programs; on CPU
        # their f32 georef chains round differently (fma contraction), so
        # pixels sitting on a cell edge may flip to the neighbouring cell
        # (on TPU the same program pair measured bit-identical). Allow
        # exactly that class of difference: +-1 count in a tiny cell set.
        assert count.sum() == count_ref.sum()
        d = count - count_ref
        assert np.abs(d).max() <= 1
        assert (d != 0).mean() < 1e-2, (d != 0).mean()
        same = (d == 0) & (count > 0)
        assert np.array_equal(np.isnan(means[same]), np.isnan(means_ref[same]))
        ok = same[..., None] & ~np.isnan(means_ref)
        assert_allclose(means[ok], means_ref[ok], rtol=1e-3, atol=0.05)

    def test_mask_excludes_pixels(self, setup):
        _, dyn, img, grid = setup
        h, w = img.shape[1:]
        mask = np.zeros((h, w), dtype=bool)
        mask[: h // 2] = True
        (count_ref, _), _ = oracle(dyn, img, grid, jnp.asarray(mask))
        count, _ = georegrid_mean(grid, dyn, img, mask=jnp.asarray(mask),
                                  interpret=True)
        count, count_ref = np.asarray(count), np.asarray(count_ref)
        assert count.sum() == count_ref.sum()
        assert np.abs(count - count_ref).max() <= 1

    def test_f32_bin_assignment_budget(self, setup):
        """The documented error budget: vs the f64 chain, only pixels
        within the f32 chain error (measured ~4e-5 deg) of a cell edge
        can flip bins — a ~1.4e-3 fraction at 100 arcsec cells."""
        params, dyn, img, grid = setup
        h, w = params.height, params.width
        px, py = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        lat64, lon64 = georeference_points(params, px, py, dtype=jnp.float64)
        i64, v64 = bin_indices(grid, jnp.ravel(lat64), jnp.ravel(lon64))
        px32, py32 = px.astype(np.float32), py.astype(np.float32)
        out = georef_latlon_dyn(dyn, jnp.asarray(px32), jnp.asarray(py32),
                                dtype=jnp.float32)
        i32, v32 = bin_indices(grid, jnp.ravel(out["lat"]),
                               jnp.ravel(out["lon"]))
        i64, i32 = np.asarray(i64), np.asarray(i32)
        v = np.asarray(v64) & np.asarray(v32)
        assert v.sum() > 1000
        flips = (i64[v] != i32[v]).mean()
        assert flips < 5e-3, flips
        # validity itself must agree except at the same edge-band level
        assert (np.asarray(v64) != np.asarray(v32)).mean() < 5e-3


@pytest.mark.slow
def test_oversized_grid_slabs_bit_identically(setup):
    """Grids whose accumulator exceeds the VMEM budget run as a lat-slab
    loop; the slabbed result must be bit-identical to the single-call path
    (same kernel, disjoint row ranges)."""
    _, dyn, img, grid = setup
    h, w = img.shape[1:]
    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    out = georef_latlon_dyn(dyn, px, py, dtype=jnp.float32,
                            with_elevation=True)
    flat, valid = bin_indices(grid, out["lat"], out["lon"])
    iy = jnp.where(valid, (flat // grid.n_lon).astype(jnp.int32), -1)
    ix = jnp.where(valid, (flat % grid.n_lon).astype(jnp.int32), -1)
    one = bin_rgbelev_from_indices(grid, iy, ix, jnp.asarray(img),
                                   out["elevation"], interpret=True)
    # budget forcing >= 3 slabs on this grid (n_lat_pad rows of 8-row wins)
    tiny = 3 * 8 * ((grid.n_lon + 127) // 128 * 128) * 8 * 4
    slabbed = bin_rgbelev_from_indices(grid, iy, ix, jnp.asarray(img),
                                       out["elevation"], interpret=True,
                                       slab_budget_bytes=tiny)
    for a, b in zip(one, slabbed):
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True)
    assert float(one[0].sum()) == float(np.asarray(valid).sum())


class TestHullAlignedSlabs:
    """Edge cases of the hull-aligned virtual slab bases (multi-slab path):
    the traced base0 + dynamic-update-slice placement must hold at the
    grid boundaries
    and for empty input — synthetic indices, tiny grid, interpret mode
    (the real-frame multi-slab gate is test_oversized_grid_slabs_bit_
    identically)."""

    GRID = fixed_grid((2.0, 1.0), 0.05, 19.95, 0.5, 129.5)  # 39 x 129 cells
    H, W = 16, 256  # one kernel tile

    def _bin(self, iy, ix, budget=None):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (3, self.H, self.W)).astype(np.float32)
        elev = np.full((self.H, self.W), 12.5, np.float32)  # exact limbs
        count, sums = bin_rgbelev_from_indices(
            self.GRID, jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(img),
            jnp.asarray(elev), interpret=True, slab_budget_bytes=budget)
        return np.asarray(count), np.asarray(sums), img

    # budget for 2 win-rows of the padded accumulator -> slab_rows = 16,
    # so the 40-row grid (n_lat_pad = 40) takes 3 virtual slabs
    TINY = 2 * 8 * 256 * 8 * 4

    def _oracle_count(self, iy, ix):
        v = iy >= 0
        flat = iy[v] * self.GRID.n_lon + ix[v]
        return np.bincount(
            flat, minlength=self.GRID.n_lat * self.GRID.n_lon
        ).reshape(self.GRID.n_lat, self.GRID.n_lon)

    def test_empty_input(self):
        iy = np.full((self.H, self.W), -1, np.int32)
        count, sums, _ = self._bin(iy, iy, self.TINY)
        assert count.sum() == 0 and np.all(count == 0)
        assert np.all(sums == 0)  # untouched zeros init, no NaN

    @pytest.mark.parametrize("row", [0, -1])  # first / LAST grid row
    def test_single_boundary_row(self, row):
        row = row % self.GRID.n_lat
        rng = np.random.default_rng(1)
        iy = np.full((self.H, self.W), row, np.int32)
        ix = rng.integers(0, self.GRID.n_lon,
                          (self.H, self.W)).astype(np.int32)
        iy[:, :7] = -1  # a few invalid samples too
        count, sums, img = self._bin(iy, ix, self.TINY)
        assert np.array_equal(count, self._oracle_count(iy, ix))
        # rows no slab ever wrote must be exactly zero
        other = np.ones(self.GRID.n_lat, bool)
        other[row] = False
        assert np.all(count[other] == 0) and np.all(sums[other] == 0)
        # RGB sums exact (integer-valued f32)
        v = iy >= 0
        assert sums[row, :, 0].sum() == img[0][v].sum()
        # elevation 12.5 has exact limbs -> sums exact
        assert np.allclose(sums[row, :, 3], 12.5 * count[row], atol=0)

    def test_full_grid_hull_matches_single_call(self):
        rng = np.random.default_rng(2)
        iy = rng.integers(0, self.GRID.n_lat,
                          (self.H, self.W)).astype(np.int32)
        ix = rng.integers(0, self.GRID.n_lon,
                          (self.H, self.W)).astype(np.int32)
        iy[0, ::3] = -1
        c1, s1, _ = self._bin(iy, ix)  # single slab (default budget)
        c3, s3, _ = self._bin(iy, ix, self.TINY)  # 3 slabs, base0 = 0
        assert np.array_equal(c1, c3)
        assert np.array_equal(s1, s3)
        assert np.array_equal(c3, self._oracle_count(iy, ix))

    def test_offset_hull_straddles_slabs(self):
        # hull [17, 35] starts mid-grid and spans two 16-row virtual slabs
        rng = np.random.default_rng(3)
        iy = rng.integers(17, 36, (self.H, self.W)).astype(np.int32)
        ix = rng.integers(0, self.GRID.n_lon,
                          (self.H, self.W)).astype(np.int32)
        c1, s1, _ = self._bin(iy, ix)
        c3, s3, _ = self._bin(iy, ix, self.TINY)
        assert np.array_equal(c1, c3)
        assert np.array_equal(s1, s3)
        assert np.array_equal(c3, self._oracle_count(iy, ix))
        assert np.all(c3[:17] == 0) and np.all(c3[36:] == 0)


def test_i8_kernel_matches_bf16(setup):
    """The int8-MXU kernel variant (compute='i8') must agree with the
    flagship bf16 kernel: count/R/G/B bit-exact (the -128 offset is undone
    in exact int32 arithmetic), elevation within the 2^-16-per-sample limb
    quantization class.

    Measured on v5e (tools/i8_kernel_bench.py, 12 MP bench workload,
    interleaved A/B): i8 (16,256,8) = 8.98 ms vs bf16 8.52 ms; i8
    (32,256,8) = 9.26; i8 (16,512,8) = 9.74. The int8 route is a NULL
    result — the kernel is not MXU-bound, and the i8 select + packed
    relayouts cost more than the halved MXU time saves. Kept as the
    measured answer to the "int8 escape" hypothesis, not as a fast path.
    """
    _, dyn, img, grid = setup
    h, w = img.shape[1:]
    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    out = georef_latlon_dyn(dyn, px, py, dtype=jnp.float32,
                            with_elevation=True)
    flat, valid = bin_indices(grid, out["lat"], out["lon"])
    iy = jnp.where(valid, (flat // grid.n_lon).astype(jnp.int32), -1)
    ix = jnp.where(valid, (flat % grid.n_lon).astype(jnp.int32), -1)
    cb, sb = bin_rgbelev_from_indices(grid, iy, ix, jnp.asarray(img),
                                      out["elevation"], interpret=True)
    ci, si = bin_rgbelev_from_indices(grid, iy, ix, jnp.asarray(img),
                                      out["elevation"], interpret=True,
                                      compute="i8")
    cb, sb, ci, si = map(np.asarray, (cb, sb, ci, si))
    assert np.array_equal(cb, ci)
    assert np.array_equal(sb[..., :3], si[..., :3])
    per_sample = np.abs(sb[..., 3] - si[..., 3]) / np.maximum(cb, 1)
    assert per_sample.max() < 2 ** -14, per_sample.max()


@pytest.mark.parametrize("tiles", [(8, 128, 8), (24, 256, 8)])
def test_alternate_tile_shapes(setup, tiles):
    """The kernel's tiling math (padding, window linearization, grid
    steps) must be shape-generic, not just correct at the default TILES
    (perf sweeps run other shapes on hardware)."""
    _, dyn, img, grid = setup
    count_d, means_d = georegrid_mean(grid, dyn, img, interpret=True)
    count, means = georegrid_mean(grid, dyn, img, tiles=tiles,
                                  interpret=True)
    # same program family: tile shape must not change ANY result
    assert np.array_equal(np.asarray(count), np.asarray(count_d))
    m, md = np.asarray(means), np.asarray(means_d)
    both = ~np.isnan(m) & ~np.isnan(md)
    assert np.array_equal(np.isnan(m), np.isnan(md))
    assert_allclose(m[both], md[both], rtol=0, atol=1e-5)
