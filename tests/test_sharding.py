"""Multi-device tests on the 8-device virtual CPU mesh.

The sharded mosaic step (frames over dp, rows over sp, psum of partial bins)
must produce bit-identical results to the unsharded computation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from auromat_tpu.io import fits
from auromat_tpu.coordinates.wcs import TanWcs
from auromat_tpu.ops.georef import DynGeorefParams, GeorefParams, georef_latlon_dyn
from auromat_tpu.ops.regrid import bin_mean, fixed_grid
from auromat_tpu.parallel import make_mesh, make_sharded_mosaic_step, sharded_batch_georef

import os

RES = os.path.join(os.path.dirname(__file__), "resources")


def _base_params():
    header = fits.read_header(os.path.join(RES, "ISS030-E-102170_dc.wcs"))
    wcs = TanWcs(header)
    pos = fits.get_shifted_spacecraft_position(header)[:3]
    return GeorefParams.from_wcs(wcs, pos, fits.get_photo_time(header), 110.0)


def _burst(n_frames, h=64, w=128):
    """Synthetic frame burst: slightly varying camera positions (an ISS video
    burst), downscaled pixel grid mapped onto the real WCS via stride."""
    base = _base_params()
    params = []
    for i in range(n_frames):
        pos = tuple(c + 5.0 * i for c in base.camera_pos)
        params.append(GeorefParams(
            width=w, height=h, cd=tuple(tuple(v * 32 for v in row) for row in base.cd),
            px_ref=base.px_ref / 32, py_ref=base.py_ref / 32, rotmat=base.rotmat,
            camera_pos=pos, altitude=base.altitude,
            mat_j2000_to_geo=base.mat_j2000_to_geo,
            mat_j2000_to_sm=base.mat_j2000_to_sm,
        ))
    return params


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mosaic_step_matches_unsharded():
    # f64 so op-ordering jitter between the vmap'd sharded path and the
    # per-frame oracle cannot flip borderline samples across bin edges
    h, w, B = 64, 128, 4
    params = _burst(B, h, w)
    rng = np.random.default_rng(0)
    imgs = rng.random((B, h, w, 3)).astype(np.float64) * 255

    grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
    mesh = make_mesh(dp=4, sp=2)
    step = make_sharded_mosaic_step(mesh, grid, h, w, channels=3, dtype=jnp.float64)
    dyn = DynGeorefParams.stack(params, dtype=jnp.float64)
    count_sh, means_sh = step(dyn, imgs)

    # unsharded oracle: accumulate all frames' samples through bin_mean
    px, py = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    all_lat, all_lon, all_data = [], [], []
    for i, p in enumerate(params):
        d = DynGeorefParams.from_static(p, dtype=jnp.float64)
        out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                                dtype=jnp.float64, with_elevation=True)
        all_lat.append(np.asarray(out["lat"]))
        all_lon.append(np.asarray(out["lon"]))
        all_data.append(np.concatenate([imgs[i], np.asarray(out["elevation"])[..., None]], axis=-1))
    count_ref, means_ref = bin_mean(
        grid,
        np.stack(all_lat), np.stack(all_lon), np.stack(all_data),
    )

    assert_allclose(np.asarray(count_sh), np.asarray(count_ref))
    a, b = np.asarray(means_sh), np.asarray(means_ref)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    m = ~np.isnan(b)
    assert_allclose(a[m], b[m], rtol=1e-9)  # summation-order jitter only


def test_mosaic_step_f32_smoke():
    """f32 path: totals must match exactly, cell-level bins may differ by
    ulp-level coordinate jitter on edge samples."""
    h, w, B = 64, 128, 4
    params = _burst(B, h, w)
    imgs = np.random.default_rng(1).random((B, h, w, 3)).astype(np.float32)
    grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
    mesh = make_mesh(dp=2, sp=4)
    step = make_sharded_mosaic_step(mesh, grid, h, w, channels=3, dtype=jnp.float32)
    dyn = DynGeorefParams.stack(params, dtype=jnp.float32)
    count, means = step(dyn, imgs)
    count = np.asarray(count)
    assert count.sum() > 0
    assert np.isfinite(np.asarray(means)[count > 0]).all()


def test_sharded_batch_georef_matches_single():
    h, w, B = 64, 128, 8
    params = _burst(B, h, w)
    mesh = make_mesh(dp=4, sp=2)
    fn = sharded_batch_georef(mesh, h, w, dtype=jnp.float64)
    dyn = DynGeorefParams.stack(params, dtype=jnp.float64)
    out = fn(dyn)
    assert np.asarray(out["lat"]).shape == (B, h, w)

    px, py = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    for i in (0, 3, 7):
        d = DynGeorefParams.from_static(params[i])
        ref = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py), dtype=jnp.float64)
        a = np.asarray(out["lat"])[i]
        b = np.asarray(ref["lat"])
        assert np.array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(b)
        assert_allclose(a[m], b[m], atol=1e-12)


def test_mesh_factorisation():
    mesh = make_mesh()
    assert mesh.shape["dp"] * mesh.shape["sp"] == 8
    mesh2 = make_mesh(jax.devices()[:6])
    assert mesh2.shape["dp"] * mesh2.shape["sp"] == 6


class TestGridShardedMosaic:
    """BASELINE config 5 at reduced scale: the GRID is sharded — every
    device owns one latitude band and partials are routed by
    reduce-scatter; no device ever holds the full grid."""

    def _run(self, grid, mesh, dtype, B=4, h=64, w=128, seed=2, **kw):
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        params = _burst(B, h, w)
        imgs = (np.random.default_rng(seed).random((B, h, w, 3)) * 255
                ).astype(dtype)
        step = make_grid_sharded_mosaic_step(mesh, grid, h, w, channels=3,
                                             dtype=dtype, **kw)
        dyn = DynGeorefParams.stack(params, dtype=dtype)
        count, means = step(dyn, imgs)
        return params, imgs, count, means

    def test_matches_unsharded_and_stays_banded(self):
        # reduced-scale global mosaic: 0.5 deg plate carree
        grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)
        mesh = make_mesh(dp=4, sp=2)
        n_dev = 8
        band = -(-grid.n_lat // n_dev)
        band = (band + 7) // 8 * 8
        params, imgs, count, means = self._run(grid, mesh, np.float64)

        # ownership: each device holds exactly its (band, n_lon) slice —
        # the full grid is never materialized per device
        assert count.shape == (band * n_dev, grid.n_lon)
        for shard in count.addressable_shards:
            assert shard.data.shape == (band, grid.n_lon)
        for shard in means.addressable_shards:
            assert shard.data.shape == (band, grid.n_lon, 4)

        # correctness vs the unsharded oracle
        px, py = np.meshgrid(np.arange(128, dtype=np.float64),
                             np.arange(64, dtype=np.float64))
        lat, lon, data = [], [], []
        for i, p in enumerate(params):
            d = DynGeorefParams.from_static(p, dtype=jnp.float64)
            out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                                    dtype=jnp.float64, with_elevation=True)
            lat.append(np.asarray(out["lat"]))
            lon.append(np.asarray(out["lon"]))
            data.append(np.concatenate(
                [imgs[i], np.asarray(out["elevation"])[..., None]], axis=-1))
        count_ref, means_ref = bin_mean(grid, np.stack(lat), np.stack(lon),
                                        np.stack(data))
        count_np = np.asarray(count)[: grid.n_lat]
        means_np = np.asarray(means)[: grid.n_lat]
        assert_allclose(count_np, np.asarray(count_ref))
        a, b = means_np, np.asarray(means_ref)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(b)
        assert_allclose(a[m], b[m], rtol=1e-9)

    def test_nan_imagery_does_not_corrupt(self):
        """NaN-masked imagery at valid coordinates must be zeroed before
        the sorted prefix sums (a raw NaN would poison every bin after it
        in sort order): outputs equal the same step with NaNs pre-zeroed."""
        grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)
        mesh = make_mesh(dp=4, sp=2)
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        B, h, w = 8, 64, 128
        params = _burst(B, h, w)
        rng = np.random.default_rng(5)
        imgs = (rng.random((B, h, w, 3)) * 255).astype(np.float64)
        imgs[rng.random((B, h, w)) < 0.03] = np.nan  # NaN-masked pixels
        step = make_grid_sharded_mosaic_step(mesh, grid, h, w, channels=3,
                                             dtype=np.float64)
        dyn = DynGeorefParams.stack(params, dtype=np.float64)
        count, means = step(dyn, imgs)
        means_np = np.asarray(means)[: grid.n_lat]
        count_np = np.asarray(count)[: grid.n_lat]
        # finite everywhere a bin has samples (NaN data treated as 0)
        assert np.isfinite(means_np[count_np > 0]).all()
        count2, means2 = step(dyn, np.nan_to_num(imgs, nan=0.0))
        assert_allclose(np.asarray(count2), np.asarray(count))
        a, b = means_np, np.asarray(means2)[: grid.n_lat]
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert_allclose(a[~np.isnan(a)], b[~np.isnan(b)], rtol=1e-12)
        # padding rows past n_lat are empty
        assert np.asarray(count)[grid.n_lat :].sum() == 0

    def test_pallas_binning_matches_sorted(self):
        """bin_method='pallas' routes the flagship fused-path kernel into
        the grid-sharded mosaic (VERDICT r2 item 1): banded counts and
        integer imagery channels must match the sorted variant bit-exactly;
        elevation differs only by the sorted path's own f32 prefix-sum
        error (the kernel's limb-split elevation sums are the more
        accurate side — see ops/regrid_pallas.py)."""
        grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)
        mesh = make_mesh(dp=4, sp=2)
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        B, h, w = 4, 64, 128
        params = _burst(B, h, w)
        # integer-valued imagery (the kernel's uint8 channel contract)
        imgs = np.random.default_rng(7).integers(
            0, 256, (B, h, w, 3)).astype(np.float32)
        imgs[0, :4, :4] = np.nan  # NaN-masked pixels contribute 0
        dyn = DynGeorefParams.stack(params, dtype=np.float32)
        outs = {}
        for method in ("sorted", "pallas"):
            step = make_grid_sharded_mosaic_step(
                mesh, grid, h, w, channels=3, dtype=np.float32,
                bin_method=method, interpret=True)
            count, means = step(dyn, imgs)
            outs[method] = (np.asarray(count), np.asarray(means))
        cs, ms = outs["sorted"]
        cp, mp = outs["pallas"]
        assert cp.sum() > 0
        assert np.array_equal(cp, cs)
        assert np.array_equal(np.isnan(mp), np.isnan(ms))
        rgb_ok = ~np.isnan(ms[..., :3])
        assert np.array_equal(mp[..., :3][rgb_ok], ms[..., :3][rgb_ok])
        el_ok = ~np.isnan(ms[..., 3])
        assert_allclose(mp[..., 3][el_ok], ms[..., 3][el_ok], atol=0.01)

    @pytest.mark.slow
    def test_pallas_multi_slab_matches_single_call(self):
        """A slab budget small enough to force the lat-slab loop (with its
        runtime empty-slab skipping via lax.cond) inside shard_map must
        reproduce the single-call pallas result bit-exactly — this is the
        mission-scale (config-5 class) configuration where the grid
        accumulator exceeds VMEM and only some slabs hold samples."""
        grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)
        mesh = make_mesh(dp=4, sp=2)
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        B, h, w = 4, 64, 128
        params = _burst(B, h, w)
        imgs = np.random.default_rng(9).integers(
            0, 256, (B, h, w, 3)).astype(np.float32)
        dyn = DynGeorefParams.stack(params, dtype=np.float32)
        outs = {}
        for budget in (None, 200_000):  # None = single call; tiny = slabs
            step = make_grid_sharded_mosaic_step(
                mesh, grid, h, w, channels=3, dtype=np.float32,
                bin_method="pallas", interpret=True,
                slab_budget_bytes=budget)
            count, means = step(dyn, imgs)
            outs[budget] = (np.asarray(count), np.asarray(means))
        c1, m1 = outs[None]
        cn, mn = outs[200_000]
        assert c1.sum() > 0
        assert np.array_equal(cn, c1)
        assert np.array_equal(np.isnan(mn), np.isnan(m1))
        ok = ~np.isnan(m1)
        assert np.array_equal(mn[ok], m1[ok])

    def test_pallas_binning_rejects_bad_channel_contract(self):
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)
        mesh = make_mesh(dp=4, sp=2)
        with pytest.raises(ValueError, match="channel contract"):
            make_grid_sharded_mosaic_step(mesh, grid, 64, 128, channels=4,
                                          bin_method="pallas")

    def test_chunking_equivalence(self):
        # different chunk_rows must not change the result
        grid = fixed_grid(2, -89.0, 89.0, -179.0, 179.0)
        mesh = make_mesh(dp=2, sp=4)
        _, _, c1, m1 = self._run(grid, mesh, np.float64, chunk_rows=8)
        _, _, c2, m2 = self._run(grid, mesh, np.float64, chunk_rows=24)
        assert_allclose(np.asarray(c1), np.asarray(c2))
        a, b = np.asarray(m1), np.asarray(m2)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        # different chunk partitions sum samples in different orders
        assert_allclose(a[m], b[m], rtol=1e-10)


class TestDistributed:
    def test_single_process_helpers(self):
        from auromat_tpu.parallel import global_mesh, is_multi_process
        from auromat_tpu.parallel.distributed import process_local_batch

        assert not is_multi_process()
        mesh = global_mesh()
        assert mesh.shape["dp"] * mesh.shape["sp"] == 8
        start, count = process_local_batch(16)
        assert (start, count) == (0, 16)


@pytest.mark.slow
def test_multihost_two_process_mosaic():
    """TRUE multi-host run: two processes x 4 virtual devices, coordinator
    + Gloo collectives via parallel.distributed.initialize, the grid-banded
    mosaic over the global mesh, each process checking the gathered result
    against a single-process oracle (bit-exact)."""
    import random
    import subprocess
    import sys

    port = random.randint(20000, 40000)
    worker = os.path.join(os.path.dirname(__file__), "mh_mosaic_worker.py")
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "multi-host grid-banded mosaic OK" in outs[0]
    assert "multi-host grid-banded mosaic OK" in outs[1]


@pytest.mark.slow
class TestConfig5Scale:
    """BASELINE config 5 at FULL grid scale: the 0.05 deg global mosaic
    (3599 x 7199 cells) on the 8-device mesh — proves the banding/chunking
    memory arithmetic (parallel/sharding.py docstring) at mission scale,
    not just the reduced-scale grids of TestGridShardedMosaic.

    Measured on the 8-device virtual CPU mesh (2026-08-17): compiled temp
    480.1 MiB, output 62.6 MiB, per-device band (456, 7199); one full-grid
    accumulator alone would be 525 MiB — the step never materializes the
    grid per device. Runtime ~100 s on CPU (sorted per-shard binning).
    """

    def test_global_005deg_mosaic(self):
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        B, h, w = 8, 256, 512
        params = _burst(B, h, w)
        # scale CD so the synthetic frames keep a realistic footprint
        imgs = np.random.default_rng(11).integers(
            0, 256, (B, h, w, 3)).astype(np.float32)
        mesh = make_mesh(dp=4, sp=2)
        grid = fixed_grid(20, -89.999, 89.999, -179.999, 179.999)
        assert (grid.n_lat, grid.n_lon) == (3599, 7199)
        dyn = DynGeorefParams.stack(params, dtype=np.float32)
        step = make_grid_sharded_mosaic_step(mesh, grid, h, w, channels=3,
                                             dtype=np.float32)
        compiled = step.lower(dyn, imgs).compile()
        ma = compiled.memory_analysis()
        full_grid_bytes = grid.n_lat * grid.n_lon * 5 * 4  # count+RGB+elev
        # the documented banding claim: the working set stays well under a
        # per-device full-grid accumulator (~525 MiB); measured 480 MiB of
        # temp for the WHOLE 8-shard program
        assert ma.temp_size_in_bytes < full_grid_bytes, (
            ma.temp_size_in_bytes, full_grid_bytes)

        count, means = jax.block_until_ready(compiled(dyn, imgs))
        n_dev = 8
        band = (-(-grid.n_lat // n_dev) + 7) // 8 * 8
        assert count.shape == (band * n_dev, grid.n_lon)
        for shard in count.addressable_shards:
            assert shard.data.shape == (band, grid.n_lon)

        # sample conservation: every valid georeferenced pixel lands in
        # exactly one bin
        from auromat_tpu.ops.regrid import bin_indices

        px, py = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        n_valid = 0
        for p in params:
            d = DynGeorefParams.from_static(p, dtype=jnp.float32)
            out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                                    dtype=jnp.float32)
            _, valid = bin_indices(grid, jnp.ravel(out["lat"]),
                                   jnp.ravel(out["lon"]))
            n_valid += int(np.asarray(valid).sum())
        total = float(np.asarray(count).sum())
        # the oracle is a SEPARATE XLA program: on CPU its f32 georef chain
        # rounds differently (fma contraction), so grazing-horizon pixels
        # may flip validity (same class as test_georegrid.test_matches_oracle)
        assert abs(total - n_valid) <= 8, (total, n_valid)
        m = np.asarray(means)[: grid.n_lat]
        c = np.asarray(count)[: grid.n_lat]
        assert np.isfinite(m[c > 0]).all()

    def test_config5_collective_bytes_scale_with_band(self):
        """Structural multi-chip evidence (VERDICT r4 item 7): in the
        compiled HLO of the config-5 step, per-device collective OUTPUT
        bytes equal the device's band (pad-rounded grid/n_dev), not the
        full grid — the one scaling property a virtual CPU mesh can prove.
        A psum design would land full-grid all-reduce outputs on every
        device (ratio 1.0 between mesh sizes); the reduce-scatter routing
        must land ~n_dev-th of the grid (8-dev/2-dev ratio ~0.28 after
        8-row pad rounding)."""
        import re

        from auromat_tpu.ops.regrid import round_up
        from auromat_tpu.parallel import (make_grid_sharded_mosaic_step,
                                          make_mesh)

        g5 = fixed_grid(20, -89.999, 89.999, -179.999, 179.999)
        B, h, w = 8, 64, 128
        imgs = np.zeros((B, h, w, 3))
        dyn = DynGeorefParams.stack(_burst(B, h, w), dtype=jnp.float32)

        def rs_output_bytes(txt):
            sizes = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4}
            total = 0
            for m in re.finditer(
                    r"= (\w+)\[([0-9,]*)\][^=]* reduce-scatter\(", txt):
                dims = np.prod([int(d) for d in m.group(2).split(",")])
                total += int(dims) * sizes[m.group(1)]
            return total

        def expected_bytes(n_dev):
            band = round_up(-(-g5.n_lat // n_dev), 8)
            chunk_rows = min(max(8, round_up(band // n_dev, 8)), band)
            band_pad = -(-band // chunk_rows) * chunk_rows
            # per chunk: count (chunk_rows, n_lon) + sums (..., 4) f32
            return band_pad * g5.n_lon * (1 + 4) * 4

        got = {}
        for n_dev in (2, 8):
            mesh = make_mesh(jax.devices()[:n_dev], dp=n_dev, sp=1)
            step = make_grid_sharded_mosaic_step(
                mesh, g5, h, w, bin_method="sorted", dtype=jnp.float32)
            txt = step.lower(dyn, imgs).compile().as_text()
            # the accumulator path must never psum the full grid
            assert " all-reduce(" not in txt
            got[n_dev] = rs_output_bytes(txt)
            assert got[n_dev] == expected_bytes(n_dev), (
                n_dev, got[n_dev], expected_bytes(n_dev))
        ratio = got[8] / got[2]
        assert ratio < 0.5, ratio  # full-grid psum would be 1.0

    def test_global_005deg_mosaic_pallas(self):
        """Config-5 scale x Pallas per-shard binning COMBINED (VERDICT r3
        item 3): the production configuration — the 0.05 deg global grid
        through make_grid_sharded_mosaic_step(bin_method='pallas') — on the
        8-device mesh, gated against the sorted path at the same full
        3599x7199 grid shape, plus the documented memory trade-off
        (parallel/sharding.py: the pallas branch's per-device binning
        accumulator is ~the full padded grid rather than ~1/n_dev of it).

        Reduced frame size keeps interpret-mode cost sane; the grid — the
        thing whose scale is under test — is full size.
        """
        from auromat_tpu.parallel import make_grid_sharded_mosaic_step

        B, h, w = 4, 64, 256
        params = _burst(B, h, w)
        imgs = np.random.default_rng(12).integers(
            0, 256, (B, h, w, 3)).astype(np.float32)
        mesh = make_mesh(dp=4, sp=2)
        grid = fixed_grid(20, -89.999, 89.999, -179.999, 179.999)
        assert (grid.n_lat, grid.n_lon) == (3599, 7199)
        dyn = DynGeorefParams.stack(params, dtype=np.float32)

        step_p = make_grid_sharded_mosaic_step(
            mesh, grid, h, w, channels=3, dtype=np.float32,
            bin_method="pallas", interpret=True)
        compiled = step_p.lower(dyn, imgs).compile()
        ma = compiled.memory_analysis()
        full_grid_bytes = grid.n_lat * grid.n_lon * 5 * 4  # count+RGB+elev
        # documented trade-off: the natural-grid binning accumulator is
        # ~full-grid-sized per device (vs the sorted path's < 1 full grid
        # across ALL 8 shards) — and bounded: a runaway (e.g. the full
        # accumulator materialized per chunk) would blow past 8 shards x
        # a few grid-sized temps
        assert ma.temp_size_in_bytes > full_grid_bytes, (
            ma.temp_size_in_bytes, full_grid_bytes)
        assert ma.temp_size_in_bytes < 8 * 4 * full_grid_bytes, (
            ma.temp_size_in_bytes, full_grid_bytes)

        count_p, means_p = jax.block_until_ready(compiled(dyn, imgs))

        step_s = make_grid_sharded_mosaic_step(
            mesh, grid, h, w, channels=3, dtype=np.float32,
            bin_method="sorted")
        count_s, means_s = jax.block_until_ready(step_s(dyn, imgs))

        cp, cs = np.asarray(count_p), np.asarray(count_s)
        mp, ms = np.asarray(means_p), np.asarray(means_s)
        assert np.array_equal(cp, cs)
        assert np.array_equal(np.isnan(mp), np.isnan(ms))
        occ = cp > 0
        # counts + uint8 RGB means bit-exact; elevation within the sorted
        # path's own f32 prefix-sum error class (see CLAUDE.md r2 notes:
        # the kernel limb-split is the MORE accurate side)
        assert np.array_equal(mp[occ][:, :3], ms[occ][:, :3])
        assert_allclose(mp[occ][:, 3], ms[occ][:, 3], rtol=0, atol=5e-2)


class TestMosaicSequence:
    """Provider burst -> sharded mosaic unification (VERDICT r3 item 4):
    one code path from a frame sequence to the grid-sharded step, with
    exact remainder padding and linear cross-burst accumulation."""

    def test_null_frame_contributes_nothing(self):
        from auromat_tpu.parallel import null_georef_params

        p = _burst(1, 32, 64)[0]
        null = null_georef_params(p)
        d = DynGeorefParams.from_static(null, dtype=jnp.float64)
        px, py = np.meshgrid(np.arange(64, dtype=np.float64),
                             np.arange(32, dtype=np.float64))
        out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                                dtype=jnp.float64, with_elevation=True)
        assert np.isnan(np.asarray(out["lat"])).all()
        assert np.isnan(np.asarray(out["lon"])).all()

    def test_chunking_invariant_and_exact_padding(self):
        """5 frames through batch=2 (chunks 2+2+1pad) and batch=4 (4+1pad3):
        counts must agree bit-for-bit (integer — padding frames contribute
        exactly zero samples); means only to summation-order jitter (the
        two chunkings sum the same f64 partials in different groupings)."""
        from auromat_tpu.parallel import make_mesh, mosaic_sequence

        B, h, w = 5, 64, 128
        params = _burst(B, h, w)
        imgs = np.random.default_rng(3).integers(
            0, 256, (B, h, w, 3)).astype(np.float64)
        grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
        mesh = make_mesh(dp=2, sp=4)

        c2, m2 = mosaic_sequence(mesh, grid, [(params, imgs)], batch=2,
                                 bin_method="sorted", dtype=jnp.float64)
        c4, m4 = mosaic_sequence(mesh, grid, [(params, imgs)], batch=4,
                                 bin_method="sorted", dtype=jnp.float64)
        assert np.array_equal(np.asarray(c2), np.asarray(c4))
        a, b = np.asarray(m2), np.asarray(m4)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        ok = ~np.isnan(a)
        assert_allclose(a[ok], b[ok], rtol=1e-11)

        # vs the unsharded oracle (same class as
        # test_mosaic_step_matches_unsharded)
        px, py = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        lats, lons, data = [], [], []
        for i, p in enumerate(params):
            d = DynGeorefParams.from_static(p, dtype=jnp.float64)
            out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                                    dtype=jnp.float64, with_elevation=True)
            lats.append(np.asarray(out["lat"]))
            lons.append(np.asarray(out["lon"]))
            data.append(np.concatenate(
                [imgs[i], np.asarray(out["elevation"])[..., None]], axis=-1))
        count_ref, means_ref = bin_mean(grid, np.stack(lats), np.stack(lons),
                                        np.stack(data))
        c = np.asarray(c2)[: grid.n_lat]
        m = np.asarray(m2)[: grid.n_lat]
        assert np.array_equal(c, np.asarray(count_ref))
        both = ~np.isnan(m) & ~np.isnan(np.asarray(means_ref))
        assert np.array_equal(np.isnan(m), np.isnan(np.asarray(means_ref)))
        assert_allclose(m[both], np.asarray(means_ref)[both],
                        rtol=0, atol=1e-9)

    def test_hundred_frame_sequence(self):
        """Config-4 at its stated scale, structurally (VERDICT r4 item 4):
        100 jittered frames stream through mosaic_sequence in 13 padded
        batch-8 chunks reusing ONE compiled step; counts equal the sum of
        the per-frame single-burst counts (linearity at scale). The
        hardware ms/frame number is bench.py's burst100_sharded_ms."""
        from auromat_tpu.parallel import make_mesh, mosaic_sequence

        import dataclasses

        N, h, w = 100, 64, 128  # _burst's WCS downscale assumes (64, 128)
        rng = np.random.default_rng(7)
        base = _burst(1, h, w)[0]
        # +-5 km random camera jitter (a video burst), NOT _burst's
        # cumulative drift — 100 frames of +5 km/frame would walk the
        # footprint off the test grid entirely
        params = [dataclasses.replace(
            base, camera_pos=tuple(np.asarray(base.camera_pos)
                                   + rng.uniform(-5, 5, 3)))
            for _ in range(N)]
        imgs = rng.integers(0, 256, (N, h, w, 3)).astype(np.float64)
        grid = fixed_grid(1, 30.0, 75.0, -140.0, -60.0)
        mesh = make_mesh(dp=2, sp=4)
        c, m = mosaic_sequence(mesh, grid, [(params, imgs)], batch=8,
                               bin_method="sorted", dtype=jnp.float64)
        c = np.asarray(c)[: grid.n_lat]
        # linearity oracle: counts == sum of 10-frame sub-sequences
        c_sum = None
        for i in range(0, N, 10):
            ci, _ = mosaic_sequence(
                mesh, grid, [(params[i:i + 10], imgs[i:i + 10])], batch=8,
                bin_method="sorted", dtype=jnp.float64)
            ci = np.asarray(ci)[: grid.n_lat]
            c_sum = ci if c_sum is None else c_sum + ci
        assert c.sum() > 0
        assert np.array_equal(c, c_sum)

    def test_device_resident_imagery_matches_host(self):
        """mosaic_sequence accepts jax.Array imagery (the bench's
        device-resident 100-frame path) — identical results to host numpy
        imagery, including the jnp padding branch (5 frames, batch 4)."""
        from auromat_tpu.parallel import make_mesh, mosaic_sequence

        B, h, w = 5, 64, 128
        params = _burst(B, h, w)
        imgs = np.random.default_rng(5).integers(
            0, 256, (B, h, w, 3)).astype(np.float64)
        grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
        mesh = make_mesh(dp=2, sp=4)
        ch, mh = mosaic_sequence(mesh, grid, [(params, imgs)], batch=4,
                                 bin_method="sorted", dtype=jnp.float64)
        cd, md = mosaic_sequence(mesh, grid, [(params, jnp.asarray(imgs))],
                                 batch=4, bin_method="sorted",
                                 dtype=jnp.float64)
        assert np.array_equal(np.asarray(ch), np.asarray(cd))
        a, b = np.asarray(mh), np.asarray(md)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        ok = ~np.isnan(a)
        assert np.array_equal(a[ok], b[ok])

    def test_multi_burst_accumulation_matches_single(self):
        """Two separate bursts == one concatenated burst (linearity of the
        (count, sums) partials across step calls)."""
        from auromat_tpu.parallel import make_mesh, mosaic_sequence

        B, h, w = 4, 64, 128
        params = _burst(B, h, w)
        imgs = np.random.default_rng(4).integers(
            0, 256, (B, h, w, 3)).astype(np.float64)
        grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
        mesh = make_mesh(dp=2, sp=4)
        one = mosaic_sequence(mesh, grid, [(params, imgs)], batch=2,
                              bin_method="sorted", dtype=jnp.float64)
        two = mosaic_sequence(
            mesh, grid,
            [(params[:2], imgs[:2]), (params[2:], imgs[2:])],
            batch=2, bin_method="sorted", dtype=jnp.float64)
        for a, b in zip(one, two):
            assert np.array_equal(np.asarray(a), np.asarray(b),
                                  equal_nan=True)

    def test_min_elevation_premask(self):
        """min_elevation masks SAMPLES before binning (the device
        equivalent of maskedByElevation-then-resample): counts/sums must
        equal the oracle binning of only the >=-threshold samples — NOT
        a post-hoc mask of cells by their mean elevation, which keeps
        sub-threshold contamination inside surviving cells."""
        from auromat_tpu.parallel import make_mesh, mosaic_sequence

        B, h, w = 2, 64, 128
        params = _burst(B, h, w)
        imgs = np.random.default_rng(6).integers(
            0, 256, (B, h, w, 3)).astype(np.float64)
        grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
        mesh = make_mesh(dp=2, sp=4)
        thr = 20.0
        c_f, m_f = mosaic_sequence(mesh, grid, [(params, imgs)], batch=2,
                                   bin_method="sorted", dtype=jnp.float64,
                                   min_elevation=thr)
        c_all, _ = mosaic_sequence(mesh, grid, [(params, imgs)], batch=2,
                                   bin_method="sorted", dtype=jnp.float64)

        # oracle: NaN out sub-threshold samples, then bin
        px, py = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        lats, lons, data = [], [], []
        for i, p in enumerate(params):
            d = DynGeorefParams.from_static(p, dtype=jnp.float64)
            out = georef_latlon_dyn(d, jnp.asarray(px), jnp.asarray(py),
                                    dtype=jnp.float64, with_elevation=True)
            la = np.asarray(out["lat"]).copy()
            lo = np.asarray(out["lon"]).copy()
            el = np.asarray(out["elevation"])
            drop = ~(el >= thr)
            la[drop] = np.nan
            lo[drop] = np.nan
            lats.append(la)
            lons.append(lo)
            data.append(np.concatenate([imgs[i], el[..., None]], axis=-1))
        count_ref, means_ref = bin_mean(grid, np.stack(lats), np.stack(lons),
                                        np.stack(data))
        c = np.asarray(c_f)[: grid.n_lat]
        m = np.asarray(m_f)[: grid.n_lat]
        assert np.array_equal(c, np.asarray(count_ref))
        both = ~np.isnan(m) & ~np.isnan(np.asarray(means_ref))
        assert np.array_equal(np.isnan(m), np.isnan(np.asarray(means_ref)))
        assert_allclose(m[both], np.asarray(means_ref)[both],
                        rtol=0, atol=1e-9)
        # the threshold really bit: fewer samples, and every surviving
        # cell's mean elevation clears it
        assert c.sum() < np.asarray(c_all)[: grid.n_lat].sum()
        assert (m[..., 3][c > 0] >= thr).all()

    def test_pallas_binning_small_grid(self):
        """The production bin_method='pallas' through mosaic_sequence
        (interpret mode on the CPU mesh), padding included."""
        from auromat_tpu.parallel import make_mesh, mosaic_sequence

        B, h, w = 3, 64, 128
        params = _burst(B, h, w)
        imgs = np.random.default_rng(5).integers(
            0, 256, (B, h, w, 3)).astype(np.float32)
        grid = fixed_grid(2, 30.0, 75.0, -140.0, -60.0)
        mesh = make_mesh(dp=2, sp=4)
        cp, mp = mosaic_sequence(mesh, grid, [(params, imgs)], batch=2,
                                 bin_method="pallas", interpret=True)
        cs, ms = mosaic_sequence(mesh, grid, [(params, imgs)], batch=2,
                                 bin_method="sorted")
        cp, cs, mp, ms = map(np.asarray, (cp, cs, mp, ms))
        assert np.array_equal(cp, cs)
        occ = cp > 0
        assert np.array_equal(mp[occ][:, :3], ms[occ][:, :3])
        assert_allclose(mp[occ][:, 3], ms[occ][:, 3], rtol=0, atol=5e-2)
