"""Headline benchmark: georeference + regrid a 12 MP ISS frame on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MPix/s/chip", "vs_baseline": N}

vs_baseline is measured throughput relative to the driver's north-star target
of <10 ms for the 12.05 MPix frame (BASELINE.json) == 1205 MPix/s.

Runs on whatever the default jax backend is (the real TPU chip under the
driver; CPU with JAX_PLATFORMS forced). Everything timed is inside ONE jitted
function — no host roundtrips in the loop.
"""

import json
import os
import sys
import time

import numpy as np


def _probe_backend(timeout_s=300, attempts=4, retry_wait_s=180):
    """Fail fast if the remote TPU is in its dead state (jax.devices()
    itself hangs there — observed outages of hours; see CLAUDE.md). Probes
    device init + one tiny jitted op in a subprocess with a hard timeout
    so the driver's bench run errors out instead of hanging forever. The
    probe sets the same persistent compile cache as the bench, so a
    healthy backend costs one cached-compile roundtrip, not a fresh
    minutes-long remote compile misread as dead.

    The backend is known to FLAP (a probe succeeding minutes after an
    identical one timed out — round-4 notes), so a failed probe is
    retried a few times with a pause before giving up; the whole window
    stays bounded (4 x 300 s timeouts + 3 x 180 s waits = ~29 min worst
    case) so a driver run still terminates.
    Tune with BENCH_PROBE_ATTEMPTS / BENCH_PROBE_WAIT_S."""
    import subprocess

    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", attempts))
    retry_wait_s = float(os.environ.get("BENCH_PROBE_WAIT_S", retry_wait_s))
    cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache")
    code = (
        "import jax, jax.numpy as jnp\n"
        f"jax.config.update('jax_compilation_cache_dir', {cache!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "y = jax.jit(lambda a: a @ a)(jnp.ones((8, 8)))\n"
        "print(jax.devices()[0].platform, float(y[0, 0]))\n"
    )
    err = None
    for attempt in range(max(attempts, 1)):
        if attempt:
            print(f"# backend probe attempt {attempt} failed ({err}); "
                  f"retrying in {retry_wait_s:.0f}s", file=sys.stderr)
            time.sleep(retry_wait_s)
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            err = f"device probe exceeded {timeout_s}s"
            continue
        if out.returncode == 0:
            return
        err = "probe subprocess failed: " + out.stderr.strip()[-500:]
    print(json.dumps({
        "error": f"backend unresponsive after {attempts} probe attempts: "
                 f"{err} (axon TPU dead state)"}))
    sys.exit(3)


def main():
    _probe_backend()
    import jax

    # persistent compile cache: the remote TPU compile path is slow (minutes);
    # warmed caches make reruns near-instant
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.io import fits
    from auromat_tpu.ops.georef import DynGeorefParams, GeorefParams, georef_latlon_dyn
    from auromat_tpu.ops.georegrid import georegrid_mean
    from auromat_tpu.ops.regrid import bin_partial, finalize_mean, fixed_grid

    repo = os.path.dirname(os.path.abspath(__file__))
    header = fits.read_header(
        os.path.join(repo, "tests", "resources", "ISS030-E-102170_dc.wcs")
    )
    wcs = TanWcs(header)
    params = GeorefParams.from_wcs(
        wcs,
        fits.get_shifted_spacecraft_position(header)[:3],
        fits.get_shifted_photo_time(header),
        altitude=110.0,
    )
    h, w = params.height, params.width
    mpix = h * w / 1e6
    dtype = jnp.float32
    dyn = DynGeorefParams.from_static(params, dtype=dtype)
    grid = fixed_grid((36, 25), 47.0, 62.0, -112.0, -91.0)

    try:
        from PIL import Image

        img_u8 = np.asarray(
            Image.open(os.path.join(repo, "tests", "resources", "ISS030-E-102170_dc.jpg"))
        )
        img = img_u8.astype(np.float32)
    except Exception:
        img = np.zeros((h, w, 3), dtype=np.float32)

    def make_forward_fused():
        @jax.jit
        def forward(img_chw):
            return georegrid_mean(grid, dyn, img_chw)
        return forward

    def make_forward(binner):
        @jax.jit
        def forward(img_chw):
            img = jnp.transpose(img_chw, (1, 2, 0))
            px = jnp.broadcast_to(jnp.arange(w, dtype=dtype)[None, :], (h, w))
            py = jnp.broadcast_to(jnp.arange(h, dtype=dtype)[:, None], (h, w))
            out = georef_latlon_dyn(dyn, px, py, dtype=dtype,
                                    with_elevation=True)
            data = jnp.concatenate([img, out["elevation"][..., None]],
                                   axis=-1)
            count, sums = binner(grid, out["lat"], out["lon"], data)
            return count, finalize_mean(count, sums)
        return forward

    img_dev = jax.device_put(np.ascontiguousarray(img.transpose(2, 0, 1)))
    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", file=sys.stderr)

    def sync(out):
        # jax.block_until_ready does NOT block on the axon remote runtime —
        # a host fetch of one element is the only reliable sync
        return float(np.asarray(out[0][0, 0]))

    def time_amortized(fn, sync_key, iters, n_batches=3):
        """Median per-call ms: iters async dispatches bounded by one
        scalar host fetch per batch (the only reliable axon sync)."""
        out = fn()
        float(np.asarray(sync_key(out)))  # warmup + compile
        ts = []
        for _ in range(n_batches):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            float(np.asarray(sync_key(out)))
            ts.append((time.perf_counter() - t0) / iters)
        return float(np.median(ts)), ts

    # preferred: the fused georef+regrid Pallas step (~8.2 ms/frame); fall
    # back to the packed-sort XLA path if Mosaic cannot compile here. The
    # fallback is NOT silent: "method" is part of the emitted JSON.
    t0 = time.time()
    try:
        forward = make_forward_fused()
        count, means = forward(img_dev)
        sync((count,))
        method = "georegrid_pallas"
    except Exception as e:  # Mosaic compile failure
        print(f"fused pallas path failed ({type(e).__name__}: {e}); "
              "falling back to sorted_packed", file=sys.stderr)
        forward = make_forward(
            lambda g, la, lo, d: bin_partial(g, la, lo, d, "sorted_packed"))
        count, means = forward(img_dev)
        sync((count,))
        method = "sorted_packed"
    print(f"compile+first run: {time.time()-t0:.1f}s ({method})",
          file=sys.stderr)
    assert float(np.asarray(count).sum()) > 1e6, "georef+regrid produced no samples"

    # amortized batches: async dispatch pipelines the steps; one fetch at the
    # end of each batch bounds the whole batch (same methodology helper as
    # every secondary metric; the headline just uses one more batch)
    per_batch = int(os.environ.get('BENCH_PER_BATCH', 10))
    dt, batch_times = time_amortized(lambda: forward(img_dev),
                                     lambda o: o[0][0, 0], per_batch,
                                     n_batches=4)
    print(
        f"amortized step: {dt*1e3:.2f} ms "
        f"(batches: {[round(t*1e3, 1) for t in batch_times]})",
        file=sys.stderr,
    )

    # grid-sharded mosaic step on a 1-device mesh with the Pallas per-shard
    # binning (VERDICT r2 item 1: the multi-chip path must run the fast
    # kernel; a 1-device mesh quantifies its per-shard cost vs the fused
    # single-chip step — target within ~2x)
    sharded_ms = None
    if method == "georegrid_pallas":
        try:
            from jax.sharding import Mesh
            from auromat_tpu.parallel import make_grid_sharded_mosaic_step

            mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                         axis_names=("dp", "sp"))
            gstep = make_grid_sharded_mosaic_step(
                mesh1, grid, h, w, channels=3, dtype=dtype,
                bin_method="pallas")
            dyn1 = jax.device_put(
                DynGeorefParams.stack([params], dtype=dtype))
            imgs1 = jax.device_put(img[None])  # (1, h, w, 3)
            dt_sh, _ = time_amortized(lambda: gstep(dyn1, imgs1),
                                      lambda o: o[0][0, 0], per_batch)
            sharded_ms = round(dt_sh * 1e3, 2)
            print(f"grid-sharded step (1-device mesh, pallas): "
                  f"{sharded_ms} ms", file=sys.stderr)
        except Exception as e:
            print(f"sharded bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # batched burst (BASELINE config 4: the NuMap-pipeline replacement):
    # 8 frames through the fused step inside ONE jit; sustained MPix/s
    burst_mpix_s = None
    if method == "georegrid_pallas":
        try:
            NB = int(os.environ.get("BENCH_BURST", 8))
            dynb = jax.device_put(
                DynGeorefParams.stack([params] * NB, dtype=dtype))

            @jax.jit
            def burst(imgs_chw, dynb):
                outs = []
                for i in range(NB):
                    d = jax.tree.map(lambda x: x[i], dynb)
                    outs.append(georegrid_mean(grid, d, imgs_chw[i]))
                return (sum(o[0] for o in outs),
                        jnp.stack([o[1] for o in outs]))

            imgs_b = jax.device_put(
                np.broadcast_to(img.transpose(2, 0, 1)[None],
                                (NB, 3, h, w)).copy())
            burst_dt, _ = time_amortized(lambda: burst(imgs_b, dynb),
                                         lambda o: o[0][0, 0],
                                         max(per_batch // 2, 2))
            burst_mpix_s = round(NB * mpix / burst_dt, 1)
            print(f"batched burst ({NB} frames): {burst_dt*1e3:.1f} ms = "
                  f"{burst_mpix_s} MPix/s sustained", file=sys.stderr)
        except Exception as e:
            print(f"burst bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # the UNIFIED config-4 path (VERDICT r3 item 4): the same B=8 burst
    # through the grid-sharded mosaic step on a 1-device mesh — the code
    # path production uses (provider iterParamBursts -> parallel.
    # mosaic_sequence), vs the hand-rolled fused-step loop above
    burst8_sharded_ms = None
    if method == "georegrid_pallas":
        try:
            from jax.sharding import Mesh
            from auromat_tpu.parallel import make_grid_sharded_mosaic_step

            NB = int(os.environ.get("BENCH_BURST", 8))
            mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                         axis_names=("dp", "sp"))
            gstep8 = make_grid_sharded_mosaic_step(
                mesh1, grid, h, w, channels=3, dtype=dtype,
                bin_method="pallas")
            dyn8 = jax.device_put(
                DynGeorefParams.stack([params] * NB, dtype=dtype))
            imgs8 = jax.device_put(
                np.broadcast_to(img[None], (NB, h, w, 3)).copy())
            dt8, _ = time_amortized(lambda: gstep8(dyn8, imgs8),
                                    lambda o: o[0][0, 0],
                                    max(per_batch // 2, 2))
            burst8_sharded_ms = round(dt8 * 1e3 / NB, 2)
            print(f"sharded mosaic step burst ({NB} frames, 1-device "
                  f"mesh): {burst8_sharded_ms} ms/frame", file=sys.stderr)
        except Exception as e:
            print(f"sharded burst bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # config 4 at its STATED scale (VERDICT r4 item 4): a 100-frame ISS
    # video burst through the production path (mosaic_sequence over the
    # grid-sharded step, batch-8 chunks, jittered per-frame calibration —
    # DynGeorefParams are traced, so one compiled step serves all 13
    # chunks). Sustained ms/frame should sit within ~10% of
    # burst8_sharded_ms. Disable with BENCH_BURST100=0.
    burst100_sharded_ms = None
    if method == "georegrid_pallas" and \
            os.environ.get("BENCH_BURST100", "1") != "0":
        try:
            import dataclasses

            from jax.sharding import Mesh
            from auromat_tpu.parallel import mosaic_sequence

            N100 = int(os.environ.get("BENCH_BURST100_N", 100))
            rng = np.random.default_rng(0)
            base_pos = np.asarray(params.camera_pos)
            p100 = [dataclasses.replace(
                params, camera_pos=tuple(
                    base_pos * (1.0 + 1e-4 * rng.standard_normal(3))))
                for _ in range(N100)]
            mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                         axis_names=("dp", "sp"))
            # imagery rides a DEVICE-RESIDENT 8-frame buffer (104 x 145 MB
            # through the relay would measure the tunnel, not the chip —
            # same device_put methodology as every other key); per-chunk
            # calibration params still stream from the host like
            # production
            imgs_dev = jax.device_put(
                np.broadcast_to(img[None], (8, h, w, 3)).copy())

            def bursts100():
                for i in range(0, N100, 8):
                    chunk = p100[i:i + 8]
                    yield chunk, imgs_dev[: len(chunk)]

            def run100():
                cnt, means = mosaic_sequence(
                    mesh1, grid, bursts100(), batch=8,
                    bin_method="pallas", dtype=dtype)
                return float(np.asarray(means[0, 0, 0]))  # host-fetch sync

            run100()  # compile + warmup
            t0 = time.perf_counter()
            run100()
            dt100 = time.perf_counter() - t0
            burst100_sharded_ms = round(dt100 * 1e3 / N100, 2)
            print(f"100-frame sequence through mosaic_sequence (1-device "
                  f"mesh): {burst100_sharded_ms} ms/frame sustained "
                  f"({dt100:.2f} s total)", file=sys.stderr)
        except Exception as e:
            print(f"burst100 bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # BASELINE config 5 at real scale: the 12 MP frame binned into the
    # 0.05 deg GLOBAL mosaic grid (3599 x 7199) through the grid-sharded
    # step on a 1-device mesh (pallas per-shard binning + empty-lat-slab
    # skipping). Quantifies the mission-scale mosaic cost on real hardware;
    # the 8-device virtual-mesh variant is tests/test_sharding.py
    # TestConfig5Scale. Disable with BENCH_CONFIG5=0 (one extra compile).
    config5_ms = None
    if method == "georegrid_pallas" and \
            os.environ.get("BENCH_CONFIG5", "1") != "0":
        try:
            from jax.sharding import Mesh
            from auromat_tpu.parallel import make_grid_sharded_mosaic_step

            g5 = fixed_grid(20, -89.999, 89.999, -179.999, 179.999)
            mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                         axis_names=("dp", "sp"))
            g5step = make_grid_sharded_mosaic_step(
                mesh1, g5, h, w, channels=3, dtype=dtype,
                bin_method="pallas")
            # config 5 is a full-orbit MOSAIC — many frames amortize the
            # fixed global-grid accumulator traffic, as production would
            # (measured: 28 ms/frame at B=1, 11.4 at B=8; B=4 balances
            # honesty and bench compile time)
            NB5 = int(os.environ.get("BENCH_CONFIG5_B", 4))
            dyn5 = jax.device_put(
                DynGeorefParams.stack([params] * NB5, dtype=dtype))
            imgs5 = jax.device_put(
                np.broadcast_to(img[None], (NB5, h, w, 3)).copy())
            dt5, _ = time_amortized(lambda: g5step(dyn5, imgs5),
                                    lambda o: o[0][0, 0],
                                    max(per_batch // 2, 2))
            config5_ms = round(dt5 * 1e3 / NB5, 2)
            print(f"config-5 global 0.05deg mosaic step (1-device mesh, "
                  f"{NB5}-frame burst): {config5_ms} ms/frame",
                  file=sys.stderr)
        except Exception as e:
            print(f"config-5 bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # BASELINE config 2 at deployment scale (VERDICT r4 item 6): 24
    # synthetic all-sky stations x 256x256 composited into ONE grid by
    # elevation priority (ops.regrid.bin_take_best — the device mosaic
    # compositor). Calibration grids are built host-side (untimed, like
    # production: calibration is static per night); the timed step is the
    # per-exposure device composite. Disable with BENCH_THEMIS24=0.
    themis24_ms = None
    themis24_apply_ms = None
    if os.environ.get("BENCH_THEMIS24", "1") != "0":
        try:
            from auromat_tpu.constants import WGS84_A, WGS84_B
            from auromat_tpu.coordinates.intersection import \
                ellipsoid_line_intersection
            from auromat_tpu.coordinates.transform import (
                ecef_to_geodetic, geodetic_to_ecef_zero)
            from auromat_tpu.mapping import miracle
            from auromat_tpu.mapping.themis import reproject_batch
            from auromat_tpu.ops.regrid import bin_take_best
            from auromat_tpu.utils import host_f64_device

            S, SZ = 24, 256
            rng = np.random.default_rng(1)
            st_lats = 51.0 + 11.0 * rng.random(S)
            st_lons = -150.0 + 90.0 * rng.random(S)
            lats_s, lons_s, elevs_s = [], [], []
            for i in range(S):
                cal = miracle.CalibrationData(
                    station=f"S{i:02d}", validFrom=None, validTo=None,
                    lat=float(st_lats[i]), lon=float(st_lons[i]),
                    xc=SZ / 2 * 512 / SZ, yc=SZ / 2 * 512 / SZ,
                    k=155.0, rotation=0.0, boundingBoxSimple=None)
                az, el = miracle.fisheye_az_el(cal, SZ, corner=False)
                with host_f64_device():
                    ox, oy, oz = geodetic_to_ecef_zero(
                        np.deg2rad(cal.lat), np.deg2rad(cal.lon))
                    origin = np.array([float(ox), float(oy), float(oz)])
                    dirs = miracle.az_el_to_geo_directions(cal, az, el)
                    inter = np.asarray(ellipsoid_line_intersection(
                        WGS84_A + 110.0, WGS84_B + 110.0, origin,
                        np.asarray(dirs)))
                    la, lo = ecef_to_geodetic(inter[..., 0], inter[..., 1],
                                              inter[..., 2])
                lats_s.append(np.rad2deg(np.asarray(la)))
                lons_s.append(np.rad2deg(np.asarray(lo)))
                elevs_s.append(np.asarray(el))
            # the vmapped all-station altitude reprojection (the P4 batch
            # replacement of the reference's serial loop) — host-pinned
            # f64, timed separately as one-time calibration prep
            t0 = time.perf_counter()
            la24, lo24 = reproject_batch(
                np.stack([st_lats, st_lons], axis=-1),
                np.stack(lats_s), np.stack(lons_s), 110.0, 100.0)
            reproj_s = time.perf_counter() - t0
            print(f"themis24 calibration reproject_batch (24x256x256, "
                  f"host f64): {reproj_s*1e3:.0f} ms", file=sys.stderr)
            g24 = fixed_grid(10, 40.0, 72.0, -160.0, -50.0)
            gray = rng.random((S, SZ, SZ)).astype(np.float32) * 255.0
            el24 = np.stack(elevs_s)
            data24 = np.stack([gray, np.broadcast_to(el24, gray.shape)],
                              axis=-1)
            la_d = jax.device_put(la24.astype(np.float32))
            lo_d = jax.device_put(lo24.astype(np.float32))
            pri_d = jax.device_put((-el24).astype(np.float32))
            data_d = jax.device_put(data24)

            take_best = jax.jit(lambda la, lo, pri, d:
                                bin_take_best(g24, la, lo, pri, d))
            dt24, _ = time_amortized(
                lambda: take_best(la_d, lo_d, pri_d, data_d),
                lambda o: o[0][0, 0, 0], per_batch)
            themis24_ms = round(dt24 * 1e3, 2)
            print(f"themis24 composite (24 stations, bin_take_best, "
                  f"{g24.n_lat}x{g24.n_lon} grid): {themis24_ms} ms",
                  file=sys.stderr)
            # production cadence: geometry static per night, imagery per
            # 3 s exposure -> plan once (one sort), gather per exposure
            from auromat_tpu.ops.regrid import (apply_take_best,
                                                plan_take_best)

            plan = jax.jit(lambda la, lo, pri:
                           plan_take_best(g24, la, lo, pri))(
                la_d, lo_d, pri_d)
            apply_fn = jax.jit(apply_take_best)
            dt24a, _ = time_amortized(
                lambda: apply_fn(plan, data_d),
                lambda o: o[0, 0, 0], per_batch)
            themis24_apply_ms = round(dt24a * 1e3, 2)
            print(f"themis24 planned composite (per-exposure gather): "
                  f"{themis24_apply_ms} ms", file=sys.stderr)
        except Exception as e:
            print(f"themis24 bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # full-precision (df64) chain: per-pixel lat/lon at <1e-6 deg parity
    # (VERDICT r1 item 2), plus the FULL-variable chain (lat/lon/elevation/
    # mlat/mlt — every exported per-pixel variable; VERDICT r2 item 3)
    from auromat_tpu.ops.georef import (georeference_points_df,
                                        georeference_points_df_full)

    def _time_df(fn, sync_key):
        dt_df, _ = time_amortized(fn, sync_key, per_batch)
        return round(dt_df * 1e3, 2)

    @jax.jit
    def df64_forward():
        px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
        py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
        return georeference_points_df(params, px, py)

    @jax.jit
    def df64_forward_full():
        px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
        py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
        return georeference_points_df_full(params, px, py)

    try:
        df64_ms = _time_df(df64_forward, lambda o: o[0][0, 0])
        print(f"df64 full-precision georef: {df64_ms} ms", file=sys.stderr)
    except Exception as e:
        print(f"df64 path failed: {type(e).__name__}: {e}", file=sys.stderr)
        df64_ms = None
    try:
        df64_full_ms = _time_df(df64_forward_full,
                                lambda o: o["mlt"][0][0, 0])
        print(f"df64 full-variable georef (lat/lon/elev/mlat/mlt): "
              f"{df64_full_ms} ms", file=sys.stderr)
    except Exception as e:
        print(f"df64 full path failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        df64_full_ms = None

    # df64 beyond TAN (VERDICT r4 item 2): the full-variable chain with
    # the trig-free ZEA radial law — must stay inside the 25 ms budget
    from auromat_tpu.ops.georef import georeference_points_df_full

    @jax.jit
    def df64_forward_zea():
        px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
        py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
        return georeference_points_df_full(params, px, py, projection="ZEA")

    try:
        df64_zen_full_ms = _time_df(df64_forward_zea,
                                    lambda o: o["mlt"][0][0, 0])
        print(f"df64 full-variable georef (ZEA radial law): "
              f"{df64_zen_full_ms} ms", file=sys.stderr)
    except Exception as e:
        print(f"df64 ZEA path failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        df64_zen_full_ms = None

    # generic-projection (non-TAN) georef: perf on the production-shaped
    # call (full frame, fast centres, MLat/MLT — what create_mapping runs
    # for a non-TAN header) + on-chip parity vs the CPU f64 oracle
    # (VERDICT r4 item 1). The f32 floor of this chain is ~1.6e-3 deg
    # (tests/test_georef.py::test_generic_projection_f32_floor); anything
    # near 1e-2 means a TPU-only hazard.
    generic_ms = None
    generic_parity_deg = None
    try:
        from auromat_tpu.coordinates.wcs import make_wcs
        from auromat_tpu.ops.georef import (georeference_generic,
                                            georeference_points_generic)

        hdr = dict(header)

        def swap(code):
            h2 = {k: v for k, v in hdr.items()
                  if k.upper() not in ("LONPOLE", "LATPOLE")}
            h2["CTYPE1"] = f"RA---{code}"
            h2["CTYPE2"] = f"DEC--{code}"
            return make_wcs(h2)

        wcs_zea = swap("ZEA")
        gfn = jax.jit(lambda: georeference_generic(
            wcs_zea, params, True, True, jnp.float32))
        dtg, _ = time_amortized(gfn, lambda o: o["lats"][0, 0], per_batch)
        generic_ms = round(dtg * 1e3, 2)
        print(f"generic-projection georef (ZEA, full frame, f32): "
              f"{generic_ms} ms", file=sys.stderr)

        cpu = jax.devices("cpu")[0]
        pxs = np.arange(0, w, 8, dtype=np.float64)
        pys = np.arange(0, h, 8, dtype=np.float64)
        pxg, pyg = np.meshgrid(pxs, pys)
        worst = 0.0
        for code in ("ZEA", "HPX", "QSC"):
            wcsf = swap(code)
            lat_t, lon_t = (np.asarray(a, dtype=np.float64)
                            for a in georeference_points_generic(
                                wcsf, params, pxg.astype(np.float32),
                                pyg.astype(np.float32), jnp.float32))
            with jax.default_device(cpu):
                lat_c, lon_c = (np.asarray(a)
                                for a in georeference_points_generic(
                                    wcsf, params,
                                    jnp.asarray(pxg, jnp.float64),
                                    jnp.asarray(pyg, jnp.float64),
                                    jnp.float64))
            both = ~np.isnan(lat_t) & ~np.isnan(lat_c)
            dla = np.abs(lat_t[both] - lat_c[both])
            dlo = np.abs(lon_t[both] - lon_c[both])
            dlo = np.minimum(dlo, 360.0 - dlo)
            fam = float(max(dla.max(), dlo.max()))
            mism = float((np.isnan(lat_t) != np.isnan(lat_c)).mean())
            print(f"generic parity {code}: max {fam:.3e} deg, mask "
                  f"mismatch {mism:.2e}", file=sys.stderr)
            worst = max(worst, fam)
            if mism > 5e-4:
                worst = max(worst, 1.0)  # poison: masks are part of parity
        generic_parity_deg = float(f"{worst:.3e}")
    except Exception as e:
        print(f"generic-projection bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    value = mpix / dt
    baseline = 12.05 / 10e-3  # north-star: 12 MPix in 10 ms
    print(
        json.dumps(
            {
                "metric": f"georef+regrid 12MP ISS frame ({backend}, f32)",
                "value": round(value, 2),
                "unit": "MPix/s/chip",
                "vs_baseline": round(value / baseline, 4),
                "method": method,
                "df64_georef_ms": df64_ms,
                "df64_full_ms": df64_full_ms,
                "df64_zen_full_ms": df64_zen_full_ms,
                "sharded_1dev_pallas_ms": sharded_ms,
                "burst8_mpix_s": burst_mpix_s,
                "burst8_sharded_ms": burst8_sharded_ms,
                "burst100_sharded_ms": burst100_sharded_ms,
                "config5_ms": config5_ms,
                "themis24_ms": themis24_ms,
                "themis24_apply_ms": themis24_apply_ms,
                "generic_ms": generic_ms,
                "generic_parity_deg": generic_parity_deg,
            }
        )
    )
    if backend == "tpu" and method != "georegrid_pallas" \
            and not os.environ.get("AUROMAT_ALLOW_FALLBACK"):
        # a silent Mosaic regression must fail the bench, not quietly
        # report the 18x slower sorted path (VERDICT r1, weak #5)
        raise SystemExit("bench ran on TPU without the Pallas fast path")


if __name__ == "__main__":
    main()
