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


def main():
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
        fits.get_photo_time(header),
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
    # end of each batch bounds the whole batch
    per_batch = int(os.environ.get('BENCH_PER_BATCH', 10))
    batch_times = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(per_batch):
            out = forward(img_dev)
        sync(out)
        batch_times.append((time.perf_counter() - t0) / per_batch)
    dt = float(np.median(batch_times))
    print(
        f"amortized step: {dt*1e3:.2f} ms "
        f"(batches: {[round(t*1e3, 1) for t in batch_times]})",
        file=sys.stderr,
    )

    # full-precision (df64) chain: per-pixel lat/lon at <1e-6 deg parity
    # (VERDICT r1 item 2: report alongside the f32 number)
    from auromat_tpu.ops.georef import georeference_points_df

    @jax.jit
    def df64_forward():
        px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
        py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
        return georeference_points_df(params, px, py)

    try:
        out64 = df64_forward()
        float(np.asarray(out64[0][0, 0]))
        t64s = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(per_batch):
                out64 = df64_forward()
            float(np.asarray(out64[0][0, 0]))
            t64s.append((time.perf_counter() - t0) / per_batch)
        df64_ms = round(float(np.median(t64s)) * 1e3, 2)
        print(f"df64 full-precision georef: {df64_ms} ms", file=sys.stderr)
    except Exception as e:
        print(f"df64 path failed: {type(e).__name__}: {e}", file=sys.stderr)
        df64_ms = None

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
