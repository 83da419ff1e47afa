"""Measure the int8-MXU binning kernel vs the flagship bf16 kernel on the
real 12 MP bench workload (VERDICT r3 item 2: a number, not an assumption,
for the int8 escape route out of the 8.3 ms floor).

Interleaved A/B with the bench's amortized fetch-synced methodology (the
only reliable axon sync is a host fetch). Run on a quiet host.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.io import fits
    from auromat_tpu.ops.georef import (DynGeorefParams, GeorefParams,
                                        georef_latlon_dyn)
    from auromat_tpu.ops.georegrid import (bin_rgbelev_from_indices,
                                           split_bin_indices)
    from auromat_tpu.ops.regrid import bin_indices, fixed_grid

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    header = fits.read_header(
        os.path.join(repo, "tests", "resources", "ISS030-E-102170_dc.wcs"))
    wcs = TanWcs(header)
    params = GeorefParams.from_wcs(
        wcs, fits.get_shifted_spacecraft_position(header)[:3],
        fits.get_photo_time(header), altitude=110.0)
    h, w = params.height, params.width
    dyn = DynGeorefParams.from_static(params, dtype=jnp.float32)
    grid = fixed_grid((36, 25), 47.0, 62.0, -112.0, -91.0)

    from PIL import Image
    img = np.asarray(Image.open(os.path.join(
        repo, "tests", "resources", "ISS030-E-102170_dc.jpg"))
    ).astype(np.float32)
    img_dev = jax.device_put(np.ascontiguousarray(img.transpose(2, 0, 1)))

    def make_fwd(compute, tiles=(16, 256, 8)):
        @jax.jit
        def fwd(img_chw):
            px = jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
            py = jnp.broadcast_to(
                jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
            out = georef_latlon_dyn(dyn, px, py, dtype=jnp.float32,
                                    with_elevation=True)
            flat, valid = bin_indices(grid, out["lat"], out["lon"])
            iy, ix = split_bin_indices(grid, flat, valid)
            return bin_rgbelev_from_indices(
                grid, iy, ix, img_chw, out["elevation"], tiles=tiles,
                compute=compute)
        return fwd

    def sync(out):
        return float(np.asarray(out[0][0, 0]))

    variants = {}
    for name, compute, tiles in [
        ("bf16 (16,256,8)", "bf16", (16, 256, 8)),
        ("i8   (16,256,8)", "i8", (16, 256, 8)),
        ("i8   (16,512,8)", "i8", (16, 512, 8)),
        ("i8   (32,256,8)", "i8", (32, 256, 8)),
    ]:
        fwd = make_fwd(compute, tiles)
        try:
            t0 = time.time()
            out = fwd(img_dev)
            sync(out)
            print(f"{name}: compiled+ran in {time.time()-t0:.1f}s",
                  file=sys.stderr)
            variants[name] = fwd
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr)

    # correctness: i8 vs bf16 on the real frame
    if "bf16 (16,256,8)" in variants and "i8   (16,256,8)" in variants:
        c1, s1 = variants["bf16 (16,256,8)"](img_dev)
        c2, s2 = variants["i8   (16,256,8)"](img_dev)
        c1, s1, c2, s2 = map(np.asarray, (c1, s1, c2, s2))
        print("count equal:", np.array_equal(c1, c2),
              "rgb equal:", np.array_equal(s1[..., :3], s2[..., :3]),
              "elev max/bin:",
              float((np.abs(s1[..., 3] - s2[..., 3])
                     / np.maximum(c1, 1)).max()))

    iters = int(os.environ.get("ITERS", 10))
    results = {k: [] for k in variants}
    for _ in range(4):  # interleaved batches cancel TPU state drift
        for name, fwd in variants.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(img_dev)
            sync(out)
            results[name].append((time.perf_counter() - t0) / iters * 1e3)
    for name, ts in results.items():
        print(f"{name}: median {np.median(ts):.2f} ms "
              f"(batches {[round(t, 2) for t in ts]})")


if __name__ == "__main__":
    main()
