"""Stage-isolated profile of the config-5 global-mosaic step on the real
TPU: where do the ms/frame go between georef prep, kernel binning, zero
fills, and finalize? (VERDICT r4 item 3 — close the 11.9 vs 8.3 ms/frame
gap or prove it structural.)

Workload + device staging come from config5_tpu.load_workload so this
decomposes EXACTLY the step config5_tpu.py/bench.py time; the timing loop
is bench.py's amortized methodology (rebind one output per call — holding
all outputs alive would keep multiple ~0.5 GB grid pairs in HBM through
the timed region — one scalar host fetch per batch, median of batches).

Usage:  python tools/config5_profile.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, sync, iters=8, batches=4):
    out = fn()  # warm (compile)
    float(np.asarray(sync(out)))
    ts = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()  # rebind: exactly one output alive at a time
        float(np.asarray(sync(out)))  # host fetch = the only real sync
        ts.append((time.perf_counter() - t0) * 1e3 / iters)
    return float(np.median(ts))


def main():
    from config5_tpu import load_workload

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax

    wl = load_workload(B)
    import dataclasses
    import jax.numpy as jnp

    from auromat_tpu.ops.georef import georef_latlon_dyn
    from auromat_tpu.ops.regrid import bin_indices
    from auromat_tpu.ops.georegrid import (bin_rgbelev_from_indices,
                                           split_bin_indices)
    from auromat_tpu.parallel import make_grid_sharded_mosaic_step

    h, w, grid, mesh = wl["h"], wl["w"], wl["grid"], wl["mesh"]
    dyn, imgs = wl["dyn"], wl["imgs"]
    n_lon = grid.n_lon
    print(f"backend: {jax.default_backend()}, B={B}", file=sys.stderr)

    # 1. the full step (reference point)
    step = make_grid_sharded_mosaic_step(mesh, grid, h, w, channels=3,
                                         dtype=jnp.float32,
                                         bin_method="pallas")
    ms = timeit(lambda: step(dyn, imgs), lambda o: o[0][0, 0])
    print(f"full step (finalize=True):  {ms:7.2f} ms  "
          f"({ms/B:.2f} ms/frame)")

    # 2. partials only (no finalize_mean pass)
    step_p = make_grid_sharded_mosaic_step(mesh, grid, h, w, channels=3,
                                           dtype=jnp.float32,
                                           bin_method="pallas",
                                           finalize=False)
    ms = timeit(lambda: step_p(dyn, imgs), lambda o: o[0][0, 0])
    print(f"partials (finalize=False):  {ms:7.2f} ms  "
          f"({ms/B:.2f} ms/frame)")

    # 3. georef + bin_indices + split prep only (the XLA pass). Pixel grid
    #    = the production 0-based pixel-centre convention of
    #    parallel.sharding._local_pixel_grid / ops.georegrid._georegrid
    #    (an offset grid would bin a shifted sample set and decompose a
    #    different computation than stages 1-2).
    @jax.jit
    def prep(dyn_local, imgs_local):
        px = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
        py = jnp.broadcast_to(
            jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))

        def per_frame(d, im):
            out = georef_latlon_dyn(d, px, py, dtype=jnp.float32,
                                    with_elevation=True)
            data = jnp.concatenate([im, out["elevation"][..., None]],
                                   axis=-1)
            return out["lat"], out["lon"], data

        lat, lon, data = jax.vmap(per_frame)(dyn_local, imgs_local)
        flat_idx, valid = bin_indices(grid, jnp.ravel(lat), jnp.ravel(lon))
        iy2, ix2 = split_bin_indices(grid, flat_idx, valid)
        iy2 = iy2.reshape(-1, w)
        ix2 = ix2.reshape(-1, w)
        img2 = jnp.transpose(data[..., :3].reshape(-1, w, 3), (2, 0, 1))
        elev2 = data[..., 3].reshape(-1, w)
        return iy2, ix2, img2, elev2

    ms = timeit(lambda: prep(dyn, imgs), lambda o: o[0][0, 0])
    print(f"prep (georef+indices):      {ms:7.2f} ms  "
          f"({ms/B:.2f} ms/frame)")

    # materialize prep outputs before the bin-only stages (block_until_
    # ready does NOT block on axon buffers — host-fetch each leaf)
    outs = prep(dyn, imgs)
    for o in outs:
        float(np.asarray(o[0, 0] if o.ndim == 2 else o[0, 0, 0]))
    iy2, ix2, img2, elev2 = outs

    # 4. kernel binning alone (pooled indices -> band-padded accumulator)
    grid_pad = dataclasses.replace(grid, n_lat=3600)

    @jax.jit
    def bin_only(iy2, ix2, img2, elev2):
        return bin_rgbelev_from_indices(grid_pad, iy2, ix2, img2, elev2)

    ms = timeit(lambda: bin_only(iy2, ix2, img2, elev2),
                lambda o: o[0][0, 0])
    print(f"bin only (global grid):     {ms:7.2f} ms  "
          f"({ms/B:.2f} ms/frame)")

    # 5. same kernel on a REGIONAL-sized grid (the 8.3 ms/frame floor's
    #    grid) with rebased indices — isolates the global-grid overhead
    lat_h = np.asarray(jax.device_get(iy2))
    occ = lat_h[lat_h >= 0]
    lo = int(occ.min()) // 8 * 8
    hi = int(occ.max()) + 1
    rows_reg = -(-(hi - lo) // 8) * 8
    grid_reg = dataclasses.replace(grid, n_lat=rows_reg)

    @jax.jit
    def bin_reg(iy2, ix2, img2, elev2):
        iyr = jnp.where(iy2 >= 0, iy2 - lo, -1)
        return bin_rgbelev_from_indices(grid_reg, iyr, ix2, img2, elev2)

    ms = timeit(lambda: bin_reg(iy2, ix2, img2, elev2),
                lambda o: o[0][0, 0])
    print(f"bin only (regional {rows_reg}x{n_lon}): {ms:7.2f} ms  "
          f"({ms/B:.2f} ms/frame)")


if __name__ == "__main__":
    main()
