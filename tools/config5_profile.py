"""Stage-isolated profile of the config-5 global-mosaic step on the real
TPU: where do the ms/frame go between georef prep, kernel binning, zero
fills, and finalize? (VERDICT r4 item 3 — close the 11.9 vs 8.3 ms/frame
gap or prove it structural.)

Usage:  python tools/config5_profile.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, n=8):
    fn()  # warm
    float(np.asarray(sync(fn())))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    float(np.asarray(sync(outs[-1])))  # host fetch = the only real sync
    return (time.perf_counter() - t0) * 1e3 / n


def main():
    from bench import _probe_backend
    _probe_backend(attempts=1)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import dataclasses
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from auromat_tpu.coordinates.wcs import TanWcs
    from auromat_tpu.io import fits
    from auromat_tpu.ops.georef import (DynGeorefParams, GeorefParams,
                                        georef_latlon_dyn)
    from auromat_tpu.ops.regrid import bin_indices, fixed_grid
    from auromat_tpu.ops.georegrid import (bin_rgbelev_from_indices,
                                           split_bin_indices)
    from auromat_tpu.parallel import make_grid_sharded_mosaic_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    header = fits.read_header(
        os.path.join(repo, "tests", "resources", "ISS030-E-102170_dc.wcs"))
    wcs = TanWcs(header)
    params = GeorefParams.from_wcs(
        wcs, fits.get_shifted_spacecraft_position(header)[:3],
        fits.get_shifted_photo_time(header), altitude=110.0)
    h, w = params.height, params.width

    from PIL import Image
    img = np.asarray(Image.open(
        os.path.join(repo, "tests", "resources", "ISS030-E-102170_dc.jpg"))
    ).astype(np.float32)

    grid = fixed_grid(20, -89.999, 89.999, -179.999, 179.999)
    n_lon = grid.n_lon
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    dyn = jax.device_put(DynGeorefParams.stack([params] * B,
                                               dtype=jnp.float32))
    imgs = jax.device_put(np.broadcast_to(img[None], (B, h, w, 3)).copy())
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

    # 3. georef + bin_indices + split prep only (the XLA pass)
    @jax.jit
    def prep(dyn_local, imgs_local):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
        px = jnp.broadcast_to(xs, (h, w)) - 1.0
        py = jnp.broadcast_to(ys, (h, w)) - 1.0

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

    iy2, ix2, img2, elev2 = jax.block_until_ready(prep(dyn, imgs))

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
