"""Sharded batch georeferencing + mosaic regrid over a jax.sharding.Mesh.

The full pipeline step = batched georef (vmap over frames) + multi-channel
mean regrid with a cross-shard psum of (count, sums) partial bins. Frames
shard over the ``dp`` mesh axis, image rows over ``sp``; the reduction rides
ICI collectives inserted for the psum. This is the TPU-native replacement for
the reference's host-process parallelism (auromat/mapping/spacecraft.py:
308-377) and the scale path for mission-scale mosaics (BASELINE configs 4-5).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from auromat_tpu.ops.georef import DynGeorefParams, georef_latlon_dyn
from auromat_tpu.ops.regrid import GridSpec, bin_partial, finalize_mean


def make_mesh(devices=None, dp=None, sp=None):
    """Build a (dp, sp) mesh over the given (or all) devices.

    Picks the most square-ish factorisation when sizes are not given.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None or sp is None:
        sp = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                sp = cand
                break
        dp = n // sp
    assert dp * sp == len(devices), (dp, sp, len(devices))
    dev = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def _local_pixel_grid(height, width, rows_per_shard, dtype):
    """Pixel-centre grid for this shard's row block (sp axis offset)."""
    row0 = jax.lax.axis_index("sp") * rows_per_shard
    ys = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows_per_shard, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (rows_per_shard, width), 1)
    return xs.astype(dtype), ys.astype(dtype)


def make_sharded_mosaic_step(mesh: Mesh, grid: GridSpec, height, width,
                             channels=3, dtype=jnp.float32,
                             with_elevation=True, bin_method="sorted"):
    """Build the jitted full pipeline step over a mesh.

    step(dyn_params, imgs) -> (count, means)
      dyn_params: DynGeorefParams stacked over frames (leading axis B)
      imgs: (B, height, width, channels) float
      count: (n_lat, n_lon) replicated; means: (n_lat, n_lon, channels[+1])
      (last channel = mean elevation when with_elevation)

    B must divide by mesh 'dp', height by 'sp'.
    """
    dp_n = mesh.shape["dp"]
    sp_n = mesh.shape["sp"]
    assert height % sp_n == 0, (height, sp_n)
    rows_per_shard = height // sp_n

    def shard_fn(dyn_local, imgs_local):
        # dyn_local: leaves with leading axis B/dp; imgs_local (B/dp, h/sp, w, C)
        px, py = _local_pixel_grid(height, width, rows_per_shard, dtype)

        def per_frame(d, img):
            out = georef_latlon_dyn(d, px, py, dtype=dtype,
                                    with_elevation=with_elevation)
            data = img
            if with_elevation:
                data = jnp.concatenate([img, out["elevation"][..., None]], axis=-1)
            return bin_partial(grid, out["lat"], out["lon"], data, bin_method)

        counts, sums = jax.vmap(per_frame)(dyn_local, imgs_local)
        count = jnp.sum(counts, axis=0)
        sums = jnp.sum(sums, axis=0)
        count = jax.lax.psum(count, ("dp", "sp"))
        sums = jax.lax.psum(sums, ("dp", "sp"))
        return count, finalize_mean(count, sums)

    dyn_spec = jax.tree.map(lambda _: P("dp"), DynGeorefParams(
        *[0.0] * len(DynGeorefParams._fields)))
    step = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(dyn_spec, P("dp", "sp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def sharded_batch_georef(mesh: Mesh, height, width, dtype=jnp.float32,
                         with_elevation=True, with_mlatmlt=False):
    """Build a jitted batched georef: frames over dp, rows over sp.

    fn(dyn_params) -> dict of (B, height, width) arrays (lat, lon, ...).
    Outputs keep the same sharding (no communication at all — per-pixel math
    is embarrassingly parallel).
    """
    sp_n = mesh.shape["sp"]
    assert height % sp_n == 0
    rows_per_shard = height // sp_n

    def shard_fn(dyn_local):
        px, py = _local_pixel_grid(height, width, rows_per_shard, dtype)
        return jax.vmap(
            lambda d: georef_latlon_dyn(d, px, py, dtype=dtype,
                                        with_elevation=with_elevation,
                                        with_mlatmlt=with_mlatmlt)
        )(dyn_local)

    dyn_spec = jax.tree.map(lambda _: P("dp"), DynGeorefParams(
        *[0.0] * len(DynGeorefParams._fields)))
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(dyn_spec,),
        out_specs=jax.tree.map(lambda _: P("dp", "sp"), {"lat": 0, "lon": 0,
                               **({"elevation": 0} if with_elevation else {}),
                               **({"mlat": 0, "mlt": 0} if with_mlatmlt else {})}),
        check_vma=False,
    )
    return jax.jit(fn)
