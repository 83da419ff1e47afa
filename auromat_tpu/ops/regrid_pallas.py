"""Pallas TPU kernel for plate-carree mean binning.

Design (SURVEY.md section 7 "hard parts" — the scatter-add regrid):
image-space tiles are spatially coherent, so a tile of pixels falls into a
narrow band of grid *rows*. Per tile the kernel accumulates

    S[(ch, r), c] = sum_p (Ey[p, r] * d[p, ch]) * Ex[p, c]

as ONE MXU matmul: A (channels stacked along M with the row one-hot) times
the column one-hot Ex — no scatter, no sort. Channels are stacked along M so
the matmul runs at high MXU utilisation (M = 6*16 = 96), and the one-hots
are bf16 (exact for 0/1 and for 0..255 imagery; sums accumulate in f32, and
the elevation channel is split into an exact integer part + small fraction).

Pixels outside their tile's aligned row window (a small population near the
horizon, where the pixel footprint explodes) are emitted as spill keys and
accumulated exactly by the sorted XLA path in a second pass; lax.sort on the
mostly-sentinel spill keys is cheap because the TPU sort is adaptive.

The full accumulator grid lives in VMEM across the kernel's grid steps; this
caps the grid at ~512x1024 cells per call — larger (mosaic-scale) grids run
sharded (auromat_tpu.parallel) or on the sorted path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from auromat_tpu.ops.regrid import GridSpec, _bin_sum_sorted

TILE_H = 16
TILE_W = 128
WIN_R = 16  # aligned row window (>= 9 usable rows after 8-snapping)

# channel layout inside the kernel: count, data..., elevation handled by the
# caller via the exact hi/frac split
ELEV_OFFSET = 90.0


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(lat_ref, lon_ref, data_ref, acc_ref, spill_ref, *,
            grid: GridSpec, n_ch, n_lat_pad, n_lon_pad):
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    @pl.when((ty == 0) & (tx == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lat = lat_ref[:]
    lon = lon_ref[:]
    # all grid constants as f32: python-float (f64) scalars are unsupported
    # inside Mosaic under x64
    lat_hi_edge = np.float32(grid.lat0 + grid.lat_step / 2)
    lon_lo_edge = np.float32(grid.lon0 - grid.lon_step / 2)
    inv_lat = np.float32(1.0 / grid.lat_step)
    inv_lon = np.float32(1.0 / grid.lon_step)
    fy = (lat_hi_edge - lat) * inv_lat
    fx = (lon - lon_lo_edge) * inv_lon
    iy = jnp.floor(fy).astype(jnp.int32)
    ix = jnp.floor(fx).astype(jnp.int32)
    # inclusive far edge (numpy histogram semantics)
    n_lat_i = np.int32(grid.n_lat)
    n_lon_i = np.int32(grid.n_lon)
    iy = jnp.where(
        (fy == np.float32(grid.n_lat)) & (iy == n_lat_i), n_lat_i - 1, iy
    )
    ix = jnp.where(
        (fx == np.float32(grid.n_lon)) & (ix == n_lon_i), n_lon_i - 1, ix
    )
    zero_i = np.int32(0)
    valid = (
        (iy >= zero_i) & (iy < n_lat_i) & (ix >= zero_i) & (ix < n_lon_i)
        & jnp.isfinite(lat) & jnp.isfinite(lon)
    )

    big = jnp.int32(1 << 30)
    r0 = jnp.min(jnp.where(valid, iy, big))
    eight = np.int32(8)
    r0 = jnp.clip((r0 // eight) * eight, np.int32(0), np.int32(n_lat_pad - WIN_R))
    dr = iy - r0
    in_win = valid & (dr >= np.int32(0)) & (dr < np.int32(WIN_R))

    n_stack = n_ch + 1  # count first
    dr_b = jnp.where(in_win, dr, np.int32(-1))[None, :, :]  # (1, TH, TW)
    dc_b = jnp.where(in_win, ix, np.int32(-1))[:, :, None]  # (TH, TW, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, TILE_H, TILE_W), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W, n_lon_pad), 2)
    ey = (iota_r == dr_b).astype(jnp.float32)  # (WR, TH, TW)
    ex = (iota_c == dc_b).astype(jnp.bfloat16)  # (TH, TW, n_lon_pad)

    data = data_ref[:]  # (n_ch, TH, TW), pre-sanitised by the caller
    d_all = jnp.concatenate(
        [jnp.ones((1, TILE_H, TILE_W), jnp.float32), data], axis=0
    )
    # A: (n_stack * WR, TH, TW) = d_all (ch) x ey (row one-hot)
    a = (d_all[:, None, :, :] * ey[None, :, :, :]).reshape(
        n_stack * WIN_R, TILE_H, TILE_W
    ).astype(jnp.bfloat16)
    # S: (n_stack * WR, n_lon_pad), contracting the pixel dim on the MXU
    # (Mosaic requires a single contraction dim -> collapse TH x TW first)
    a2 = a.reshape(a.shape[0], TILE_H * TILE_W)
    ex2 = ex.reshape(TILE_H * TILE_W, ex.shape[-1])
    s = jax.lax.dot_general(
        a2, ex2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s.reshape(n_stack, WIN_R, n_lon_pad)

    cur = acc_ref[:, pl.ds(r0, WIN_R), :]
    acc_ref[:, pl.ds(r0, WIN_R), :] = cur + s

    # spill keys: global flat bin for valid-but-outside-window pixels
    n_bins = np.int32(grid.n_lat * grid.n_lon)
    spill = jnp.where(valid & ~in_win, iy * n_lon_i + ix, n_bins)
    spill_ref[:] = spill


def _split_elevation(data):
    """Split the last channel (elevation) into bf16-exact parts.

    bf16 has an 8-bit mantissa: integers <= 256 and fractions are exact to
    ~2e-3, so elevation rides as (floor(el + 90), frac) and reconstructs as
    hi + frac - 90*count after accumulation.
    """
    el = data[..., -1] + ELEV_OFFSET
    hi = jnp.floor(el)
    frac = el - hi
    return jnp.concatenate(
        [data[..., :-1], hi[..., None], frac[..., None]], axis=-1
    )


def _split_full(data):
    """Base-256 digit split of every channel: v = 256*hi + mid + frac.

    hi/mid are bf16-exact integers (<= 256); frac < 1 carries <= 2e-3
    absolute error. Covers uint16 imagery and arbitrary floats in
    [0, 65536)."""
    v = data
    hi = jnp.floor(v / 256.0)
    rem = v - 256.0 * hi
    mid = jnp.floor(rem)
    frac = rem - mid
    return jnp.concatenate([hi, mid, frac], axis=-1)


def _unsplit_full(sums_k, n_ch_in):
    hi = sums_k[..., :n_ch_in]
    mid = sums_k[..., n_ch_in : 2 * n_ch_in]
    frac = sums_k[..., 2 * n_ch_in :]
    return 256.0 * hi + mid + frac


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def bin_partial_pallas(grid: GridSpec, lats, lons, data, mode="uint8",
                       interpret=False):
    """Per-shard partial (count, sums) via the Pallas kernel + spill pass.

    :param lats, lons: (h, w) f32 sample coordinates (NaN = masked)
    :param data: (h, w, C) f32
    :param mode: channel-exactness strategy for the bf16 one-hot matmul:
        'uint8'  — channels are 0..255 integers except the LAST (elevation),
                   which is carried exactly via an int+frac split;
        'full'   — base-256 digit split of every channel (uint16 imagery or
                   arbitrary floats in [0, 65536); ~1.5x matmul cost);
        'raw'    — no split (only for bf16-exact data)
    :returns: (count (n_lat, n_lon), sums (n_lat, n_lon, C))
    """
    h, w = lats.shape
    n_ch_in = data.shape[-1]
    data = data.astype(jnp.float32)
    valid_in = jnp.isfinite(lats) & jnp.isfinite(lons)
    data = jnp.where(valid_in[..., None], data, 0.0)
    if mode == "uint8":
        data_k = _split_elevation(data)
    elif mode == "full":
        data_k = _split_full(data)
    else:
        data_k = data
    n_ch = data_k.shape[-1]

    hp = _round_up(h, TILE_H)
    wp = _round_up(w, TILE_W)
    pad_spec = ((0, hp - h), (0, wp - w))
    latp = jnp.pad(lats.astype(jnp.float32), pad_spec, constant_values=jnp.nan)
    lonp = jnp.pad(lons.astype(jnp.float32), pad_spec, constant_values=jnp.nan)
    datap = jnp.pad(
        jnp.transpose(data_k, (2, 0, 1)), ((0, 0),) + pad_spec
    )
    n_lat_pad = max(_round_up(grid.n_lat, 8), WIN_R)
    n_lon_pad = _round_up(grid.n_lon, 128)
    if n_lat_pad * n_lon_pad * (n_ch + 1) * 4 > 12 * 1024 * 1024:
        raise ValueError(
            f"grid {grid.n_lat}x{grid.n_lon} too large for the VMEM "
            "accumulator; use the sorted path or shard the grid"
        )

    kernel = functools.partial(
        _kernel, grid=grid, n_ch=n_ch, n_lat_pad=n_lat_pad, n_lon_pad=n_lon_pad
    )
    acc, spill = pl.pallas_call(
        kernel,
        grid=(hp // TILE_H, wp // TILE_W),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ch, TILE_H, TILE_W), lambda ty, tx: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_ch + 1, n_lat_pad, n_lon_pad),
                         lambda ty, tx: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_ch + 1, n_lat_pad, n_lon_pad), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ),
        interpret=interpret,
    )(latp, lonp, datap)

    count = acc[0, : grid.n_lat, : grid.n_lon]
    sums_k = jnp.transpose(acc[1:, : grid.n_lat, : grid.n_lon], (1, 2, 0))

    # spill pass: exact accumulation of out-of-window pixels via the sorted
    # path (keys are ~all sentinel -> adaptive sort is cheap)
    flat_spill = spill[:h, :w].reshape(-1)
    flat_data = data_k.reshape(-1, n_ch)
    acc2 = _bin_sum_sorted(flat_spill, None, flat_data,
                           grid.n_lat * grid.n_lon, n_ch)
    count = count + acc2[:, 0].reshape(grid.n_lat, grid.n_lon)
    sums_k = sums_k + acc2[:, 1:].reshape(grid.n_lat, grid.n_lon, n_ch)

    if mode == "uint8":
        el_sum = sums_k[..., -2] + sums_k[..., -1] - ELEV_OFFSET * count
        sums = jnp.concatenate(
            [sums_k[..., : n_ch_in - 1], el_sum[..., None]], axis=-1
        )
    elif mode == "full":
        sums = _unsplit_full(sums_k, n_ch_in)
    else:
        sums = sums_k
    return count, sums


def bin_mean_pallas(grid: GridSpec, lats, lons, data, mode="uint8",
                    interpret=False):
    """Mean binning via the Pallas kernel; NaN where empty."""
    count, sums = bin_partial_pallas(grid, lats, lons, data, mode,
                                     interpret)
    means = jnp.where(count[..., None] > 0, sums / count[..., None], jnp.nan)
    return count, means
