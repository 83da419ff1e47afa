"""Pallas TPU kernel for plate-carree mean binning — the sort-free fast path.

Design (SURVEY.md section 7 "hard parts" — the scatter-add regrid):
image-space tiles are spatially coherent, so a tile of pixels falls into a
narrow, contiguous band of grid *rows*. Per tile the kernel accumulates

    S[(ch, r), c] = sum_p (Ey[p, r] * d[p, ch]) * Ex[p, c]

as ONE MXU matmul per 16-row window: A (channels stacked along M with the
row one-hot Ey) times the column one-hot Ex — no scatter, no sort. Channels
are stacked along M so the matmul runs at reasonable MXU utilisation
(M = 6*16 = 96), and the one-hots are bf16 (exact for 0/1 and 0..255
imagery; sums accumulate in f32; the elevation channel is split into an
exact integer part + small fraction).

A per-tile [k_min, k_max] window range (computed vectorized by XLA, passed
via scalar prefetch) drives an in-kernel fori_loop, so a tile pays exactly
for the windows its pixels occupy: interior tiles run one window; the rare
horizon tiles (pixel footprint explodes) run as many as they span. There is
NO spill pass — measured on v5e, even an all-sentinel 12M-key lax.sort costs
~147 ms (the "adaptive sort" shortcut does not apply to payload sorts), so
exactness must come from covering every window, not from a sort fallback.

Wide/tall grids run as a python loop of lat-slab pallas_calls (the VMEM
accumulator is bounded per call); out-of-slab pixels carry iy == -1.

Mosaic constraints found the hard way (all verified on v5e):
- dynamic-offset stores (pl.ds with a runtime offset) only compile on the
  LEADING dim of a 3D VMEM ref -> the accumulator layout is
  (rows, channels, lon), not (channels, rows, lon);
- gridded pallas_calls traced under jax x64 fail to compile (index maps
  become i64) -> the call is wrapped in jax.enable_x64(False);
- scalar-prefetch operands are padded to (sublane, lane) multiples in SMEM
  (1 MiB): a (..., 2) bounds array pads its last dim to 128 and overflows
  -> bounds ship as a flat 1D array;
- in-kernel vector reductions feeding pl.when (one VPU->scalar sync per
  tile per window) serialize the pipeline -> predicates/bounds are
  precomputed by XLA and read from SMEM.

Bin indices are computed by the CALLER-side bin_indices (f64-grade
arithmetic identical to the sorted path) — recomputing them in-kernel in
f32 flips edge-straddling pixels into the neighbouring cell. Result is
bit-identical to the sorted path for 'uint8'-contract data (verified on
real 12 MP frames; 26 ms end-to-end vs 142 ms for the packed sort path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from auromat_tpu.ops.regrid import GridSpec, bin_indices, round_up

TILE_H = 16
TILE_W = 128
WIN_R = 16  # grid rows per accumulation window (and acc row alignment)

# per-call VMEM budget for the accumulator slab (v5e VMEM is 128 MiB; this
# leaves ample room for the one-hot temporaries at realistic grid widths)
_SLAB_BYTES = 9 * 1024 * 1024

ELEV_OFFSET = 90.0


def _kernel(bounds_ref, iy_ref, ix_ref, data_ref, acc_ref, *,
            n_ch, n_rows, n_lon_pad):
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    @pl.when((ty == 0) & (tx == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # invalid / out-of-slab / padding pixels carry iy == -1 (no window)
    iy = iy_ref[:]
    ix = ix_ref[:]
    valid = iy >= np.int32(0)
    n_stack = n_ch + 1
    data = data_ref[:]
    d_all = jnp.concatenate(
        [jnp.ones((1, TILE_H, TILE_W), jnp.float32), data], axis=0
    ).astype(jnp.bfloat16)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (WIN_R, TILE_H, TILE_W), 0)
    iota_c = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W, n_lon_pad), 2
    )
    dc_b = jnp.where(valid, ix, np.int32(-1))[:, :, None]
    ex2 = (iota_c == dc_b).astype(jnp.bfloat16).reshape(
        TILE_H * TILE_W, n_lon_pad
    )

    ntx = pl.num_programs(1)
    boff = (ty * ntx + tx) * np.int32(2)
    k_min = bounds_ref[boff]
    k_max = bounds_ref[boff + np.int32(1)]

    def body(k, carry):
        base = k * np.int32(WIN_R)
        dr = iy - base
        in_win = valid & (dr >= np.int32(0)) & (dr < np.int32(WIN_R))
        dr_b = jnp.where(in_win, dr, np.int32(-1))[None, :, :]
        ey = (iota_r == dr_b).astype(jnp.bfloat16)
        # bf16 throughout: one factor of each product is 0/1 and the data
        # channels are bf16-exact by the mode contract, so no rounding
        a = (d_all[:, None, :, :] * ey[None, :, :, :]).reshape(
            n_stack * WIN_R, TILE_H, TILE_W
        )
        # Mosaic requires a single contraction dim -> collapse TH x TW
        a2 = a.reshape(a.shape[0], TILE_H * TILE_W)
        s = jax.lax.dot_general(
            a2, ex2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s.reshape(n_stack, WIN_R, n_lon_pad).transpose(1, 0, 2)
        cur = acc_ref[pl.ds(base, WIN_R)]
        acc_ref[pl.ds(base, WIN_R)] = cur + s
        return carry

    jax.lax.fori_loop(k_min, k_max + np.int32(1), body, np.int32(0))


def _split_elevation(data):
    """Split the last channel (elevation) into bf16-exact parts.

    bf16 has an 8-bit mantissa: integers <= 256 are exact, arbitrary
    fractions are not. Elevation rides as THREE limbs: floor(el + 90), the
    fraction's exact multiple of 2^-8, and the sub-2^-8 remainder (whose
    bf16 rounding is below 2^-16 per sample) — binned means land in the
    f32-accumulation class instead of bf16's 2^-8.
    """
    el = data[..., -1] + ELEV_OFFSET
    hi = jnp.floor(el)
    frac = el - hi
    f1 = jnp.floor(frac * 256.0) * (1.0 / 256.0)
    return jnp.concatenate(
        [data[..., :-1], hi[..., None], f1[..., None], (frac - f1)[..., None]],
        axis=-1,
    )


def _split_full(data):
    """Base-256 digit split of every channel (exact for values in
    [0, 65536); ~1.5x matmul cost)."""
    hi = jnp.floor(data / 256.0)
    rem = data - 256.0 * hi
    mid = jnp.floor(rem)
    return jnp.concatenate([hi, mid, rem - mid], axis=-1)


def _unsplit_full(sums_k, n_ch_in):
    hi = sums_k[..., :n_ch_in]
    mid = sums_k[..., n_ch_in : 2 * n_ch_in]
    frac = sums_k[..., 2 * n_ch_in :]
    return 256.0 * hi + mid + frac


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def bin_partial_pallas(grid: GridSpec, lats, lons, data, mode="uint8",
                       interpret=False):
    """Per-shard partial (count, sums) via the Pallas window kernel.

    :param lats, lons: (h, w) sample coordinates (NaN = masked)
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
    # NaN data at VALID coordinates must contribute 0 (bin_partial contract):
    # a raw NaN would ride the one-hot matmul and poison every bin in its
    # window (NaN * 0 == NaN). bin_mean_pallas_taint layers taint semantics
    # on top via explicit indicator channels.
    data = jnp.where(valid_in[..., None] & ~jnp.isnan(data), data, 0.0)
    if mode == "uint8":
        data_k = _split_elevation(data)
    elif mode == "full":
        data_k = _split_full(data)
    else:
        data_k = data
    n_ch = data_k.shape[-1]

    hp = round_up(h, TILE_H)
    wp = round_up(w, TILE_W)
    pad_spec = ((0, hp - h), (0, wp - w))
    # exact bin indices (same arithmetic as the sorted path)
    flat_full, valid_full = bin_indices(grid, lats, lons)
    iy_full = jnp.where(
        valid_full, (flat_full // grid.n_lon).astype(jnp.int32), -1
    ).reshape(h, w)
    ix_full = jnp.where(
        valid_full, (flat_full % grid.n_lon).astype(jnp.int32), -1
    ).reshape(h, w)
    iyp = jnp.pad(iy_full, pad_spec, constant_values=-1)
    ixp = jnp.pad(ix_full, pad_spec, constant_values=-1)
    datap = jnp.pad(jnp.transpose(data_k, (2, 0, 1)), ((0, 0),) + pad_spec)

    n_lat_pad = max(round_up(grid.n_lat, WIN_R), WIN_R)
    n_lon_pad = round_up(grid.n_lon, 128)
    nty, ntx = hp // TILE_H, wp // TILE_W
    n_stack = n_ch + 1
    slab_rows = max(WIN_R, min(
        n_lat_pad, round_up(_SLAB_BYTES // (n_stack * n_lon_pad * 4), WIN_R)
    ))

    iy_tiles = iyp.reshape(nty, TILE_H, ntx, TILE_W).transpose(0, 2, 1, 3) \
                  .reshape(nty, ntx, -1)
    slabs = []
    for s0 in range(0, n_lat_pad, slab_rows):
        rows = max(min(slab_rows, n_lat_pad - s0), WIN_R)
        n_win = rows // WIN_R
        in_slab = (iy_tiles >= s0) & (iy_tiles < s0 + rows)
        rel_min = jnp.where(in_slab, iy_tiles - s0, 1 << 30)
        rel_max = jnp.where(in_slab, iy_tiles - s0, -1)
        kmin = (jnp.min(rel_min, axis=2) // WIN_R).astype(jnp.int32)
        kmax = (jnp.max(rel_max, axis=2) // WIN_R).astype(jnp.int32)
        none = ~in_slab.any(axis=2)
        kmin = jnp.where(none, 0, jnp.clip(kmin, 0, n_win - 1))
        kmax = jnp.where(none, -1, jnp.clip(kmax, -1, n_win - 1))
        # FLAT bounds: scalar-prefetch SMEM operands are padded to
        # (sublane, lane) multiples — a trailing dim of 2 would pad to 128
        bounds = jnp.stack([kmin, kmax], axis=-1).reshape(-1)
        iy_rel = jnp.where((iyp >= s0) & (iyp < s0 + rows), iyp - s0, -1)
        kern = functools.partial(
            _kernel, n_ch=n_ch, n_rows=rows, n_lon_pad=n_lon_pad
        )
        with jax.enable_x64(False):
            acc = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(nty, ntx),
                    in_specs=[
                        pl.BlockSpec((TILE_H, TILE_W),
                                     lambda ty, tx, bd: (ty, tx)),
                        pl.BlockSpec((TILE_H, TILE_W),
                                     lambda ty, tx, bd: (ty, tx)),
                        pl.BlockSpec((n_ch, TILE_H, TILE_W),
                                     lambda ty, tx, bd: (0, ty, tx)),
                    ],
                    out_specs=pl.BlockSpec(
                        (rows, n_stack, n_lon_pad),
                        lambda ty, tx, bd: (0, 0, 0)
                    ),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (rows, n_stack, n_lon_pad), jnp.float32
                ),
                interpret=interpret,
            )(bounds, iy_rel, ixp, datap)
        slabs.append(acc)
    acc = jnp.concatenate(slabs, axis=0) if len(slabs) > 1 else slabs[0]

    count = acc[: grid.n_lat, 0, : grid.n_lon]
    sums_k = jnp.transpose(acc[: grid.n_lat, 1:, : grid.n_lon], (0, 2, 1))

    if mode == "uint8":
        el_sum = ((sums_k[..., -3] - ELEV_OFFSET * count)
                  + sums_k[..., -2] + sums_k[..., -1])
        sums = jnp.concatenate(
            [sums_k[..., : n_ch_in - 1], el_sum[..., None]], axis=-1
        )
    elif mode == "full":
        sums = _unsplit_full(sums_k, n_ch_in)
    else:
        sums = sums_k
    return count, sums


# ---------------------------------------------------------------------------
# column-windowed kernel (v2): the one-hot Ex is built per 128-wide COLUMN
# window instead of across the whole padded grid width — the dominant VPU
# cost of the v1 kernel (the (TILE_H, TILE_W, n_lon_pad) compare/cast) drops
# by n_lon_pad/128 (5x for the 12 MP bench grid). Mosaic cannot express a
# dynamic-offset store on the LAST dim, so the accumulator linearizes
# (row_window, col_window) onto its LEADING dim: block (k, cw) lives at rows
# [(k*n_win_c + cw)*WIN_R, ...+WIN_R) — a single runtime offset on dim 0 —
# and XLA untangles the layout with one reshape/transpose afterwards.
# ---------------------------------------------------------------------------


def _kernel_cw(bounds_ref, iy_ref, ix_ref, data_ref, acc_ref, *,
               n_ch, n_win_c, tile_h=TILE_H, tile_w=TILE_W, win_r=WIN_R):
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    @pl.when((ty == 0) & (tx == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    iy = iy_ref[:]
    ix = ix_ref[:]
    valid = iy >= np.int32(0)
    n_stack = n_ch + 1
    data = data_ref[:]
    d_all = jnp.concatenate(
        [jnp.ones((1, tile_h, tile_w), jnp.float32), data], axis=0
    ).astype(jnp.bfloat16)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (win_r, tile_h, tile_w), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w, 128), 2)

    ntx = pl.num_programs(1)
    boff = (ty * ntx + tx) * np.int32(4)
    k_min = bounds_ref[boff]
    k_max = bounds_ref[boff + np.int32(1)]
    c_min = bounds_ref[boff + np.int32(2)]
    c_max = bounds_ref[boff + np.int32(3)]

    def cbody(cw, carry):
        dc = ix - cw * np.int32(128)
        in_c = valid & (dc >= np.int32(0)) & (dc < np.int32(128))
        dc_b = jnp.where(in_c, dc, np.int32(-1))[:, :, None]
        ex = (iota_c == dc_b).astype(jnp.bfloat16).reshape(
            tile_h * tile_w, 128
        )

        def kbody(k, inner):
            dr = iy - k * np.int32(win_r)
            in_w = (dr >= np.int32(0)) & (dr < np.int32(win_r))
            dr_b = jnp.where(in_w, dr, np.int32(-1))[None, :, :]
            ey = (iota_r == dr_b).astype(jnp.bfloat16)
            a = (d_all[:, None, :, :] * ey[None, :, :, :]).reshape(
                n_stack * win_r, tile_h * tile_w
            )
            s = jax.lax.dot_general(
                a, ex,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s.reshape(n_stack, win_r, 128).transpose(1, 0, 2)
            base = (k * np.int32(n_win_c) + cw) * np.int32(win_r)
            cur = acc_ref[pl.ds(base, win_r)]
            acc_ref[pl.ds(base, win_r)] = cur + s
            return inner

        jax.lax.fori_loop(k_min, k_max + np.int32(1), kbody, np.int32(0))
        return carry

    jax.lax.fori_loop(c_min, c_max + np.int32(1), cbody, np.int32(0))


def _tile_minmax(vals, valid, lim):
    """Per-tile (min, max) of vals where valid, clipped window indices."""
    big = jnp.int32(1 << 30)
    vmin = jnp.min(jnp.where(valid, vals, big), axis=2)
    vmax = jnp.max(jnp.where(valid, vals, -1), axis=2)
    none = ~valid.any(axis=2)
    vmin = jnp.where(none, 0, jnp.clip(vmin, 0, lim - 1))
    vmax = jnp.where(none, -1, jnp.clip(vmax, -1, lim - 1))
    return vmin, vmax


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def bin_partial_pallas_cw(grid: GridSpec, iyix, data_k, n_ch_in,
                          unsplit_mode="uint8", interpret=False,
                          tiles=(TILE_H, TILE_W, WIN_R)):
    """Column-windowed Pallas binning from precomputed bin indices.

    Lower-level entry: takes int32 (iy, ix) row/col bin indices (−1 =
    invalid) of shape (h, w) and kernel-ready channel data ``data_k``
    (h, w, n_ch) whose channels are bf16-exact (see bin_partial_pallas
    modes); applies the inverse channel split per ``unsplit_mode``.

    :returns: (count (n_lat, n_lon), sums (n_lat, n_lon, n_ch_in))
    """
    iy_full, ix_full = iyix
    tile_h, tile_w, win_r = tiles
    h, w = iy_full.shape
    n_ch = data_k.shape[-1]
    n_stack = n_ch + 1

    hp = round_up(h, tile_h)
    wp = round_up(w, tile_w)
    pad_spec = ((0, hp - h), (0, wp - w))
    iyp = jnp.pad(iy_full, pad_spec, constant_values=-1)
    ixp = jnp.pad(ix_full, pad_spec, constant_values=-1)
    datap = jnp.pad(jnp.transpose(data_k, (2, 0, 1)), ((0, 0),) + pad_spec)

    n_lat_pad = max(round_up(grid.n_lat, win_r), win_r)
    n_lon_pad = round_up(grid.n_lon, 128)
    n_win_c = n_lon_pad // 128
    nty, ntx = hp // tile_h, wp // tile_w

    def tiled(a):
        return a.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3) \
                .reshape(nty, ntx, -1)

    iy_tiles = tiled(iyp)
    ix_tiles = tiled(ixp)
    valid_t = iy_tiles >= 0

    # row-window slabs bound the VMEM accumulator as in v1
    slab_rows = max(win_r, min(
        n_lat_pad,
        round_up(_SLAB_BYTES // (n_stack * n_lon_pad * 4), win_r),
    ))
    cmin, cmax = _tile_minmax(ix_tiles // 128, valid_t, n_win_c)
    slabs = []
    for s0 in range(0, n_lat_pad, slab_rows):
        rows = max(min(slab_rows, n_lat_pad - s0), win_r)
        n_win_r = rows // win_r
        in_slab = valid_t & (iy_tiles >= s0) & (iy_tiles < s0 + rows)
        kmin, kmax = _tile_minmax((iy_tiles - s0) // win_r, in_slab, n_win_r)
        bounds = jnp.stack([kmin, kmax, cmin, cmax], axis=-1).reshape(-1)
        iy_rel = jnp.where((iyp >= s0) & (iyp < s0 + rows), iyp - s0, -1)
        kern = functools.partial(_kernel_cw, n_ch=n_ch, n_win_c=n_win_c,
                                 tile_h=tile_h, tile_w=tile_w, win_r=win_r)
        with jax.enable_x64(False):
            acc = pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(nty, ntx),
                    in_specs=[
                        pl.BlockSpec((tile_h, tile_w),
                                     lambda ty, tx, bd: (ty, tx)),
                        pl.BlockSpec((tile_h, tile_w),
                                     lambda ty, tx, bd: (ty, tx)),
                        pl.BlockSpec((n_ch, tile_h, tile_w),
                                     lambda ty, tx, bd: (0, ty, tx)),
                    ],
                    out_specs=pl.BlockSpec(
                        (n_win_r * n_win_c * win_r, n_stack, 128),
                        lambda ty, tx, bd: (0, 0, 0)
                    ),
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (n_win_r * n_win_c * win_r, n_stack, 128), jnp.float32
                ),
                interpret=interpret,
            )(bounds, iy_rel, ixp, datap)
        # (k, cw, r, ch, 128) -> (rows, ch, n_lon_pad)
        acc = acc.reshape(n_win_r, n_win_c, win_r, n_stack, 128) \
                 .transpose(0, 2, 3, 1, 4).reshape(rows, n_stack, n_lon_pad)
        slabs.append(acc)
    acc = jnp.concatenate(slabs, axis=0) if len(slabs) > 1 else slabs[0]

    count = acc[: grid.n_lat, 0, : grid.n_lon]
    sums_k = jnp.transpose(acc[: grid.n_lat, 1:, : grid.n_lon], (0, 2, 1))

    if unsplit_mode == "uint8":
        el_sum = ((sums_k[..., -3] - ELEV_OFFSET * count)
                  + sums_k[..., -2] + sums_k[..., -1])
        sums = jnp.concatenate(
            [sums_k[..., : n_ch_in - 1], el_sum[..., None]], axis=-1
        )
    elif unsplit_mode == "full":
        sums = _unsplit_full(sums_k, n_ch_in)
    else:
        sums = sums_k
    return count, sums


def bin_partial_pallas2(grid: GridSpec, lats, lons, data, mode="uint8",
                        interpret=False, tiles=(TILE_H, TILE_W, WIN_R)):
    """bin_partial_pallas via the column-windowed v2 kernel (same contract)."""
    h, w = lats.shape
    n_ch_in = data.shape[-1]
    data = data.astype(jnp.float32)
    valid_in = jnp.isfinite(lats) & jnp.isfinite(lons)
    # NaN data at VALID coordinates must contribute 0 (bin_partial contract):
    # a raw NaN would ride the one-hot matmul and poison every bin in its
    # window (NaN * 0 == NaN). bin_mean_pallas_taint layers taint semantics
    # on top via explicit indicator channels.
    data = jnp.where(valid_in[..., None] & ~jnp.isnan(data), data, 0.0)
    if mode == "uint8":
        data_k = _split_elevation(data)
    elif mode == "full":
        data_k = _split_full(data)
    else:
        data_k = data
    flat_full, valid_full = bin_indices(grid, lats, lons)
    iy = jnp.where(
        valid_full, (flat_full // grid.n_lon).astype(jnp.int32), -1
    ).reshape(h, w)
    ix = jnp.where(
        valid_full, (flat_full % grid.n_lon).astype(jnp.int32), -1
    ).reshape(h, w)
    return bin_partial_pallas_cw(grid, (iy, ix), data_k, n_ch_in, mode,
                                 interpret, tiles)


def bin_mean_pallas(grid: GridSpec, lats, lons, data, mode="uint8",
                    interpret=False):
    """Mean binning via the Pallas kernel; NaN where empty."""
    count, sums = bin_partial_pallas2(grid, lats, lons, data, mode,
                                      interpret)
    means = jnp.where(count[..., None] > 0, sums / count[..., None], jnp.nan)
    return count, means


def bin_mean_pallas_taint(grid: GridSpec, lats, lons, data, interpret=False):
    """bin_mean with the reference's NaN-data semantics via the Pallas kernel.

    The reference bins img+elevation channels that may be NaN at VALID
    coordinates (mask-filled pixels); a NaN sample taints its bin's mean in
    that channel (numpy histogram2d semantics). NaN cannot ride the one-hot
    matmul (NaN * 0 == NaN smears across the window), so NaNs are zeroed and
    per-channel 0/1 taint indicator channels are binned alongside; tainted
    (bin, channel) means are NaN'd afterwards.

    Channel contract: same as bin_partial_pallas mode='uint8' — leading
    channels are 0..255 integers (imagery), the LAST is elevation (any
    float). Taint indicators are 0/1 and ride as extra integer channels.
    """
    n = data.shape[-1]
    nan = jnp.isnan(data)
    dataz = jnp.where(nan, 0.0, data.astype(jnp.float32))
    taints = nan.astype(jnp.float32)
    chans = jnp.concatenate([dataz[..., : n - 1], taints, dataz[..., n - 1:]],
                            axis=-1)
    count, sums = bin_partial_pallas2(grid, lats, lons, chans, "uint8",
                                      interpret)
    sums_data = jnp.concatenate([sums[..., : n - 1], sums[..., -1:]], axis=-1)
    taint_counts = sums[..., n - 1 : 2 * n - 1]
    means = jnp.where(count[..., None] > 0, sums_data / count[..., None],
                      jnp.nan)
    means = jnp.where(taint_counts > 0, jnp.nan, means)
    return count, means
