"""Hand-written Pallas TPU kernels for hot post-processing ops.

The descriptor's sort pipeline and the CNN are best served by XLA's
tuned sort and conv emitters (docs/PERF.md records the measurements),
but the small dense grid ops between them are worth fusing by hand:

- :func:`peak_nms_pallas`: the 7x7 max-pool NMS of
  `train_sc_ped.py:291-309` as ONE VMEM-resident kernel. The kxk max is
  decomposed separably (k-tap row max, then k-tap column max) with
  shifted `jnp.maximum` chains on the in-register block — 2k vector ops
  over the grid instead of a k^2 reduce_window, no HBM round-trips
  between the pooling, the equality test, and the threshold.

Falls back to the XLA implementation on non-TPU backends (Pallas TPU
kernels don't run on CPU without interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some non-TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False


def _shift_rows(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """Shift rows by s (positive = down), filling vacated rows."""
    H = x.shape[0]
    if s == 0:
        return x
    pad = jnp.full((abs(s), x.shape[1]), fill, x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[: H - s]], axis=0)
    return jnp.concatenate([x[-s:], pad], axis=0)


def _shift_cols(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    W = x.shape[1]
    if s == 0:
        return x
    pad = jnp.full((x.shape[0], abs(s)), fill, x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[:, : W - s]], axis=1)
    return jnp.concatenate([x[:, -s:], pad], axis=1)


def _peak_kernel(heat_ref, out_ref, *, kernel: int, threshold: float):
    h = heat_ref[0]
    neg = jnp.float32(-jnp.inf)
    half = kernel // 2
    # Separable k x k max: rows then columns.
    m = h
    for s in range(1, half + 1):
        m = jnp.maximum(m, _shift_cols(h, s, neg))
        m = jnp.maximum(m, _shift_cols(h, -s, neg))
    m2 = m
    for s in range(1, half + 1):
        m2 = jnp.maximum(m2, _shift_rows(m, s, neg))
        m2 = jnp.maximum(m2, _shift_rows(m, -s, neg))
    out_ref[0] = ((h == m2) & (h >= threshold)).astype(jnp.float32)


def peak_nms_mask_pallas(
    heat: jnp.ndarray, kernel: int = 7, threshold: float = 0.4
) -> jnp.ndarray:
    """[B, H, W] -> [B, H, W] float32 0/1 local-max mask, one fused
    Pallas kernel per batch element (grid over B, block = full plane in
    VMEM: 160 x 720 f32 = 450 KB)."""
    B, H, W = heat.shape
    return pl.pallas_call(
        functools.partial(_peak_kernel, kernel=kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W),
                lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM if _HAVE_PLTPU else None,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, H, W),
            lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM if _HAVE_PLTPU else None,
        ),
    )(heat)


# ---------------------------------------------------------------------------
# Azimuth-windowed scan-context descriptor
# ---------------------------------------------------------------------------
#
# LiDAR scans store points in laser-firing order, so a chunk of 1024
# consecutive points spans only a few degrees of azimuth. The kernel
# exploits that: a sequential grid walks point chunks, each chunk
# scatter-maxes into a small [R, WIN] sector window via a vectorized
# one-hot max (pure VPU work — no sort, no scatter), and the window
# merges into the full VMEM-resident grid with a circular split write.
# Points outside their chunk's window (disordered inputs) are flagged
# and handled by ONE exact XLA scatter afterwards, guarded by a
# batch-level lax.cond — correctness never depends on input order, only
# throughput does. (docs/PERF.md "azimuth-window" design.)

WIN = 8  # window width in sectors (~4 deg at 720 sectors)
CHUNK = 1024


GRID_PAD_S = 128  # extra lanes so windows never wrap inside the kernel


def _place_window(window: jnp.ndarray, offset: jnp.ndarray, width: int):
    """Place the (R, WIN) window at a traced lane offset in [0, width-WIN]
    of a zeroed/-inf (R, width) buffer, via 8 binary static rolls
    (Mosaic has no dynamic lane shifts). Content never wraps because
    offset + WIN <= width."""
    R = window.shape[0]
    buf = jnp.pad(
        window, ((0, 0), (0, width - window.shape[1])),
        constant_values=-jnp.inf,
    )
    for bit in range(8):  # offsets < 256
        s_amt = 1 << bit
        rolled = jnp.concatenate(
            [buf[:, width - s_amt:], buf[:, : width - s_amt]], axis=1
        )
        buf = jnp.where((offset & s_amt) != 0, rolled, buf)
    return buf


def _windowed_sc_kernel(ring_ref, sector_ref, z_ref, grid_ref, handled_ref,
                        acc_ref, *, num_ring: int, num_sector: int):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    S_ext = num_sector + GRID_PAD_S

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.full((num_ring, S_ext), -jnp.inf, jnp.float32)

    # Chunks are laid out as (8, 128) tiles (TPU native tiling). All
    # intermediates are kept strictly 2-D for Mosaic.
    ring = ring_ref[0, 0]      # (8, 128) int32
    sector = sector_ref[0, 0]
    z = z_ref[0, 0]            # -inf for invalid/padded points

    # Window anchored at the chunk's first point, roughly centered.
    # (scalar read -> splat broadcast, which Mosaic supports; a (1,1)
    # vector broadcast across sublanes+lanes does not lower)
    ws = (sector_ref[0, 0, 0, 0] - WIN // 2) % num_sector
    off = (sector - ws) % num_sector
    in_win = off < WIN
    handled_ref[0, 0] = (in_win | jnp.isneginf(z)).astype(jnp.float32)

    zi = jnp.where(in_win, z, -jnp.inf)
    # One-hot max into the [num_ring, WIN] window: for each sector
    # offset and each of the 8 sublane rows, a (num_ring, 128)
    # ring-equality compare reduces over the row's points.
    ring_rows = jax.lax.broadcasted_iota(jnp.int32, (num_ring, 128), 0)
    cols = []
    for o in range(WIN):
        col = jnp.full((num_ring, 1), -jnp.inf, jnp.float32)
        for srow in range(8):
            m = (off[srow : srow + 1, :] == o) & (
                ring_rows == ring[srow : srow + 1, :]
            )
            zo = jnp.where(m, zi[srow : srow + 1, :], -jnp.inf)
            col = jnp.maximum(col, jnp.max(zo, axis=1, keepdims=True))
        cols.append(col)
    window = jnp.concatenate(cols, axis=1)  # (num_ring, WIN)

    # Merge: window targets sectors [win_start, win_start + WIN) in the
    # EXTENDED grid (width S + 128, so no wrap inside the kernel; the
    # wrapper folds lanes >= S back onto [0, WIN)). Mosaic needs
    # 128-aligned dynamic lane offsets, so the RMW uses a 256-lane
    # aligned region and the window is placed inside it with static
    # rolls.
    # Clamp to a 128-multiple (the multiple_of hint must be TRUE: with
    # S_ext = S + 128 = 848, S_ext - 256 = 592 is NOT a multiple of 128,
    # so clamp to 512; offsets then reach 719 - 512 + WIN = 215 < 256).
    max_block = ((S_ext - 256) // 128) * 128
    block_start = jnp.minimum((ws // 128) * 128, jnp.int32(max_block))
    block_start = pl.multiple_of(block_start, 128)
    offset = ws - block_start  # in [0, 256 - WIN]
    placed = _place_window(window, offset, 256)
    cur = acc_ref[pl.ds(0, num_ring), pl.ds(block_start, 256)]
    acc_ref[pl.ds(0, num_ring), pl.ds(block_start, 256)] = jnp.maximum(
        cur, placed
    )

    # Single output write at the end (the accumulator lives in scratch
    # VMEM across grid steps; revisiting an output block instead costs
    # block-management overhead every step).
    @pl.when(c == n_chunks - 1)
    def _():
        grid_ref[0] = acc_ref[...]


def scan_context_windowed(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    cfg,
    interpret: bool = False,
) -> jnp.ndarray:
    """Azimuth-windowed descriptor: [B, N, 3] points -> [B, R, S] grids.

    Exact for ANY input ordering: in-window points are binned by the
    Pallas kernel; the (normally empty) straggler set goes through one
    XLA scatter-max guarded by a batch-level ``lax.cond`` so the slow
    path costs nothing on ordered data.
    """
    from .scan_context import polar_bin_indices

    squeeze = xyz.ndim == 2
    if squeeze:
        xyz = xyz[None]
        valid = valid[None]
    B, N, _ = xyz.shape
    R, S = cfg.num_ring, cfg.num_sector

    ring, sector, z, valid = polar_bin_indices(xyz, valid, cfg)
    neg = jnp.float32(-jnp.inf)
    z = jnp.where(valid, z, neg)

    pad = (-N) % CHUNK
    if pad:
        ring = jnp.pad(ring, ((0, 0), (0, pad)))
        sector = jnp.pad(sector, ((0, 0), (0, pad)))
        z = jnp.pad(z, ((0, 0), (0, pad)), constant_values=neg)
    n_chunks = (N + pad) // CHUNK
    # (8, 128) tile layout per chunk (TPU-native tiling).
    tiled = lambda a: a.reshape(B, n_chunks, 8, 128)

    grid, handled = pl.pallas_call(
        functools.partial(_windowed_sc_kernel, num_ring=R, num_sector=S),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, S + 128), jnp.float32),
            jax.ShapeDtypeStruct((B, n_chunks, 8, 128), jnp.float32),
        ),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda b, c: (b, c, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, R, S + 128), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda b, c: (b, c, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, S + 128), jnp.float32)
        ] if (_HAVE_PLTPU and not interpret) else [
            pltpu.VMEM((R, S + 128), jnp.float32)
        ],
        interpret=interpret,
    )(tiled(ring), tiled(sector), tiled(z))
    handled = handled.reshape(B, N + pad) > 0.5
    # Fold the extended lanes (sectors S..S+127 == 0..127 mod S) back.
    grid = jnp.concatenate(
        [jnp.maximum(grid[:, :, :128], grid[:, :, S:]), grid[:, :, 128:S]],
        axis=2,
    )

    # Straggler fallback: exact scatter-max of any out-of-window points.
    n_strag = jnp.sum(jnp.logical_not(handled))

    def with_stragglers(g):
        rs = jnp.where(handled, R, ring)  # out-of-bounds -> dropped
        zs = jnp.where(handled, neg, z)
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], rs.shape
        )
        return g.at[bidx, rs, sector].max(zs, mode="drop")

    grid = jax.lax.cond(n_strag > 0, with_stragglers, lambda g: g, grid)

    if cfg.use_full_height_range:
        grid = jnp.where(jnp.isneginf(grid), 0.0, grid)
    else:
        # Offset mode accumulates from 0 (scaner_version2.py:100-102).
        grid = jnp.maximum(jnp.where(jnp.isneginf(grid), 0.0, grid), 0.0)
    return grid[0] if squeeze else grid


def peak_nms_mask_fast(
    heat: jnp.ndarray, kernel: int = 7, threshold: float = 0.4
) -> jnp.ndarray:
    """Backend-dispatching NMS mask: Pallas on TPU, separable XLA
    reduce_windows elsewhere. Semantics identical to
    postprocess.peak_nms_mask (torch max_pool2d parity)."""
    squeeze = heat.ndim == 2
    if squeeze:
        heat = heat[None]
    if jax.default_backend() == "tpu" and _HAVE_PLTPU:
        out = peak_nms_mask_pallas(heat, kernel, threshold).astype(bool)
    else:
        # Separable reduce_window (max is separable) — cheaper than the
        # k^2 window.
        pooled = jax.lax.reduce_window(
            heat, -jnp.inf, jax.lax.max,
            (1, 1, kernel), (1, 1, 1),
            [(0, 0), (0, 0), (kernel // 2, kernel // 2)],
        )
        pooled = jax.lax.reduce_window(
            pooled, -jnp.inf, jax.lax.max,
            (1, kernel, 1), (1, 1, 1),
            [(0, 0), (kernel // 2, kernel // 2), (0, 0)],
        )
        out = (heat == pooled) & (heat >= threshold)
    return out[0] if squeeze else out
