"""Scan-context descriptor: polar ring x sector max-height binning.

This is the framework's inner-loop kernel. The reference computes it four
times in slightly different ways (SURVEY §2.2); the variant that produced
the golden fixtures is `scaner_version2.py:64-115` (clamp edge policy,
x/y==0 -> 0.001 substitution, float32 polar math, scatter-max of z,
empty cells -> 0). The ROS-node variant (`scan_context_node.py:102-157`)
filters ``r <= max_length`` instead of clamping. Both are supported via
:class:`~distropointclouds_tpu.core.config.EdgePolicy`.

TPU-native design
-----------------
TPUs have no scatter atomics, and XLA lowers random scatters to slow
sequential updates. Every production path is therefore **scatter-free**;
``impl="auto"`` picks per backend:

- On TPU: the hand-written VMEM bitonic kernel (``impl="bitonic"``,
  ops/bitonic.py) — sort-by-cell + segmented max + log-shift routing in
  one Pallas program, ~1.6x the XLA sort path (docs/PERF.md).
- Elsewhere: ``impl="sort_route"`` — steps 1-3 below, then the
  log-shift routing network instead of a second sort (see
  :func:`compact_run_ends`). The two-sort variant is kept as
  ``impl="sort"``. All implementations are bit-identical.

1. Each point is mapped to a flat cell id ``ring * S + sector``; padded /
   dropped points get a sentinel id beyond the grid.
2. A *marker* element (one per grid cell, carrying the empty-cell fill
   value) is appended, so every cell is guaranteed to own at least one
   element.
3. One lexicographic ``lax.sort`` by ``(cell, z)`` groups each cell's
   elements together with the **maximum z last** in each run.
4. Run ends are located by comparing adjacent cell ids; a second stable
   binary-key sort partitions the run-end elements to the front **in cell
   order** (stability preserves the ascending cell order), so the first
   ``R*S`` values *are* the flattened descriptor.

Everything is dense, vectorized, fully vmappable, and maps onto the
TPU's vector units; no scatter, no gather. A ``jnp`` scatter baseline
(``impl="scatter"``) is kept for cross-checking and benchmarking.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import EdgePolicy, ScanContextConfig
from ..core.types import PointBatch


def polar_bin_indices(
    xyz: jax.Array,
    valid: jax.Array,
    cfg: ScanContextConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Map points to (ring, sector) bins with the configured edge policy.

    Args:
      xyz: [N, 3] float32 points.
      valid: [N] bool, False for padding.
      cfg: descriptor parameters.

    Returns:
      (ring, sector, z, valid): int32 bin indices, the height value to
      bin (with any height offset applied), and the possibly-narrowed
      validity mask (DROP policy removes out-of-range points).

    Follows `scaner_version2.py:74-94` for CLAMP and
    `scan_context_node.py:110-145` for DROP. All polar math is float32 to
    match the reference's (float32 array) // (python float) semantics.
    """
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]

    if cfg.zero_substitution:
        # scaner_version2.py:85-86 — avoid atan2(0, 0).
        x = jnp.where(x == 0, jnp.float32(0.001), x)
        y = jnp.where(y == 0, jnp.float32(0.001), y)

    if not cfg.use_full_height_range:
        z = z + jnp.float32(cfg.height_offset)

    theta = jnp.rad2deg(jnp.arctan2(y, x)) % jnp.float32(360.0)
    r = jnp.sqrt(x * x + y * y)

    gap_ring = jnp.float32(cfg.gap_ring)
    gap_sector = jnp.float32(cfg.gap_sector)

    if cfg.edge_policy == EdgePolicy.CLAMP:
        # scaner_version2.py:93 — out-of-range points clamp into the
        # outermost ring.
        ring_f = r // gap_ring
        # r can overflow to inf on extreme synthetic inputs
        # (sample_data/999999.bin): inf // gap is NaN, whose int cast is
        # undefined in the reference (numpy int32 cast of NaN). Define
        # it as the outermost ring — the natural clamp-policy limit —
        # matching the native C++ path; finite data is unaffected.
        ring_f = jnp.where(jnp.isnan(ring_f), jnp.float32(cfg.num_ring - 1), ring_f)
        ring = jnp.minimum(ring_f, cfg.num_ring - 1).astype(jnp.int32)
        sector = (theta // gap_sector).astype(jnp.int32)
    else:
        # scan_context_node.py:134-145 — reject r > max_length, then
        # floor + clip both indices.
        valid = valid & (r <= jnp.float32(cfg.max_length))
        ring = jnp.floor(r / gap_ring).astype(jnp.int32)
        sector = jnp.floor(theta / gap_sector).astype(jnp.int32)
        ring = jnp.clip(ring, 0, cfg.num_ring - 1)

    # theta < 360 strictly, but float32 rounding can still produce
    # sector == num_sector (quirk register #9 in SURVEY §7); clip always.
    sector = jnp.clip(sector, 0, cfg.num_sector - 1)
    return ring, sector, z, valid


def _finalize(grid: jax.Array, cfg: ScanContextConfig) -> jax.Array:
    if cfg.use_full_height_range:
        # Empty cells (-inf) -> 0 (scaner_version2.py:111-113).
        grid = jnp.where(jnp.isneginf(grid), jnp.float32(0.0), grid)
    return grid.astype(jnp.float32)


def _empty_fill(cfg: ScanContextConfig) -> float:
    # Full-height mode accumulates from -inf then replaces; offset mode
    # accumulates from 0 (scaner_version2.py:96-102).
    return -jnp.inf if cfg.use_full_height_range else 0.0


def scan_context_scatter(
    xyz: jax.Array,
    valid: jax.Array,
    cfg: ScanContextConfig,
) -> jax.Array:
    """Baseline: XLA ``scatter-max`` via ``.at[].max``. Correct everywhere
    but slow on TPU (sequential scatter lowering); kept for verification
    and benchmarking against the sort-based path."""
    ring, sector, z, valid = polar_bin_indices(xyz, valid, cfg)
    neg = jnp.float32(-jnp.inf)
    z = jnp.where(valid, z, neg)
    # Route invalid points out of bounds; mode="drop" discards them.
    ring = jnp.where(valid, ring, cfg.num_ring)
    init = jnp.full(cfg.grid_shape, jnp.float32(_empty_fill(cfg)))
    grid = init.at[ring, sector].max(z, mode="drop")
    return _finalize(grid, cfg)


def scan_context_sorted(
    xyz: jax.Array,
    valid: jax.Array,
    cfg: ScanContextConfig,
) -> jax.Array:
    """Production scatter-free path (see module docstring)."""
    num_cells = cfg.num_ring * cfg.num_sector
    ring, sector, z, valid = polar_bin_indices(xyz, valid, cfg)

    neg = jnp.float32(-jnp.inf)
    cell = ring * cfg.num_sector + sector
    # Padded/dropped points -> sentinel cell beyond every marker.
    cell = jnp.where(valid, cell, num_cells)
    z = jnp.where(valid, z, neg)

    # One marker element per cell carrying the empty fill value. Markers
    # sort to the *front* of their run (fill <= any accepted z), so a run
    # end is a real point whenever one exists.
    marker_cells = jnp.arange(num_cells, dtype=jnp.int32)
    marker_z = jnp.full((num_cells,), jnp.float32(_empty_fill(cfg)))

    all_cells = jnp.concatenate([cell, marker_cells])
    all_z = jnp.concatenate([z, marker_z])

    # Lexicographic sort by (cell asc, z asc): per-cell max lands at the
    # run end.
    s_cells, s_z = jax.lax.sort((all_cells, all_z), num_keys=2)

    # Run ends: cell id changes at the next position (last element is
    # always a run end).
    nxt = jnp.concatenate([s_cells[1:], jnp.full((1,), jnp.int32(-1))])
    run_end = s_cells != nxt

    # Stable partition: run-end elements to the front, preserving their
    # ascending-cell order. The first `num_cells` values are the grid.
    not_end = jnp.logical_not(run_end).astype(jnp.int32)
    _, grid_flat = jax.lax.sort((not_end, s_z), num_keys=1, is_stable=True)
    grid = grid_flat[:num_cells].reshape(cfg.grid_shape)
    return _finalize(grid, cfg)


def compact_run_ends(
    s_cells: jax.Array, s_z: jax.Array, num_cells: int
) -> jax.Array:
    """Route the per-cell maxima of a sorted (cell, z) stream to a dense
    grid WITHOUT a second sort.

    Preconditions: ``s_cells`` ascending along the last axis; every cell
    id in [0, num_cells) occurs at least once (the marker trick);
    sentinel ids >= num_cells pad the tail. The run-end element of cell c
    (its maximum, since z is the ascending tie-break key) must move from
    its position i to destination c. Because cells ascend and every cell
    is present exactly once among run ends, destinations equal ranks, all
    moves are leftward, and displacements ``i - c`` are non-decreasing —
    so a log-shift routing network (LSB->MSB power-of-2 shifts with
    select) delivers every element collision-free. That's
    O(log N) static shifted selects — pure vector work, no sort, no
    scatter, no gather. (Collision-freedom of the LSB->MSB order for
    monotone compaction was verified exhaustively in round 2; MSB->LSB
    provably collides.)

    Replaces the stable binary-key partition sort of
    :func:`scan_context_sorted` step 4 at ~1/6 of the cost on TPU.
    """
    import math

    M = s_cells.shape[-1]
    max_disp = M - num_cells  # worst case: every point in cell 0
    nbits = max(1, math.ceil(math.log2(max_disp + 1)))
    nxt = jnp.concatenate(
        [s_cells[..., 1:], jnp.full_like(s_cells[..., :1], -1)], axis=-1
    )
    keep = (s_cells != nxt) & (s_cells < num_cells)
    iota = jnp.arange(M, dtype=jnp.int32)
    s = jnp.where(keep, iota - s_cells, -1)  # remaining shift; -1 = hole
    v = s_z
    for b in range(nbits):
        step = 1 << b
        src_s = jnp.concatenate(
            [s[..., step:], jnp.full_like(s[..., :step], -1)], axis=-1
        )
        src_v = jnp.concatenate([v[..., step:], v[..., :step]], axis=-1)
        move = (src_s >= 0) & ((src_s & step) != 0)
        stay = (s >= 0) & ((s & step) == 0)
        v = jnp.where(move, src_v, v)
        s = jnp.where(move, src_s - step, jnp.where(stay, s, -1))
    return v[..., :num_cells]


def scan_context_sort_route(
    xyz: jax.Array,
    valid: jax.Array,
    cfg: ScanContextConfig,
) -> jax.Array:
    """One 2-key sort + log-shift routing (no second sort). Bit-identical
    to :func:`scan_context_sorted` — same sorted stream, same run-end
    elements, only the final compaction differs."""
    num_cells = cfg.num_ring * cfg.num_sector
    ring, sector, z, valid = polar_bin_indices(xyz, valid, cfg)

    neg = jnp.float32(-jnp.inf)
    cell = ring * cfg.num_sector + sector
    cell = jnp.where(valid, cell, num_cells)
    z = jnp.where(valid, z, neg)

    marker_cells = jnp.arange(num_cells, dtype=jnp.int32)
    marker_z = jnp.full((num_cells,), jnp.float32(_empty_fill(cfg)))
    all_cells = jnp.concatenate([cell, marker_cells])
    all_z = jnp.concatenate([z, marker_z])

    s_cells, s_z = jax.lax.sort((all_cells, all_z), num_keys=2)
    grid_flat = compact_run_ends(s_cells, s_z, num_cells)
    return _finalize(grid_flat.reshape(cfg.grid_shape), cfg)


def scan_context(
    points: PointBatch | jax.Array,
    cfg: ScanContextConfig = ScanContextConfig(),
    impl: str = "auto",
) -> jax.Array:
    """Compute the scan-context descriptor for one scan or a batch.

    Args:
      points: a :class:`PointBatch` (possibly batched) or a raw
        [N, 3|4] array (treated as fully valid).
      cfg: descriptor configuration (static for jit).
      impl: "auto" (bitonic Pallas kernel on TPU, sort_route elsewhere),
        "bitonic" (VMEM bitonic kernel, ops/bitonic.py), "sort_route"
        (one sort + log-shift routing), "sort" (two sorts), or
        "scatter" (XLA baseline). All bit-identical. "bitonic_packed"
        is the OPT-IN fast backend (single-key sort, z quantized to
        ~2 mm at the golden grid — non-parity; see ops/bitonic.py).
        The packed backend additionally CLIPS z to Z_QUANT_RANGE
        (+-16 m): points outside saturate to the range edge, so its
        quantization-error bound only holds for |z| <= 16 m (fine for
        KITTI, whose z spans ~[-3, 4] m).

    Returns:
      [..., num_ring, num_sector] float32 descriptor grid(s).
    """
    if isinstance(points, PointBatch):
        xyz = points.xyzi[..., :3]
        valid = points.valid_mask()
    else:
        xyz = jnp.asarray(points)[..., :3]
        valid = jnp.ones(xyz.shape[:-1], dtype=bool)

    if cfg.point_stride > 1:
        # Opt-in decimation (non-parity; see ScanContextConfig) —
        # applied uniformly so every impl sees the same points.
        xyz = xyz[..., :: cfg.point_stride, :]
        valid = valid[..., :: cfg.point_stride]

    if impl == "auto":
        impl = "bitonic" if jax.default_backend() == "tpu" else "sort_route"
    if impl in ("bitonic", "bitonic_packed"):
        # Natively batched (the Pallas kernel grids over scans).
        from .bitonic import scan_context_bitonic, scan_context_packed

        kern = (
            scan_context_bitonic if impl == "bitonic" else scan_context_packed
        )
        if xyz.ndim == 2:
            return kern(xyz, valid, cfg)
        batch_shape = xyz.shape[:-2]
        out = kern(
            xyz.reshape((-1,) + xyz.shape[-2:]),
            valid.reshape((-1,) + valid.shape[-1:]),
            cfg,
        )
        return out.reshape(batch_shape + cfg.grid_shape)

    fn = {
        "sort": scan_context_sorted,
        "sort_route": scan_context_sort_route,
        "scatter": scan_context_scatter,
    }[impl]
    if xyz.ndim == 2:
        return fn(xyz, valid, cfg)
    # vmap over leading batch dims.
    batch_shape = xyz.shape[:-2]
    flat_xyz = xyz.reshape((-1,) + xyz.shape[-2:])
    flat_valid = valid.reshape((-1,) + valid.shape[-1:])
    out = jax.vmap(lambda p, v: fn(p, v, cfg))(flat_xyz, flat_valid)
    return out.reshape(batch_shape + cfg.grid_shape)


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def scan_context_jit(
    points: PointBatch,
    cfg: ScanContextConfig = ScanContextConfig(),
    impl: str = "auto",
) -> jax.Array:
    return scan_context(points, cfg, impl)
