"""Hand-written bitonic scatter-max descriptor kernel (Pallas TPU).

XLA's TPU sort streams HBM on every stage (~60-95 ms per 64-scan batch
at descriptor scale, docs/PERF.md round-2 tables). One scan's working
set is only 1 MB — it fits VMEM — so a hand-written bitonic network
that never leaves VMEM removes the HBM traffic entirely:

1. **Bitonic sort by cell id** (z rides along as a passive payload;
   the comparator is a single i32 compare — ties need no tie-break, a
   consistent ``partner < self`` predicate leaves equal keys in place).
   153 compare-exchange stages for 2^17 elements, each a static
   XOR-partner shuffle (lane-block swaps for distances < 128, sublane-
   block swaps above) plus one select per carried array.
2. **Segmented max propagation**: 17 forward stages turn each run's
   suffix... prefix into the running max, so every run END holds the
   per-cell maximum.
3. **Routing to the dense grid**: run-end elements move to slot
   ``cell`` via the same log-shift routing networks as
   :func:`..ops.scan_context.compact_run_ends` — compact left
   (LSB->MSB) to ranks, then expand right (MSB->LSB) to cells. Both
   directions' collision-freedom was verified exhaustively in round 2.

The whole body is pure jnp on (rows, 128) arrays, so the SAME function
runs under Pallas on TPU and as a plain XLA program on CPU for tests.

Replaces: the `lax.sort` + routing of ``scan_context_sort_route``
(reference inner loop `scaner_version2.py:105-108`). Bit-identical
output (verified against the sorted path and the golden fixtures).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = float("-inf")


def _xor_shuffle(x: jnp.ndarray, dist: int) -> jnp.ndarray:
    """Value at flat index (i XOR dist) for a (rows, 128) row-major
    array; dist must be a power of two. Strictly 2-D ops (static
    concats + select) — higher-rank intermediates crash Mosaic layout
    inference (docs/PERF.md war stories)."""
    rows, lanes = x.shape
    if dist < lanes:
        # lane-space: partner lane = lane XOR dist. Elements whose
        # `dist` bit is clear read from lane+dist, the rest from
        # lane-dist; both sides are static shifts.
        left = jnp.concatenate([x[:, dist:], x[:, :dist]], axis=1)
        right = jnp.concatenate([x[:, -dist:], x[:, :-dist]], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        return jnp.where((lane & dist) == 0, left, right)
    dr = dist // lanes
    up = jnp.concatenate([x[dr:], x[:dr]], axis=0)
    down = jnp.concatenate([x[-dr:], x[:-dr]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    return jnp.where((row & dr) == 0, up, down)


def _flat_bit(rows: int, lanes: int, bit: int) -> jnp.ndarray:
    """(rows, lanes) bool: flat index has `bit` set (bit = power of 2)."""
    if bit < lanes:
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        return (lane & bit) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    return (row & (bit // lanes)) != 0


def _bitonic_sort_by_cell(cell: jnp.ndarray, z: jnp.ndarray):
    """Full bitonic sort of (rows, 128) flat arrays by cell ascending;
    z follows as payload. Standard network: for size = 2..N, for
    stride = size/2..1, exchange with partner i^stride toward the
    direction given by bit `size` of i."""
    rows, lanes = cell.shape
    n = rows * lanes
    for ks in range(1, int(math.log2(n)) + 1):
        size = 1 << ks
        asc = (
            jnp.zeros((rows, lanes), bool)
            if size == n
            else _flat_bit(rows, lanes, size)
        )
        # asc True means this element's block sorts DESCENDING
        for js in range(ks - 1, -1, -1):
            stride = 1 << js
            pc = _xor_shuffle(cell, stride)
            pz = _xor_shuffle(z, stride)
            is_upper = _flat_bit(rows, lanes, stride)
            want_max = is_upper ^ asc  # this slot should hold the max
            # NOT jnp.where on booleans — Mosaic can't select i1 vectors
            # (i8->i1 trunci is unsupported); plain logic lowers fine.
            take_partner = (want_max & (pc > cell)) | (
                ~want_max & (pc < cell)
            )
            cell = jnp.where(take_partner, pc, cell)
            z = jnp.where(take_partner, pz, z)
    return cell, z


def _segmented_running_max(cell: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """z[i] <- max z over the prefix of i's run (cells sorted). After
    this, every run end holds its cell's maximum."""
    rows, lanes = cell.shape
    n = rows * lanes
    for js in range(int(math.log2(n))):
        stride = 1 << js
        # value from flat index i - stride (shift right by stride)
        pz = _flat_shift_down(z, stride, NEG)
        pc = _flat_shift_down(cell, stride, -1)
        z = jnp.where(pc == cell, jnp.maximum(z, pz), z)
    return z


def _flat_shift_down(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """out[i] = x[i - s] (s > 0, power of two), fill for i < s.

    Every concat keeps the non-concat dimension full (full-width row
    blocks / full-height lane blocks) — Mosaic rejects narrow-column
    concats ("offset mismatch on non-concat dimension")."""
    rows, lanes = x.shape
    if s < lanes:
        # A[r, l] = x[r, (l - s) mod lanes] (lane rotation, same row)
        a = jnp.concatenate([x[:, lanes - s:], x[:, : lanes - s]], axis=1)
        # B[r] = A[r - 1]; B[0] = fill row
        b = jnp.concatenate(
            [jnp.full((1, lanes), fill, x.dtype), a[:-1]], axis=0
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        return jnp.where(lane >= s, a, b)
    sr = s // lanes
    return jnp.concatenate(
        [jnp.full((sr, lanes), fill, x.dtype), x[:-sr]], axis=0
    )


def _flat_shift_up(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """out[i] = x[i + s] (s > 0, power of two), fill for i >= n - s."""
    rows, lanes = x.shape
    if s < lanes:
        # A[r, l] = x[r, (l + s) mod lanes]
        a = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
        # B[r] = A[r + 1]; B[last] = fill row
        b = jnp.concatenate(
            [a[1:], jnp.full((1, lanes), fill, x.dtype)], axis=0
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        return jnp.where(lane < lanes - s, a, b)
    sr = s // lanes
    return jnp.concatenate(
        [x[sr:], jnp.full((sr, lanes), fill, x.dtype)], axis=0
    )


def _route_to_grid(
    cell: jnp.ndarray, z: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """Move the run-end element of each present cell to flat slot
    ``cell``; absent cells -inf. cell sorted ascending; sentinel ids
    >= num_cells at the tail."""
    rows, lanes = cell.shape
    n = rows * lanes
    nbits = int(math.log2(n))

    nxt = _flat_shift_up(cell, 1, jnp.int32(-1))
    keep = (cell != nxt) & (cell < num_cells)

    # rank = exclusive prefix sum of keep
    inc = keep.astype(jnp.int32)
    run = inc
    for js in range(nbits):
        run = run + _flat_shift_down(run, 1 << js, jnp.int32(0))
    rank = run - inc  # exclusive

    # Phase 1: compact keepers to the front (dest = rank, left moves,
    # LSB->MSB is the collision-free order for non-decreasing
    # displacements).
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    iota_row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    flat = iota_row * lanes + iota_lane
    s = jnp.where(keep, flat - rank, -1)
    v = z
    c = cell
    for js in range(nbits):
        step = 1 << js
        src_s = _flat_shift_up(s, step, jnp.int32(-1))
        src_v = _flat_shift_up(v, step, jnp.float32(0))
        src_c = _flat_shift_up(c, step, jnp.int32(0))
        move = (src_s >= 0) & ((src_s & step) != 0)
        stay = (s >= 0) & ((s & step) == 0)
        v = jnp.where(move, src_v, v)
        c = jnp.where(move, src_c, c)
        s = jnp.where(move, src_s - step, jnp.where(stay, s, -1))

    # Phase 2: expand from rank-position to cell destination (right
    # moves, non-decreasing displacement, MSB->LSB collision-free).
    live = s >= 0  # compacted keepers occupy the prefix
    s = jnp.where(live, c - flat, -1)
    placed_v = v
    for js in range(nbits - 1, -1, -1):
        step = 1 << js
        src_s = _flat_shift_down(s, step, jnp.int32(-1))
        src_v = _flat_shift_down(placed_v, step, jnp.float32(0))
        move = (src_s >= 0) & ((src_s & step) != 0)
        stay = (s >= 0) & ((s & step) == 0)
        placed_v = jnp.where(move, src_v, placed_v)
        s = jnp.where(move, src_s - step, jnp.where(stay, s, -1))

    return jnp.where(s == 0, placed_v, NEG)


def bitonic_descriptor_body(
    cell: jnp.ndarray, z: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """(rows, 128) cell/z -> (rows, 128) flat grid buffer (first
    num_cells slots valid; empty cells -inf). Pure jnp — runs inside
    the Pallas kernel on TPU and directly on CPU for tests."""
    cell, z = _bitonic_sort_by_cell(cell, z)
    z = _segmented_running_max(cell, z)
    return _route_to_grid(cell, z, num_cells)


def _kernel(cell_ref, z_ref, out_ref, *, num_cells: int):
    out_ref[0] = bitonic_descriptor_body(cell_ref[0], z_ref[0], num_cells)


def bitonic_grid_from_bins(
    cell: jnp.ndarray,
    z: jnp.ndarray,
    num_cells: int,
    interpret: bool = False,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """[B, N] (cell, z) -> [B, num_cells] grid values (-inf = empty).

    N must be a power of two and a multiple of 128; invalid/padded
    points must carry cell >= num_cells. ``use_pallas=False`` (default
    on non-TPU backends) runs the identical body as a plain XLA program
    — the Pallas win is VMEM residency, the math is the same.
    """
    B, N = cell.shape
    assert N % 128 == 0 and (N & (N - 1)) == 0, N
    rows = N // 128
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        body = jax.vmap(
            lambda c, v: bitonic_descriptor_body(c, v, num_cells)
        )
        out = body(cell.reshape(B, rows, 128), z.reshape(B, rows, 128))
        return out.reshape(B, N)[:, :num_cells]
    out = pl.pallas_call(
        functools.partial(_kernel, num_cells=num_cells),
        out_shape=jax.ShapeDtypeStruct((B, rows, 128), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(cell.reshape(B, rows, 128), z.reshape(B, rows, 128))
    return out.reshape(B, N)[:, :num_cells]


def scan_context_bitonic(
    xyz: jax.Array,
    valid: jax.Array,
    cfg,
    interpret: bool = False,
) -> jax.Array:
    """Descriptor via the VMEM bitonic kernel. Bit-identical to
    ``scan_context_sorted`` (same binning, same max semantics)."""
    from .scan_context import _finalize, polar_bin_indices

    squeeze = xyz.ndim == 2
    if squeeze:
        xyz = xyz[None]
        valid = valid[None]
    B, N, _ = xyz.shape
    num_cells = cfg.num_ring * cfg.num_sector

    ring, sector, z, valid = polar_bin_indices(xyz, valid, cfg)
    cell = ring * cfg.num_sector + sector
    cell = jnp.where(valid, cell, num_cells)
    z = jnp.where(valid, z, jnp.float32(NEG))

    # pad N to a power of two
    n2 = 1 << max(int(math.ceil(math.log2(max(N, 128)))), 7)
    if n2 < num_cells:
        n2 = 1 << int(math.ceil(math.log2(num_cells)))
    if n2 > N:
        cell = jnp.pad(cell, ((0, 0), (0, n2 - N)), constant_values=num_cells)
        z = jnp.pad(z, ((0, 0), (0, n2 - N)), constant_values=NEG)

    flat = bitonic_grid_from_bins(cell, z, num_cells, interpret=interpret)
    if cfg.use_full_height_range:
        grid = jnp.where(jnp.isneginf(flat), jnp.float32(0.0), flat)
    else:
        # Offset mode accumulates from 0 (scaner_version2.py:100-102):
        # the sorted path's markers floor every cell's max at 0.0, so a
        # cell whose points are all below the offset reports 0, not its
        # negative maximum.
        grid = jnp.maximum(
            jnp.where(jnp.isneginf(flat), jnp.float32(0.0), flat), 0.0
        )
    grid = _finalize(grid.reshape((B,) + cfg.grid_shape), cfg)
    return grid[0] if squeeze else grid


# ---------------------------------------------------------------------------
# Packed single-key fast path (opt-in, non-parity: z is quantized).
#
# The sanctioned contract-relaxed backend (CLAUDE.md: "add fast paths as
# separate opt-in backends"): pack ``cell`` and an order-preserving
# quantized z into ONE i32 key, ``(cell << zbits) | zq``. Then
#
# - the bitonic network sorts a SINGLE array (half the shuffle/select
#   work per compare-exchange stage of the 2-array sort above), and
# - because the key orders lexicographically by (cell, z), each cell
#   run's END already holds the per-cell maximum — the 17-stage
#   segmented-max pass disappears entirely.
#
# Accuracy: z is quantized to ``zbits = 31 - ceil(log2(num_cells + 1))``
# bits over a clip range (default +-16 m). At the golden 160x720 grid
# that is 14 bits -> 2^-9 m (~2 mm) resolution; at the fast 80x360 grid
# 16 bits -> ~0.5 mm. Everything else (binning, edge policies, empty
# handling) is identical to the parity paths; the parity gates stay on
# the default backend (tests/test_scan_context.py pins |delta| <= step/2
# vs the bit-exact sorted path).


def _bitonic_sort_packed(key: jnp.ndarray) -> jnp.ndarray:
    """Single-array bitonic sort ascending of (rows, 128) i32 keys."""
    rows, lanes = key.shape
    n = rows * lanes
    for ks in range(1, int(math.log2(n)) + 1):
        size = 1 << ks
        asc = (
            jnp.zeros((rows, lanes), bool)
            if size == n
            else _flat_bit(rows, lanes, size)
        )
        for js in range(ks - 1, -1, -1):
            stride = 1 << js
            pk = _xor_shuffle(key, stride)
            is_upper = _flat_bit(rows, lanes, stride)
            want_max = is_upper ^ asc
            take = (want_max & (pk > key)) | (~want_max & (pk < key))
            key = jnp.where(take, pk, key)
    return key


def packed_descriptor_body(
    packed: jnp.ndarray,
    num_cells: int,
    zbits: int,
    z_min: float,
    z_step: float,
) -> jnp.ndarray:
    """(rows, 128) packed keys -> (rows, 128) flat grid of dequantized
    per-cell max z (-inf = empty). Pure jnp: runs inside Pallas on TPU
    and as plain XLA elsewhere."""
    packed = _bitonic_sort_packed(packed)
    cell = jax.lax.shift_right_logical(packed, zbits)
    zq = packed & ((1 << zbits) - 1)
    z = jnp.float32(z_min) + zq.astype(jnp.float32) * jnp.float32(z_step)
    # Keys sort lexicographically by (cell, zq), so each run end is the
    # cell maximum already — route it straight to the dense grid.
    return _route_to_grid(cell, z, num_cells)


def _packed_kernel(packed_ref, out_ref, *, num_cells, zbits, z_min, z_step):
    out_ref[0] = packed_descriptor_body(
        packed_ref[0], num_cells, zbits, z_min, z_step
    )


def packed_grid_from_bins(
    packed: jnp.ndarray,
    num_cells: int,
    zbits: int,
    z_min: float,
    z_step: float,
    interpret: bool = False,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """[B, N] packed keys -> [B, num_cells] grid values (-inf = empty).

    N must be a power of two and a multiple of 128; invalid/padded points
    must carry the sentinel key ``num_cells << zbits``.
    """
    B, N = packed.shape
    assert N % 128 == 0 and (N & (N - 1)) == 0, N
    rows = N // 128
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        out = jax.vmap(
            lambda p: packed_descriptor_body(p, num_cells, zbits, z_min, z_step)
        )(packed.reshape(B, rows, 128))
        return out.reshape(B, N)[:, :num_cells]
    out = pl.pallas_call(
        functools.partial(
            _packed_kernel,
            num_cells=num_cells,
            zbits=zbits,
            z_min=z_min,
            z_step=z_step,
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, 128), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, rows, 128), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(packed.reshape(B, rows, 128))
    return out.reshape(B, N)[:, :num_cells]


def packed_zbits(num_cells: int) -> int:
    """z payload bits for a grid size: all i32 bits left after the cell
    id and the sign bit (sentinel num_cells << zbits must stay
    positive)."""
    cell_bits = max(1, math.ceil(math.log2(num_cells + 1)))
    return 31 - cell_bits


Z_QUANT_RANGE = (-16.0, 16.0)  # clip range for quantized z (meters)


def scan_context_packed(
    xyz: jax.Array,
    valid: jax.Array,
    cfg,
    z_range=Z_QUANT_RANGE,
    interpret: bool = False,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Descriptor via the packed single-key bitonic kernel (opt-in fast
    backend, non-parity: |delta z| <= z_step / 2 vs the exact paths)."""
    from .scan_context import _finalize, polar_bin_indices

    squeeze = xyz.ndim == 2
    if squeeze:
        xyz = xyz[None]
        valid = valid[None]
    B, N, _ = xyz.shape
    num_cells = cfg.num_ring * cfg.num_sector
    zbits = packed_zbits(num_cells)
    z_min, z_max = float(z_range[0]), float(z_range[1])
    z_step = (z_max - z_min) / float((1 << zbits) - 1)

    ring, sector, z, valid = polar_bin_indices(xyz, valid, cfg)
    cell = ring * cfg.num_sector + sector
    zq = jnp.clip(
        jnp.round((z - jnp.float32(z_min)) / jnp.float32(z_step)),
        0,
        (1 << zbits) - 1,
    ).astype(jnp.int32)
    sentinel = jnp.int32(num_cells << zbits)
    packed = jnp.where(
        valid, (cell.astype(jnp.int32) << zbits) | zq, sentinel
    )

    n2 = 1 << max(int(math.ceil(math.log2(max(N, 128)))), 7)
    if n2 < num_cells:
        n2 = 1 << int(math.ceil(math.log2(num_cells)))
    if n2 > N:
        # Python-int constant: int(sentinel) on the jax scalar would be
        # a ConcretizationTypeError under jit (this branch only runs
        # when the padded point count is not already a power of two).
        packed = jnp.pad(
            packed, ((0, 0), (0, n2 - N)), constant_values=num_cells << zbits
        )

    flat = packed_grid_from_bins(
        packed, num_cells, zbits, z_min, z_step,
        interpret=interpret, use_pallas=use_pallas,
    )
    if cfg.use_full_height_range:
        grid = jnp.where(jnp.isneginf(flat), jnp.float32(0.0), flat)
    else:
        grid = jnp.maximum(
            jnp.where(jnp.isneginf(flat), jnp.float32(0.0), flat), 0.0
        )
    grid = _finalize(grid.reshape((B,) + cfg.grid_shape), cfg)
    return grid[0] if squeeze else grid
