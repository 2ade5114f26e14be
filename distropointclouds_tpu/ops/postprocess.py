"""Detection post-processing: peak NMS, connected components, thresholds.

TPU-native equivalents of the reference's three inference paths:
- ``extract_peaks``: max-pool NMS + threshold + top-k
  (`train_sc_ped.py:291-309`) — a ``reduce_window`` max, an equality
  mask, and one ``top_k``; fully jittable with fixed output capacity.
- ``connected_components`` + ``components_to_detections``: replaces
  `scipy.ndimage.label` + per-component centroid loops
  (`tiny_sc_ped.py:196-215`). Labeling is iterative min-label
  propagation (4-connectivity, like ndimage's default structure)
  accelerated with pointer jumping, so convergence is
  O(log(diameter)) sweeps; component statistics are extracted with the
  same sort-based, scatter-free reduction used by the descriptor
  kernel.
- ``banded_threshold``: ring-banded probability thresholds
  (`tiny_sc_pred_v2.py:339-349,697-700`).

Everything returns fixed-capacity :class:`Detections` so the whole
scan -> descriptor -> CNN -> detections program stays one XLA
compilation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import DetectorConfig
from ..core.types import Detections


def peak_nms_mask(
    heat: jnp.ndarray, kernel: int = 7, threshold: float = 0.4
) -> jnp.ndarray:
    """Boolean local-maximum mask: heat == maxpool(heat, k) and >= thr
    (train_sc_ped.py:298-300). heat: [..., H, W]."""
    pooled = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (heat.ndim - 2) + (kernel, kernel),
        window_strides=(1,) * heat.ndim,
        padding=[(0, 0)] * (heat.ndim - 2) + [(kernel // 2, kernel // 2)] * 2,
    )
    return (heat == pooled) & (heat >= threshold)


def extract_peaks(
    heat: jnp.ndarray,
    cfg: DetectorConfig = DetectorConfig(),
    threshold: float | None = None,
) -> Detections:
    """Top-k local maxima of a heatmap as fixed-capacity detections.

    Matches `train_sc_ped.py:291-309`: NMS kernel ``cfg.peak_nms_kernel``,
    threshold (default ``cfg.peak_threshold``), capacity
    ``cfg.peak_topk``, scores sorted descending.
    """
    thr = cfg.peak_threshold if threshold is None else threshold
    H, W = heat.shape[-2:]
    from .pallas_kernels import peak_nms_mask_fast

    keep = peak_nms_mask_fast(heat, cfg.peak_nms_kernel, thr)
    scores = jnp.where(keep, heat, -jnp.inf).reshape(heat.shape[:-2] + (H * W,))
    k = min(cfg.peak_topk, H * W)
    top, idx = jax.lax.top_k(scores, k)
    valid = jnp.isfinite(top)
    ring = (idx // W).astype(jnp.float32)
    sector = (idx % W).astype(jnp.float32)
    return Detections(
        ring=jnp.where(valid, ring, 0.0),
        sector=jnp.where(valid, sector, 0.0),
        score=jnp.where(valid, top, 0.0),
        valid=valid,
    )


def connected_components(
    mask: jnp.ndarray, max_iters: int | None = None, sweeps_per_check: int = 8
) -> jnp.ndarray:
    """Label 4-connected components of a boolean [H, W] mask.

    Returns int32 [H, W]: for foreground pixels, the flat index of the
    component's minimum pixel (a stable component id); background = -1.

    Pure 4-neighbor min sweeps (vector shifts + minimum — entirely VPU
    work) run in blocks of ``sweeps_per_check`` between fixpoint tests.
    Convergence takes exactly the component diameter in sweeps; a sweep
    over the whole grid costs <1 us/scan on a TPU, so even hundreds of
    sweeps beat one gather-based "pointer jump" per iteration (measured
    100x slower on TPU — gathers serialize; see probe in the r1 notes).
    ``max_iters`` bounds total sweeps (None = H*W, i.e. always to
    fixpoint — percolating clusters can have geodesic diameters far
    beyond their bounding box; detection pipelines pass a small bound
    via DetectorConfig.cc_max_iters since real blobs are tiny).
    """
    H, W = mask.shape
    if max_iters is None:
        max_iters = H * W
    INF = jnp.int32(H * W)
    flat = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    label = jnp.where(mask, flat, INF)
    big = jnp.full_like(label, INF)

    def sweep(lab):
        up = jnp.concatenate([lab[1:], big[:1]], axis=0)
        down = jnp.concatenate([big[:1], lab[:-1]], axis=0)
        left = jnp.concatenate([lab[:, 1:], big[:, :1]], axis=1)
        right = jnp.concatenate([big[:, :1], lab[:, :-1]], axis=1)
        m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(mask, jnp.minimum(lab, m), INF)

    def cond(state):
        i, lab, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, lab, _ = state
        new = lab
        for _ in range(sweeps_per_check):
            new = sweep(new)
        return i + sweeps_per_check, new, jnp.any(new != lab)

    _, label, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), label, jnp.bool_(True))
    )
    return jnp.where(mask, label, -1)


def components_to_detections(
    mask: jnp.ndarray,
    min_pixels: int = 20,
    capacity: int = 64,
    max_iters: int | None = None,
    stats_impl: str = "auto",
) -> Detections:
    """Connected components -> centroid detections
    (tiny_sc_ped.py:196-215): components smaller than ``min_pixels`` are
    dropped; each detection carries the mean (ring, sector) of its
    pixels and its area as the score. Fixed capacity, sorted by area
    descending.

    Two statistics backends:
    - "onehot" (default for capacity <= 128): pick up to ``capacity``
      component roots, then compute per-component (count, sum_r, sum_s)
      as ONE [capacity, H*W] x [H*W, 3] masked matmul on the MXU —
      far cheaper than sorting when capacity is small. If the mask has
      more components than capacity, the *smallest-root* components are
      kept (use the sort backend for unbounded component counts).
    - "sort": sort pixels by component id + segmented scan + run ends;
      exact for any number of components.
    """
    H, W = mask.shape
    if stats_impl == "auto":
        stats_impl = "onehot" if capacity <= 128 else "sort"
    label = connected_components(mask, max_iters).reshape(-1)
    if stats_impl == "onehot":
        return _component_stats_onehot(label, mask, min_pixels, capacity, H, W)
    rr = (jnp.arange(H * W, dtype=jnp.float32) // W)
    ss = (jnp.arange(H * W, dtype=jnp.float32) % W)

    key = jnp.where(label >= 0, label, H * W).astype(jnp.int32)
    order_key, s_r, s_s = jax.lax.sort(
        (key, rr, ss), num_keys=1, is_stable=False
    )
    # Segmented inclusive sums within equal-key runs via associative scan.
    ones = jnp.where(order_key < H * W, 1.0, 0.0)

    def combine(a, b):
        ka, ca, ra, sa = a
        kb, cb, rb, sb = b
        same = ka == kb
        return (
            kb,
            jnp.where(same, ca + cb, cb),
            jnp.where(same, ra + rb, rb),
            jnp.where(same, sa + sb, sb),
        )

    _, csum, rsum, ssum = jax.lax.associative_scan(
        combine, (order_key, ones, s_r * ones, s_s * ones)
    )
    nxt = jnp.concatenate([order_key[1:], jnp.full((1,), jnp.int32(-1))])
    run_end = (order_key != nxt) & (order_key < H * W)

    area = jnp.where(run_end, csum, 0.0)
    k = min(capacity, H * W)
    top_area, idx = jax.lax.top_k(area, k)
    valid = top_area >= min_pixels
    cr = rsum[idx] / jnp.maximum(top_area, 1.0)
    cs = ssum[idx] / jnp.maximum(top_area, 1.0)
    return Detections(
        ring=jnp.where(valid, cr, 0.0),
        sector=jnp.where(valid, cs, 0.0),
        score=jnp.where(valid, top_area, 0.0),
        valid=valid,
    )


def _exclusive_rank(flags: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix count of True flags over a flat [N] array,
    N % 128 == 0. Two-level: within-row exclusive cumsum as a matmul
    with a strictly-lower-triangular ones matrix (MXU work), plus row
    offsets — ~5x cheaper than jnp.cumsum's reduce_window lowering at
    this size, and far cheaper than a top_k selection pass."""
    n = flags.shape[0]
    lanes = 128
    rows = n // lanes
    x = flags.astype(jnp.float32).reshape(rows, lanes)
    tri = jnp.tril(jnp.ones((lanes, lanes), jnp.float32), k=-1)
    within = x @ tri.T  # [rows, lanes] exclusive within-row counts
    row_sums = jnp.sum(x, axis=1)
    row_off = jnp.cumsum(row_sums) - row_sums
    return (within + row_off[:, None]).reshape(-1).astype(jnp.int32)


def _component_stats_onehot(
    label: jnp.ndarray,
    mask: jnp.ndarray,
    min_pixels: int,
    capacity: int,
    H: int,
    W: int,
) -> Detections:
    """Component stats via a [capacity, H*W] one-hot matmul (see
    components_to_detections)."""
    flat = jnp.arange(H * W, dtype=jnp.int32)
    is_root = (label == flat) & mask.reshape(-1)
    # Root slot assignment: the k-th root in flat order goes to slot k
    # (== keeping the `capacity` smallest root ids, exactly like the
    # top_k selection this replaces — but a two-level prefix count costs
    # ~20 us/scan where the top_k(64)-of-115200 cost ~176, PERF.md).
    rank = jnp.where(is_root, _exclusive_rank(is_root), capacity)
    slot_hot = (
        rank[None, :] == jnp.arange(capacity, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)  # [capacity, H*W], marks slot k's root pixel
    root_of_slot = (slot_hot @ flat.astype(jnp.float32)[:, None])[:, 0]
    root_valid = jnp.sum(slot_hot, axis=1) > 0
    roots = jnp.where(
        root_valid, root_of_slot.astype(jnp.int32), H * W + 1
    )

    comp = (label[None, :] == roots[:, None]).astype(jnp.float32)
    rr = (flat // W).astype(jnp.float32)
    ss = (flat % W).astype(jnp.float32)
    feats = jnp.stack([jnp.ones_like(rr), rr, ss], axis=-1)  # [H*W, 3]
    stats = comp @ feats  # [capacity, 3] on the MXU
    area = stats[:, 0]
    valid = root_valid & (area >= min_pixels)
    # Order by area descending like the sort backend.
    order = jnp.argsort(jnp.where(valid, -area, jnp.inf))
    area = area[order]
    valid = valid[order]
    cr = stats[:, 1][order] / jnp.maximum(area, 1.0)
    cs = stats[:, 2][order] / jnp.maximum(area, 1.0)
    return Detections(
        ring=jnp.where(valid, cr, 0.0),
        sector=jnp.where(valid, cs, 0.0),
        score=jnp.where(valid, area, 0.0),
        valid=valid,
    )


def banded_threshold(
    probs: jnp.ndarray, cfg: DetectorConfig = DetectorConfig()
) -> jnp.ndarray:
    """Ring-banded binarization (tiny_sc_pred_v2.py:697-700): rings
    < 60 use thr[0], 60..119 thr[1], >= 120 thr[2] (defaults
    0.5 / 0.4 / 0.3). probs: [..., H, W]."""
    H = probs.shape[-2]
    rows = jnp.arange(H)
    thr = jnp.full((H,), cfg.band_thresholds[-1], jnp.float32)
    edges = (0,) + tuple(cfg.band_edges)
    for i, lo in enumerate(edges[:-1]):
        hi = edges[i + 1]
        thr = jnp.where((rows >= lo) & (rows < hi), cfg.band_thresholds[i], thr)
    return probs > thr[:, None]
