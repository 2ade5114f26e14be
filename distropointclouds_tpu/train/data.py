"""Host-side data pipeline for descriptor-space training.

The reference has three near-identical torch ``Dataset`` classes reading
``sc_*.npy`` + ``pedestrians_*.json`` pairs with worker processes
(`tiny_sc_ped.py:106-129`, `train_sc_ped.py:135-211`,
`tiny_sc_pred_v2.py:17-99`). The TPU-native replacement:

- The whole dataset is materialized ONCE into dense numpy arrays
  (descriptors + fixed-capacity padded pedestrian arrays). At the
  reference's scale (7481 KITTI frames x 160 x 720 f32 = 3.2 GB) this
  fits host RAM; epochs are then pure array indexing — no worker
  processes, no file IO in the loop, no per-sample Python.
- Target building (masks, heatmaps, weight maps) and augmentation
  (sector roll, ring jitter, mask dropout) are **jittable device
  functions** over those arrays (`build_targets``), so they fuse into
  the train step and run on TPU, not the host.
- Batches are delivered with a double-buffered device_put so host slice
  i+1 overlaps device step i (the TPU analog of pinned-memory prefetch).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from glob import glob
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ScanContextConfig, TrainConfig
from ..labels.covered_cells import covered_cells_mask
from ..labels.heatmap import adaptive_weight_map, center_heatmap
from ..models.layers import normalize_clip, normalize_minmax

PED_CAPACITY = 32
# Padded per-pedestrian covered_cells capacity: the golden JSONs top out
# at 120 cells/ped (closest pedestrians); 192 leaves headroom for
# synthetic inward radial jitter.
CELL_CAPACITY = 192


@dataclass
class ScanContextArrays:
    """The materialized dataset."""

    sc: np.ndarray  # (N, R, S) f32 raw descriptors
    centers: np.ndarray  # (N, P, 2) f32
    boxes: np.ndarray  # (N, P, 5) f32 [x, y, l, w, yaw]
    distance: np.ndarray  # (N, P) f32
    num_cells: np.ndarray  # (N, P) i32 len(covered_cells)
    ped_valid: np.ndarray  # (N, P) bool
    ids: List[int]
    # (N, P, C, 2) i16 [ring, sector] rows straight from the JSONs —
    # the reference's own source of truth for training masks
    # (tiny_sc_ped.py:62-73 builds masks from covered_cells, not from
    # box geometry). Mask targets use these when present; synthetic
    # augmented samples NEED them (their box fields keep the donor
    # pose, so box-derived masks would not match the pasted pixels).
    cells: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return self.sc.shape[0]

    def to_device(self) -> "ScanContextArrays":
        """Device-resident copy (``TrainConfig.device_cache``): batches
        are then gathered ON the device by `epoch_batches`, so an epoch
        ships only index arrays host->device instead of re-uploading
        ~0.44 MB per sample every epoch. On a tunneled/remote host the
        per-epoch H2D dominates wall time (measured: the KITTI-scale
        dress rehearsal spends ~2.5 s of a 4.2 s epoch on transfer,
        docs/PERF.md); on local-PCIe hosts the win is smaller but the
        HBM cost (0.44 MB/sample — 3.3 GB for the full 7481-frame
        KITTI set) is usually affordable."""
        return ScanContextArrays(
            sc=jnp.asarray(self.sc),
            centers=jnp.asarray(self.centers),
            boxes=jnp.asarray(self.boxes),
            distance=jnp.asarray(self.distance),
            num_cells=jnp.asarray(self.num_cells),
            ped_valid=jnp.asarray(self.ped_valid),
            ids=self.ids,
            cells=None if self.cells is None else jnp.asarray(self.cells),
        )


def load_scan_context_dir(
    sc_dir: str,
    cfg: ScanContextConfig = ScanContextConfig(),
    require_json: bool = False,
    capacity: int = PED_CAPACITY,
) -> ScanContextArrays:
    """Read every ``sc_*.npy`` (+ sibling ``pedestrians_*.json``) into
    dense arrays. ``require_json=True`` skips samples without labels
    (trainer C's filter, tiny_sc_pred_v2.py:26-31); otherwise missing
    JSON means zero pedestrians (trainer A/B semantics)."""
    paths = sorted(glob(os.path.join(sc_dir, "sc_*.npy")))
    if not paths:
        raise FileNotFoundError(f"no sc_*.npy in {sc_dir}")
    scs, ids = [], []
    centers = []
    boxes = []
    distance = []
    num_cells = []
    valid = []
    cells = []
    for p in paths:
        stem = os.path.basename(p)[3:-4]
        jp = os.path.join(os.path.dirname(p), f"pedestrians_{stem}.json")
        has_json = os.path.exists(jp)
        if require_json and not has_json:
            continue
        peds = json.load(open(jp)) if has_json else []
        scs.append(np.load(p).astype(np.float32))
        ids.append(int(stem))
        c = np.zeros((capacity, 2), np.float32)
        b = np.full((capacity, 5), -1.0, np.float32)
        b[:, :2] = 0.0
        b[:, 4] = 0.0
        d = np.zeros((capacity,), np.float32)
        n = np.zeros((capacity,), np.int32)
        v = np.zeros((capacity,), bool)
        cl = np.full((capacity, CELL_CAPACITY, 2), -1, np.int16)
        for i, ped in enumerate(peds[:capacity]):
            c[i] = (ped["center_ring_idx"], ped["center_sector_idx"])
            b[i] = (ped["x"], ped["y"], ped["l"], ped["w"], ped["yaw"])
            d[i] = ped.get("distance", np.hypot(ped["x"], ped["y"]))
            pc = np.asarray(
                ped.get("covered_cells", []), np.int64
            ).reshape(-1, 2)[:CELL_CAPACITY]
            # Cap the stored count at the stored cells (r3 ADVICE): a
            # pedestrian covering > CELL_CAPACITY cells keeps only the
            # first CELL_CAPACITY rows, and the count must match them —
            # _ped_masks_from_cells tests j < num_cells against cl.
            n[i] = min(len(ped.get("covered_cells", [])), CELL_CAPACITY)
            cl[i, : len(pc)] = pc.astype(np.int16)
            v[i] = True
        centers.append(c)
        boxes.append(b)
        distance.append(d)
        num_cells.append(n)
        valid.append(v)
        cells.append(cl)
    return ScanContextArrays(
        sc=np.stack(scs),
        centers=np.stack(centers),
        boxes=np.stack(boxes),
        distance=np.stack(distance),
        num_cells=np.stack(num_cells),
        ped_valid=np.stack(valid),
        ids=ids,
        cells=np.stack(cells),
    )


def split_indices(
    n: int, cfg: TrainConfig, shuffle: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """train/val/test index split.

    With shuffle (trainer B/C: torch random_split / random permutation,
    seed 1337) or sequential (trainer A: first 80% train,
    tiny_sc_ped.py:241-242 — use shuffle=False and test_split=0).
    """
    n_val = int(n * cfg.val_split)
    n_test = int(n * cfg.test_split)
    n_train = n - n_val - n_test
    idx = np.arange(n)
    if shuffle:
        idx = np.random.default_rng(cfg.seed).permutation(n)
    return idx[:n_train], idx[n_train : n_train + n_val], idx[n_train + n_val :]


def build_targets(
    batch: Dict[str, jnp.ndarray],
    cfg: TrainConfig,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Jittable target construction + augmentation for one batch.

    Input keys (device arrays, batch-leading): 'sc', 'centers', 'boxes',
    'distance', 'num_cells', 'ped_valid'.
    Output: 'x' [B,H,W,1], 'target' [B,H,W,1] (+ 'weight' for sc_unet,
    + 'target_mask' when mask_loss_w > 0), augmented per cfg.

    Matches:
    - trainer A: minmax norm, covered-cells mask, roll <= 32, mask
      dropout (tiny_sc_ped.py:115-128)
    - trainer B: clip norm, gaussian heatmap, full-width roll
      (train_sc_ped.py:155-211)
    - trainer C: minmax norm, mask + adaptive weights, no roll
      (tiny_sc_pred_v2.py:38-99)
    """
    sc = batch["sc"]
    B = sc.shape[0]
    # Grid geometry follows the training grid size (height x width) so
    # reduced-resolution runs and tests work; max_length stays the
    # golden default (only the mask's physical scale depends on it).
    sc_cfg = ScanContextConfig(num_ring=cfg.height, num_sector=cfg.width)

    if cfg.normalize == "minmax":
        x = normalize_minmax(sc)
    elif cfg.normalize == "clip":
        x = normalize_clip(sc, cfg.clip_abs_z)
    else:
        x = sc

    out: Dict[str, jnp.ndarray] = {}

    def masks_for(i=None):
        if batch.get("cells") is not None:
            # Reference-faithful path: scatter the JSON covered_cells
            # rows (tiny_sc_ped.py:62-73 semantics). Required for
            # synthetic samples, whose box fields keep the donor pose.
            m = jax.vmap(
                lambda cc, nn: _ped_masks_from_cells(
                    cc, nn, sc_cfg.num_ring, sc_cfg.num_sector
                )
            )(batch["cells"], batch["num_cells"])  # (B, P, R, S)
        else:
            bx = batch["boxes"]
            m = jax.vmap(
                lambda bb: covered_cells_mask(
                    bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3], bb[:, 4], sc_cfg
                )
            )(bx)  # (B, P, R, S)
        m = jnp.where(batch["ped_valid"][..., None, None], m, False)
        return m

    if cfg.model == "tiny_unet":
        target = jax.vmap(
            lambda c, v: center_heatmap(c, v, sc_cfg, sigma=cfg.heat_sigma)
        )(batch["centers"], batch["ped_valid"])
        if cfg.mask_loss_w > 0:
            pm = masks_for()
            out["target_mask"] = jnp.any(pm, axis=1).astype(jnp.float32)[..., None]
    else:
        pm = masks_for()
        target = jnp.any(pm, axis=1).astype(jnp.float32)
        if cfg.model == "sc_unet":
            out["weight"] = jax.vmap(adaptive_weight_map)(
                pm, batch["num_cells"], batch["distance"], batch["ped_valid"]
            )[..., None]

    # Augmentation
    if rng is not None and cfg.roll_aug:
        k1, k2, k3 = jax.random.split(rng, 3)
        if cfg.roll_max > 0:
            shift = jax.random.randint(k1, (B,), -cfg.roll_max, cfg.roll_max + 1)
        else:
            shift = jax.random.randint(k1, (B,), 0, sc.shape[-1])
        roll = jax.vmap(lambda a, s: jnp.roll(a, s, axis=-1))
        x = roll(x, shift)
        target = roll(target, shift)
        if "target_mask" in out:
            out["target_mask"] = roll(out["target_mask"][..., 0], shift)[..., None]
        if "weight" in out:
            out["weight"] = roll(out["weight"][..., 0], shift)[..., None]
        if cfg.ring_jitter:
            rs = jax.random.randint(
                k2, (B,), -cfg.ring_jitter, cfg.ring_jitter + 1
            )
            rollr = jax.vmap(lambda a, s: jnp.roll(a, s, axis=-2))
            x = rollr(x, rs)
            target = rollr(target, rs)
        if cfg.mask_dropout > 0 and cfg.model == "tiny_cnn":
            drop = jax.random.uniform(k3, target.shape) < cfg.mask_dropout
            target = jnp.clip(target - target * drop, 0.0, 1.0)

    out["x"] = x[..., None]
    out["target"] = target[..., None]
    if "sample_weight" in batch:
        out["sample_weight"] = batch["sample_weight"]
    return out


def _ped_masks_from_cells(cells, num_cells, num_ring, num_sector):
    """(P, C, 2) padded [ring, sector] rows -> (P, R, S) bool masks.

    Padding rows (and any cell outside the training grid) scatter with
    ``mode="drop"``; counts beyond the padded capacity were truncated
    at load time, so ``j < num_cells`` is the right validity test."""
    P, C, _ = cells.shape
    cc = cells.astype(jnp.int32)
    validc = jnp.arange(C)[None, :] < num_cells[:, None]  # (P, C)
    rr = jnp.where(validc, cc[..., 0], num_ring)
    ss = jnp.where(validc, cc[..., 1], num_sector)
    pidx = jnp.broadcast_to(jnp.arange(P)[:, None], (P, C))
    return (
        jnp.zeros((P, num_ring, num_sector), bool)
        .at[pidx, rr, ss]
        .set(True, mode="drop")
    )


def epoch_batches(
    data: ScanContextArrays,
    indices: np.ndarray,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    drop_last: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield raw host batches (pre-target-building). The final partial
    batch is padded by repeating its last sample (static shapes) and
    carries 'n_real' with the true count plus 'sample_weight' [B]
    (1 for real samples, 0 for padding) so losses/metrics can mask the
    duplicates (torch drop_last=False exact-mean semantics)."""
    order = rng.permutation(indices) if shuffle else np.asarray(indices)
    n = len(order)
    on_device = isinstance(data.sc, jax.Array)
    for start in range(0, n, batch_size):
        sel = order[start : start + batch_size]
        n_real = len(sel)
        if n_real < batch_size:
            if drop_last:
                return
            sel = np.concatenate([sel, np.repeat(sel[-1:], batch_size - n_real)])
        weight = (np.arange(batch_size) < n_real).astype(np.float32)
        if on_device:
            # Device-resident dataset (to_device): ONE jitted gather per
            # batch — only `sel` (B x i32) crosses the host boundary.
            # `cells` rides the same program (None traces a separate
            # cells-free variant) so the ~1 ms/call host-dispatch floor
            # is paid once per batch, not twice.
            gathered = _gather_batch(
                data.sc, data.centers, data.boxes, data.distance,
                data.num_cells, data.ped_valid, jnp.asarray(sel, jnp.int32),
                data.cells,
            )
        else:
            gathered = {
                "sc": data.sc[sel],
                "centers": data.centers[sel],
                "boxes": data.boxes[sel],
                "distance": data.distance[sel],
                "num_cells": data.num_cells[sel],
                "ped_valid": data.ped_valid[sel],
            }
            if data.cells is not None:
                gathered["cells"] = data.cells[sel]
        yield {
            "sample_weight": weight,
            **gathered,
            "n_real": np.asarray(n_real, np.int32),
        }


@jax.jit
def _gather_batch(sc, centers, boxes, distance, num_cells, ped_valid, sel,
                  cells=None):
    out = {
        "sc": sc[sel],
        "centers": centers[sel],
        "boxes": boxes[sel],
        "distance": distance[sel],
        "num_cells": num_cells[sel],
        "ped_valid": ped_valid[sel],
    }
    if cells is not None:
        out["cells"] = cells[sel]
    return out


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered device_put (the TPU analog of DataLoader
    pin_memory + workers): keeps `size` batches in flight."""
    import collections

    buf = collections.deque()

    def put(b):
        # n_real is consumed on host right after the yield; shipping it
        # to the device would cost a D2H round-trip per batch to read
        # it back (~30 ms each on a tunneled host).
        n_real = b.pop("n_real", None)
        out = jax.device_put(b, sharding) if sharding is not None else jax.device_put(b)
        if n_real is not None:
            out["n_real"] = n_real
        return out

    for item in iterator:
        buf.append(put(item))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
