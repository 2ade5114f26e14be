"""BEV dataloader factory (`kitti_dataloader.py:22-75` equivalent).

Builds the legacy Complex-YOLO training stream: filtered sample ids ->
(mosaic-composed) BEV maps + YOLO targets, with the reference's
augmentation stack (lidar OneOf(rotation, scaling) before
rasterization, image Compose(hflip, cutout) after) and optional
multiscale resizing. Distribution across hosts uses
``parallel.mesh.process_shard`` — the working replacement for the
reference's never-enabled DistributedSampler
(kitti_dataloader.py:41-42).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import PointBatch
from ..io.kitti import KittiPaths
from . import augment as A
from .config import BevConfig
from .dataset import (
    filter_valid_samples,
    lidar_labels_for_sample,
    load_bev_sample,
    mosaic4,
    multiscale_size,
    resize_batch,
)
from .features import make_bev_feature
from .targets import build_yolo_target


@dataclasses.dataclass(frozen=True)
class BevLoaderConfig:
    """Flag surface of `config/train_config.py:13-90`, minus torch-isms
    (workers/pin_memory are subsumed by the native prefetch loader)."""

    batch_size: int = 4
    mosaic: bool = False
    random_padding: bool = False
    multiscale: bool = False
    img_size: int = 608
    hflip_prob: float = 0.5
    cutout_prob: float = 0.0
    cutout_nholes: int = 1
    cutout_ratio: float = 0.3
    cutout_fill_value: float = 0.0
    lidar_aug_prob: float = 0.66
    num_samples: int = 0  # 0 = all
    target_capacity: int = 50
    seed: int = 0


def create_bev_loader(
    paths: KittiPaths,
    mode: str = "train",
    cfg: BevLoaderConfig = BevLoaderConfig(),
    bev_cfg: BevConfig = BevConfig(),
    shard_across_processes: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches {'bev' [B, S, S, 3], 'targets' [B, K, 7],
    'valid' [B, K]} for the requested split.

    train: filtered ids, shuffled, lidar + image augmentation, optional
    mosaic/multiscale (create_train_dataloader, kitti_dataloader.py:22-47).
    val/test: unfiltered, in order, no augmentation
    (kitti_dataloader.py:50-75).
    """
    ids: List[int] = paths.sample_ids(mode if mode != "test" else "val") \
        if _has_split(paths, mode) else _ids_from_dir(paths)
    if mode == "train":
        ids = filter_valid_samples(paths, ids, bev_cfg.boundary)
    if cfg.num_samples:
        ids = ids[: cfg.num_samples]
    if shard_across_processes:
        from ..parallel.mesh import process_shard

        ids = process_shard(ids)

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.key(cfg.seed)
    if mode == "train":
        rng.shuffle(ids)

    aug = mode == "train"
    batch_index = 0
    for start in range(0, len(ids), cfg.batch_size):
        sel = ids[start : start + cfg.batch_size]
        if len(sel) < cfg.batch_size and mode == "train":
            break  # drop_last semantics for training
        bevs, targets, valids = [], [], []
        for sid in sel:
            if aug:
                sample = _load_augmented(paths, sid, cfg, bev_cfg, rng, key)
                key = jax.random.split(key, 1)[0]
            else:
                sample = load_bev_sample(paths, sid, bev_cfg, cfg.target_capacity)
            if aug and cfg.mosaic:
                others = [
                    _load_augmented(
                        paths, int(rng.integers(0, len(ids))), cfg, bev_cfg,
                        rng, key,
                    )
                    for _ in range(3)
                ]
                key = jax.random.split(key, 1)[0]
                sample = mosaic4(
                    [sample] + others, cfg.img_size, rng, cfg.random_padding
                )
                # targets are concatenated to 4x capacity; trim/pad back
                sample = _repack_targets(sample, cfg.target_capacity * 4)
            bevs.append(sample["bev"])
            targets.append(sample["targets"])
            valids.append(sample["valid"])
        batch = {
            "bev": np.stack(bevs).astype(np.float32),
            "targets": np.stack(targets).astype(np.float32),
            "valid": np.stack(valids),
        }
        if aug:
            key, k1, k2 = jax.random.split(key, 3)
            img = jnp.asarray(batch["bev"])
            tgt = jnp.asarray(batch["targets"])
            img, tgt = A.horizontal_flip(k1, img, tgt, p=cfg.hflip_prob)
            if cfg.cutout_prob > 0:
                vb = []
                ib = []
                for bi in range(img.shape[0]):
                    key, kc = jax.random.split(key)
                    im2, v2 = A.cutout(
                        kc, img[bi], tgt[bi], jnp.asarray(batch["valid"][bi]),
                        cfg.cutout_nholes, cfg.cutout_ratio,
                        cfg.cutout_fill_value, cfg.cutout_prob,
                    )
                    ib.append(im2)
                    vb.append(v2)
                img = jnp.stack(ib)
                batch["valid"] = np.asarray(jnp.stack(vb))
            batch["bev"] = np.asarray(img)
            batch["targets"] = np.asarray(tgt)
        if aug and cfg.multiscale:
            size = multiscale_size(batch_index, rng, cfg.img_size)
            if size != batch["bev"].shape[1]:
                batch["bev"] = np.asarray(
                    resize_batch(jnp.asarray(batch["bev"]), size)
                )
        batch_index += 1
        yield batch


def _has_split(paths: KittiPaths, mode: str) -> bool:
    import os

    m = mode if mode != "test" else "val"
    return os.path.exists(paths.imageset_file(m))


def _ids_from_dir(paths: KittiPaths) -> List[int]:
    import os
    from glob import glob

    return sorted(
        int(os.path.basename(p)[:-4])
        for p in glob(os.path.join(paths.lidar_dir, "*.bin"))
    )


def _load_augmented(paths, sid, cfg, bev_cfg, rng, key):
    """Lidar-space OneOf(rotation, scaling) then rasterize
    (kitti_dataloader.py:25-28 + load_img_with_targets order)."""
    scan = np.fromfile(paths.lidar(sid), dtype=np.float32).reshape(-1, 4)
    lab32, _ = lidar_labels_for_sample(paths, sid)
    if len(lab32) and rng.random() <= cfg.lidar_aug_prob:
        lidar = jnp.asarray(scan)
        labels7 = jnp.asarray(lab32[:, 1:])
        key, kc, kt = jax.random.split(key, 3)
        if rng.integers(0, 2) == 0:
            lidar, labels7 = A.random_rotation(kt, lidar, labels7, p=1.0)
        else:
            lidar, labels7 = A.random_scaling(kt, lidar, labels7, p=1.0)
        scan = np.asarray(lidar)
        lab32 = np.concatenate(
            [lab32[:, :1], np.asarray(labels7, np.float32)], axis=1
        )
    pb = PointBatch.from_numpy(scan, bev_cfg.max_points)
    bev = np.asarray(make_bev_feature(pb, bev_cfg))
    t, v = build_yolo_target(
        jnp.asarray(lab32), bev_cfg.boundary, capacity=cfg.target_capacity
    )
    return {"bev": bev, "targets": np.asarray(t), "valid": np.asarray(v)}


def _repack_targets(sample: Dict[str, np.ndarray], capacity: int):
    t = sample["targets"]
    v = sample["valid"]
    if len(t) < capacity:
        pad = capacity - len(t)
        t = np.concatenate([t, np.zeros((pad, 7), np.float32)])
        v = np.concatenate([v, np.zeros((pad,), bool)])
    return {"bev": sample["bev"], "targets": t[:capacity], "valid": v[:capacity]}
