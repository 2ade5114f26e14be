"""Point-cloud / BEV-image augmentations (`transformation.py:315-437`),
rebuilt with explicit JAX PRNG keys and static shapes.

The reference composes stateful numpy-RNG callables; here each transform
is a pure function ``(key, data...) -> data...`` and the composition
utilities thread keys. Shapes never change: Cutout *masks* targets
invalid instead of deleting rows, rotation/scaling operate on padded
point buffers.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry.boxes import box_transform, point_transform


def random_rotation(
    key: jax.Array,
    lidar: jnp.ndarray,
    labels: jnp.ndarray,
    limit_angle_deg: float = 20.0,
    p: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate points + boxes about z by U(-limit, limit)
    (Random_Rotation, transformation.py:340-355)."""
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(
        k2,
        (),
        minval=-jnp.deg2rad(limit_angle_deg),
        maxval=jnp.deg2rad(limit_angle_deg),
    )
    apply = jax.random.uniform(k1) <= p
    angle = jnp.where(apply, angle, 0.0)
    xyz = point_transform(lidar[..., :3], 0.0, 0.0, 0.0, rz=angle)
    lidar = jnp.concatenate([xyz, lidar[..., 3:]], axis=-1)
    labels = box_transform(labels, 0.0, 0.0, 0.0, r=angle, coordinate="lidar")
    return lidar, labels


def random_scaling(
    key: jax.Array,
    lidar: jnp.ndarray,
    labels: jnp.ndarray,
    scaling_range: Tuple[float, float] = (0.95, 1.05),
    p: float = 0.5,
    replicate_noop_bug: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale points + box centers/sizes (Random_Scaling,
    transformation.py:358-373).

    The reference samples ``uniform(lo, lo)`` — i.e. the augmentation is
    a deterministic scale by ``lo`` (quirk register #1). Default
    replicates that; set ``replicate_noop_bug=False`` for the obviously
    intended ``uniform(lo, hi)``.
    """
    k1, k2 = jax.random.split(key)
    hi = scaling_range[0] if replicate_noop_bug else scaling_range[1]
    factor = jax.random.uniform(
        k2, (), minval=scaling_range[0], maxval=hi
    ) if hi > scaling_range[0] else jnp.float32(scaling_range[0])
    factor = jnp.where(jax.random.uniform(k1) <= p, factor, 1.0)
    lidar = jnp.concatenate(
        [lidar[..., :3] * factor, lidar[..., 3:]], axis=-1
    )
    labels = jnp.concatenate(
        [labels[..., :6] * factor, labels[..., 6:]], axis=-1
    )
    return lidar, labels


def horizontal_flip(
    key: jax.Array, img: jnp.ndarray, targets: jnp.ndarray, p: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip a BEV image [..., H, W, C] and its YOLO targets
    (Horizontal_Flip, transformation.py:376-386; the reference's targets
    carry a leading box-index column, hence columns 2/6 = x/cos->im...
    here targets are the 7-column rows of bev.targets, so x is column 2
    and the imaginary part column 5)."""
    apply = jax.random.uniform(key) <= p

    flipped = jnp.flip(img, axis=-2)  # W axis in NHWC
    img = jnp.where(apply, flipped, img)
    t = targets
    t = t.at[..., 2].set(jnp.where(apply, 1.0 - t[..., 2], t[..., 2]))
    t = t.at[..., 5].set(jnp.where(apply, -t[..., 5], t[..., 5]))
    return img, t


def cutout(
    key: jax.Array,
    img: jnp.ndarray,
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    n_holes: int = 1,
    ratio: float = 0.3,
    fill_value: float = 0.0,
    p: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Square cutout holes + drop targets whose centers fall inside
    (Cutout, transformation.py:389-437). img: [H, W, C]; targets are
    (K, 7) rows with normalized (y, x) at columns 1, 2; dropped targets
    are masked out of ``target_valid`` (static shapes)."""
    H, W = img.shape[-3], img.shape[-2]
    h_cut, w_cut = int(ratio * H), int(ratio * W)
    kp, key = jax.random.split(key)
    apply = jax.random.uniform(kp) <= p

    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    for _ in range(n_holes):
        key, ky, kx = jax.random.split(key, 3)
        cy = jax.random.randint(ky, (), 0, H)
        cx = jax.random.randint(kx, (), 0, W)
        y1 = jnp.clip(cy - h_cut // 2, 0, H)
        y2 = jnp.clip(cy + h_cut // 2, 0, H)
        x1 = jnp.clip(cx - w_cut // 2, 0, W)
        x2 = jnp.clip(cx + w_cut // 2, 0, W)
        hole = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
        hole = hole & apply
        img = jnp.where(hole[..., None], fill_value, img)
        # Reference checks closed interval on pixel centers
        # (transformation.py:432).
        tx = targets[..., 2] * W
        ty = targets[..., 1] * H
        inside = (x1 <= tx) & (tx <= x2) & (y1 <= ty) & (ty <= y2) & apply
        target_valid = target_valid & jnp.logical_not(inside)
    return img, target_valid


def compose(transforms: Sequence[Callable], p: float = 1.0) -> Callable:
    """Compose(transforms, p) (transformation.py:315-324): apply all
    transforms with probability p. Each transform: (key, *data) -> data."""

    def fn(key: jax.Array, *data):
        kp, key = jax.random.split(key)
        apply = jax.random.uniform(kp) <= p

        out = data
        for t in transforms:
            key, kt = jax.random.split(key)
            out = t(kt, *out)
        # Probability gate: keep originals when not applied.
        return jax.tree.map(
            lambda a, b: jnp.where(apply, a, b), out, data
        )

    return fn


def one_of(transforms: Sequence[Callable], p: float = 1.0) -> Callable:
    """OneOf(transforms, p) (transformation.py:327-337): apply exactly
    one randomly-chosen transform with probability p, via lax.switch."""

    def fn(key: jax.Array, *data):
        kp, kc, kt = jax.random.split(key, 3)
        apply = jax.random.uniform(kp) <= p
        choice = jax.random.randint(kc, (), 0, len(transforms))

        branches = [lambda args, t=t: t(kt, *args) for t in transforms]
        out = jax.lax.switch(choice, branches, data)
        return jax.tree.map(lambda a, b: jnp.where(apply, a, b), out, data)

    return fn
