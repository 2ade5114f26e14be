"""Voxel-grid downsampling (Open3D ``voxel_down_sample`` equivalent).

The reference calls Open3D's C++ voxel downsample before binning in the
ROS node (`scan_context_node.py:93-100`, 0.20 m) and the v1 generator
(`scaner.py:108-134`). Semantics: voxel index =
``floor((p - min_bound) / voxel)``, output = centroid of the points in
each occupied voxel (order unspecified).

TPU version: the same scatter-free sort recipe as the descriptor — map
points to linear voxel keys (data-dependent values, static shapes),
sort, segmented sum/count scan, take run ends. Output stays fixed-size
[N, 3] with a validity mask marking one centroid per occupied voxel;
downstream consumers are mask-aware so no compaction is needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.types import PointBatch


def voxel_downsample(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    voxel_size: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centroid-per-voxel downsample.

    Args:
      xyz: [N, 3] float32 (padding arbitrary).
      valid: [N] bool.
      voxel_size: edge length in meters.

    Returns:
      (points [N, 3], valid [N]) — exactly one valid centroid per
      occupied voxel; invalid rows are zeros.
    """
    big = jnp.float32(jnp.inf)
    x = jnp.where(valid[:, None], xyz, big)
    min_bound = jnp.min(x, axis=0)  # data-dependent values are fine
    min_bound = jnp.where(jnp.isfinite(min_bound), min_bound, 0.0)

    # int32 keys (jax x64 stays off): fine up to ~1290 voxels per axis
    # (1290^3 < 2^31), i.e. > 250 m extent at 0.2 m voxels.
    idx = jnp.floor(
        (xyz - min_bound) / jnp.float32(voxel_size)
    ).astype(jnp.int32)
    max_bound = jnp.max(jnp.where(valid[:, None], idx, 0), axis=0)
    ny = max_bound[1] + 1
    nz = max_bound[2] + 1
    key = (idx[:, 0] * ny + idx[:, 1]) * nz + idx[:, 2]
    sentinel = jnp.int32(2**31 - 1)
    key = jnp.where(valid, key, sentinel)

    ones = valid.astype(jnp.float32)
    sk, sx, sy, sz, sc = jax.lax.sort(
        (
            key,
            jnp.where(valid, xyz[:, 0], 0.0),
            jnp.where(valid, xyz[:, 1], 0.0),
            jnp.where(valid, xyz[:, 2], 0.0),
            ones,
        ),
        num_keys=1,
        is_stable=False,
    )

    def comb(a, b):
        ka, xa, ya, za, ca = a
        kb, xb, yb, zb, cb = b
        same = ka == kb
        return (
            kb,
            jnp.where(same, xa + xb, xb),
            jnp.where(same, ya + yb, yb),
            jnp.where(same, za + zb, zb),
            jnp.where(same, ca + cb, cb),
        )

    _, cx, cy, cz, cnt = jax.lax.associative_scan(comb, (sk, sx, sy, sz, sc))
    nxt = jnp.concatenate([sk[1:], jnp.full((1,), jnp.int32(-1))])
    run_end = (sk != nxt) & (sk != sentinel)
    denom = jnp.maximum(cnt, 1.0)
    centroids = jnp.stack([cx, cy, cz], axis=-1) / denom[:, None]
    centroids = jnp.where(run_end[:, None], centroids, 0.0)
    return centroids, run_end


def voxel_downsample_batch(points: PointBatch, voxel_size: float) -> PointBatch:
    """PointBatch -> PointBatch (intensity of centroids set to 0, like
    the reference path which drops intensity before downsampling)."""
    xyz = points.xyzi[..., :3]
    valid = points.valid_mask()

    def one(p, v):
        c, m = voxel_downsample(p, v, voxel_size)
        return c, m

    if xyz.ndim == 3:
        c, m = jax.vmap(one)(xyz, valid)
    else:
        c, m = one(xyz, valid)
    xyzi = jnp.concatenate([c, jnp.zeros_like(c[..., :1])], axis=-1)
    # Note: valid centroids are scattered through the buffer, so count
    # alone can't mask them; keep a dense mask via count == -1 sentinel
    # is not possible in PointBatch — instead move centroids to the
    # front with one stable partition (valid first, order preserved).
    order = jnp.argsort(jnp.logical_not(m), axis=-1, stable=True)
    xyzi = jnp.take_along_axis(xyzi, order[..., None], axis=-2)
    count = m.sum(axis=-1).astype(jnp.int32)
    return PointBatch(xyzi=xyzi, count=count)
