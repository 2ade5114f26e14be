"""Calibration projections as pure, jittable functions.

The reference wraps these in a stateful ``Calibration`` class with
per-call numpy matmuls (`kitti_data_utils.py:92-261`). Here each
projection is a pure function of (points, matrices) so it vectorizes,
jits, and batches; the parsed matrices live in
:class:`distropointclouds_tpu.io.kitti.CalibrationData`.

Frames (kitti_data_utils.py:92-123):
  velo:  front x, left y, up z          (LiDAR)
  ref:   right x, down y, front z       (reference camera)
  rect:  ref rotated by R0              (rectified camera; labels live here)
  image: pixels via P2
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def mean_calibration():
    """KITTI-train-average calibration (kitti_config.py:42-65) as
    (V2C (3,4), R0 (3,3), P2 (3,4)) jnp arrays — the fallback used when
    no per-frame calib is given (transformation.py:30-42 uses these
    constants via its `cnf` module)."""
    import numpy as np

    V2C = jnp.asarray(
        np.array(
            [
                [7.49916597e-03, -9.99971248e-01, -8.65110297e-04, -6.71807577e-03],
                [1.18652889e-02, 9.54520517e-04, -9.99910318e-01, -7.33152811e-02],
                [9.99882833e-01, 7.49141178e-03, 1.18719929e-02, -2.78557062e-01],
            ]
        )
    )
    R0 = jnp.asarray(
        np.array(
            [
                [0.99992475, 0.00975976, -0.00734152],
                [-0.0097913, 0.99994262, -0.00430371],
                [0.00729911, 0.0043753, 0.99996319],
            ]
        )
    )
    P2 = jnp.asarray(
        np.array(
            [
                [719.787081, 0.0, 608.463003, 44.9538775],
                [0.0, 719.787081, 174.545111, 0.1066855],
                [0.0, 0.0, 1.0, 3.0106472e-03],
            ]
        )
    )
    return V2C, R0, P2


def cart2hom(pts: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) -> (..., N, 4) homogeneous."""
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def inverse_rigid(Tr: jnp.ndarray) -> jnp.ndarray:
    """Invert a (3, 4) rigid [R|t] (kitti_data_utils.py:298-305)."""
    R = Tr[:3, :3]
    t = Tr[:3, 3]
    return jnp.concatenate([R.T, (-R.T @ t)[:, None]], axis=1)


def velo_to_ref(pts: jnp.ndarray, V2C: jnp.ndarray) -> jnp.ndarray:
    return cart2hom(pts) @ V2C.T


def ref_to_velo(pts: jnp.ndarray, V2C: jnp.ndarray) -> jnp.ndarray:
    return cart2hom(pts) @ inverse_rigid(V2C).T


def ref_to_rect(pts: jnp.ndarray, R0: jnp.ndarray) -> jnp.ndarray:
    return pts @ R0.T


def rect_to_ref(pts: jnp.ndarray, R0: jnp.ndarray) -> jnp.ndarray:
    return pts @ jnp.linalg.inv(R0).T


def rect_to_velo(pts: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray) -> jnp.ndarray:
    """Label (rect camera) coords -> LiDAR (kitti_data_utils.py:191-196)."""
    return ref_to_velo(rect_to_ref(pts, R0), V2C)


def velo_to_rect(pts: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray) -> jnp.ndarray:
    return ref_to_rect(velo_to_ref(pts, V2C), R0)


def rect_to_image(pts: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) rect -> (N, 2) pixels (kitti_data_utils.py:205-213)."""
    uvw = cart2hom(pts) @ P.T
    return uvw[..., :2] / uvw[..., 2:3]


def velo_to_image(
    pts: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray, P: jnp.ndarray
) -> jnp.ndarray:
    return rect_to_image(velo_to_rect(pts, V2C, R0), P)


def image_to_rect(uv_depth: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) [u, v, depth] -> (N, 3) rect (kitti_data_utils.py:225-237)."""
    c_u, c_v = P[0, 2], P[1, 2]
    f_u, f_v = P[0, 0], P[1, 1]
    b_x = P[0, 3] / (-f_u)
    b_y = P[1, 3] / (-f_v)
    depth = uv_depth[..., 2]
    x = (uv_depth[..., 0] - c_u) * depth / f_u + b_x
    y = (uv_depth[..., 1] - c_v) * depth / f_v + b_y
    return jnp.stack([x, y, depth], axis=-1)


def image_to_velo(
    uv_depth: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray, P: jnp.ndarray
) -> jnp.ndarray:
    return rect_to_velo(image_to_rect(uv_depth, P), V2C, R0)


def corners3d_to_img_boxes(
    corners3d: jnp.ndarray, P: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 8, 3) rect corners -> ((N, 4) aabb, (N, 8, 2) projected)
    (kitti_data_utils.py:243-261)."""
    uvw = cart2hom(corners3d) @ P.T  # (N, 8, 3)
    xy = uvw[..., :2] / uvw[..., 2:3]
    mins = xy.min(axis=-2)
    maxs = xy.max(axis=-2)
    boxes = jnp.concatenate([mins, maxs], axis=-1)
    return boxes, xy


def lidar_points_in_image_fov(
    pts: jnp.ndarray,
    V2C: jnp.ndarray,
    R0: jnp.ndarray,
    P: jnp.ndarray,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    clip_distance: float = 2.0,
) -> jnp.ndarray:
    """Boolean FOV mask, mirroring `visualization_utils.py:137-148`
    (get_lidar_in_image_fov) but returning a mask instead of ragged
    points (static shapes)."""
    uv = velo_to_image(pts, V2C, R0, P)
    return (
        (uv[..., 0] < xmax)
        & (uv[..., 0] >= xmin)
        & (uv[..., 1] < ymax)
        & (uv[..., 1] >= ymin)
        & (pts[..., 0] > clip_distance)
    )
