"""Box/point coordinate transforms between camera (rect) and LiDAR frames.

Vectorized, jittable equivalents of `distro_model/data_process/
transformation.py:18-312` (which loops per box in Python) plus the
forward-step yaw conversion of `kitti_dataset.py:569-591`. Box layout
follows the reference: ``(N, 7) = [x, y, z, h, w, l, yaw]`` where yaw is
``ry`` (about camera Y) in camera coords and ``rz`` (about LiDAR Z) in
lidar coords, converted via ``rz = -ry - pi/2``
(`transformation.py:83-104`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from . import calib as _calib


def angle_in_limit(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle into [-pi/2, pi/2), snapping near -pi/2 to +pi/2
    (transformation.py:18-27), vectorized."""
    limit = jnp.deg2rad(5.0)
    a = jnp.mod(angle + jnp.pi / 2, jnp.pi) - jnp.pi / 2
    return jnp.where(jnp.abs(a + jnp.pi / 2) < limit, jnp.pi / 2, a)


def camera_to_lidar_points(
    pts: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray
) -> jnp.ndarray:
    """(N, 3) rect-camera -> LiDAR (transformation.py:57-65)."""
    return _calib.rect_to_velo(pts, V2C, R0)


def lidar_to_camera_points(
    pts: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray
) -> jnp.ndarray:
    """(N, 3) LiDAR -> rect-camera (transformation.py:68-80)."""
    return _calib.velo_to_rect(pts, V2C, R0)


def camera_to_lidar_box(
    boxes: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray
) -> jnp.ndarray:
    """(N, 7) camera [x,y,z,h,w,l,ry] -> lidar [x,y,z,h,w,l,rz]
    (transformation.py:83-92), vectorized."""
    xyz = camera_to_lidar_points(boxes[..., :3], V2C, R0)
    rz = -boxes[..., 6:7] - jnp.pi / 2
    return jnp.concatenate([xyz, boxes[..., 3:6], rz], axis=-1)


def lidar_to_camera_box(
    boxes: jnp.ndarray, V2C: jnp.ndarray, R0: jnp.ndarray
) -> jnp.ndarray:
    """(N, 7) lidar -> camera (transformation.py:95-104), vectorized."""
    xyz = lidar_to_camera_points(boxes[..., :3], V2C, R0)
    ry = -boxes[..., 6:7] - jnp.pi / 2
    return jnp.concatenate([xyz, boxes[..., 3:6], ry], axis=-1)


def rect_yaw_to_velo_yaw(
    ry: jnp.ndarray,
    center_rect: jnp.ndarray,
    V2C: jnp.ndarray,
    R0: jnp.ndarray,
) -> jnp.ndarray:
    """Camera yaw -> LiDAR yaw by projecting a 1 m forward step through
    the calibration (kitti_dataset.py:569-591), vectorized over leading
    dims of ``ry`` ([...]) and ``center_rect`` ([..., 3])."""
    c, s = jnp.cos(ry), jnp.sin(ry)
    # Rotation about camera Y applied to [1, 0, 0]: forward = [c, 0, -s].
    fwd = jnp.stack([c, jnp.zeros_like(c), -s], axis=-1)
    p0 = _calib.rect_to_velo(center_rect, V2C, R0)
    p1 = _calib.rect_to_velo(center_rect + fwd, V2C, R0)
    d = p1 - p0
    return jnp.arctan2(d[..., 1], d[..., 0])


# Corner ordering of transformation.py:133-136 (LiDAR frame, z-up,
# bottom face first): columns are x = +-l/2, y = +-w/2, z in {0, h}.
_CORNER_SIGNS_X = jnp.array([-1, -1, 1, 1, -1, -1, 1, 1], jnp.float32) * 0.5
_CORNER_SIGNS_Y = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], jnp.float32) * 0.5
_CORNER_Z = jnp.array([0, 0, 0, 0, 1, 1, 1, 1], jnp.float32)


def center_to_corner_box3d(
    boxes: jnp.ndarray,
    coordinate: str = "lidar",
    V2C: Optional[jnp.ndarray] = None,
    R0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(N, 7) -> (N, 8, 3) corners (transformation.py:118-153).

    LiDAR convention: box bottom at z, height extends up. For
    ``coordinate='camera'``, boxes are converted to LiDAR, corners built
    there, and corner points mapped back to camera — exactly the
    reference's (convoluted but behavior-defining) route.
    """
    if V2C is None or R0 is None:
        V2C, R0, _ = _calib.mean_calibration()
    if coordinate == "camera":
        boxes = camera_to_lidar_box(boxes, V2C, R0)
    h, w, l = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    yaw = boxes[..., 6]
    local_x = l[..., None] * _CORNER_SIGNS_X  # (N, 8)
    local_y = w[..., None] * _CORNER_SIGNS_Y
    local_z = h[..., None] * _CORNER_Z
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    gx = c * local_x - s * local_y + boxes[..., 0:1]
    gy = s * local_x + c * local_y + boxes[..., 1:2]
    gz = local_z + boxes[..., 2:3]
    corners = jnp.stack([gx, gy, gz], axis=-1)  # (N, 8, 3)
    if coordinate == "camera":
        corners = lidar_to_camera_points(corners, V2C, R0)
    return corners


def corner_to_center_box3d(
    corners: jnp.ndarray,
    coordinate: str = "camera",
    V2C: Optional[jnp.ndarray] = None,
    R0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(N, 8, 3) -> (N, 7), the averaging variant
    (transformation.py:159-201, CORNER2CENTER_AVG=True), vectorized.

    Works in camera coords (y down); ``coordinate='lidar'`` converts in
    and out like the reference (transformation.py:161-163,235-236).
    """
    if V2C is None or R0 is None:
        V2C, R0, _ = _calib.mean_calibration()
    if coordinate == "lidar":
        corners = lidar_to_camera_points(corners, V2C, R0)

    roi = corners  # (N, 8, 3) camera coords
    h = jnp.abs(jnp.sum(roi[:, :4, 1] - roi[:, 4:, 1], axis=1) / 4)

    def dist_xz(a, b):
        d = roi[:, a][:, [0, 2]] - roi[:, b][:, [0, 2]]
        return jnp.sqrt(jnp.sum(d * d, axis=-1))

    w = (dist_xz(0, 3) + dist_xz(1, 2) + dist_xz(4, 7) + dist_xz(5, 6)) / 4
    l = (dist_xz(0, 1) + dist_xz(2, 3) + dist_xz(4, 5) + dist_xz(6, 7)) / 4
    x = jnp.sum(roi[:, :, 0], axis=1) / 8
    y = jnp.sum(roi[:, :4, 1], axis=1) / 4
    z = jnp.sum(roi[:, :, 2], axis=1) / 8

    def at2(a, b, flip):
        # atan2(x_a - x_b, z_a - z_b) or the flipped variant used for the
        # second group of four terms (transformation.py:185-194).
        if not flip:
            return jnp.arctan2(
                roi[:, a, 0] - roi[:, b, 0], roi[:, a, 2] - roi[:, b, 2]
            )
        return jnp.arctan2(roi[:, a, 2] - roi[:, b, 2], roi[:, b, 0] - roi[:, a, 0])

    ry = (
        at2(2, 1, False)
        + at2(6, 5, False)
        + at2(3, 0, False)
        + at2(7, 4, False)
        + at2(0, 1, True)
        + at2(4, 5, True)
        + at2(3, 2, True)
        + at2(7, 6, True)
    ) / 8

    # transformation.py:195-200: both the `w > l` and `l > w` branches
    # execute the *same* simultaneous swap (`w, l = l, w` == `l, w = w, l`)
    # and subtract pi/2 — i.e. w and l are unconditionally exchanged
    # whenever they differ. This un-crosses the axis mix-up above (the
    # distance formulas measure w along the length axis and vice versa),
    # so boxes round-trip correctly through corner form.
    swap = w != l
    w2 = jnp.where(swap, l, w)
    l2 = jnp.where(swap, w, l)
    ry = jnp.where(swap, ry - jnp.pi / 2, ry)

    out = jnp.stack([x, y, z, h, w2, l2, ry], axis=-1)
    if coordinate == "lidar":
        out = camera_to_lidar_box(out, V2C, R0)
    return out


def point_transform(
    points: jnp.ndarray,
    tx: float,
    ty: float,
    tz: float,
    rx: float = 0.0,
    ry: float = 0.0,
    rz: float = 0.0,
) -> jnp.ndarray:
    """Translate then rotate about x, y, z in order
    (transformation.py:241-284)."""
    p = points + jnp.asarray([tx, ty, tz], dtype=points.dtype)

    def rot(p, mat):
        return p @ mat.T

    def skip(angle) -> bool:
        # Python-zero angles skip the matmul (like the reference's
        # `if rx != 0` guards); traced angles always apply — rotation by
        # a traced 0 is the identity, so semantics are unchanged and the
        # function stays jittable (data-dependent Python branching is
        # not).
        return isinstance(angle, (int, float)) and angle == 0

    if not skip(rx):
        c, s = jnp.cos(rx), jnp.sin(rx)
        p = rot(p, jnp.array([[1, 0, 0], [0, c, s], [0, -s, c]], p.dtype))
    if not skip(ry):
        c, s = jnp.cos(ry), jnp.sin(ry)
        p = rot(p, jnp.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], p.dtype))
    if not skip(rz):
        c, s = jnp.cos(rz), jnp.sin(rz)
        p = rot(p, jnp.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], p.dtype))
    return p


def box_transform(
    boxes: jnp.ndarray,
    tx: float,
    ty: float,
    tz: float,
    r: float = 0.0,
    coordinate: str = "lidar",
    V2C: Optional[jnp.ndarray] = None,
    R0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rigid-transform boxes via their corners (transformation.py:287-302)."""
    corners = center_to_corner_box3d(boxes, coordinate, V2C, R0)
    if coordinate == "lidar":
        corners = point_transform(corners, tx, ty, tz, rz=r)
    else:
        corners = point_transform(corners, tx, ty, tz, ry=r)
    return corner_to_center_box3d(corners, coordinate, V2C, R0)
