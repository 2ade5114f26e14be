"""Validation + profiling utilities and the camera-image viz paths."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distropointclouds_tpu.core.config import ScanContextConfig
from distropointclouds_tpu.core.types import PointBatch
from distropointclouds_tpu.utils.validate import (
    assert_finite_tree,
    checked_scan_context,
)


def test_checked_scan_context_clean(rng):
    pts = rng.uniform(-10, 10, size=(512, 4)).astype(np.float32)
    pb = PointBatch.from_numpy(pts, 1024)
    err, grid = checked_scan_context(pb, ScanContextConfig.golden_v2())
    err.throw()  # no error
    assert grid.shape == (160, 720)


def test_checked_scan_context_nan(rng):
    pts = rng.uniform(-10, 10, size=(512, 4)).astype(np.float32)
    pts[7, 0] = np.nan
    pb = PointBatch.from_numpy(pts, 1024)
    err, _ = checked_scan_context(pb, ScanContextConfig.golden_v2())
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_checked_scan_context_nan_in_padding_ok(rng):
    """NaNs in padded (dead) rows must not trigger the check."""
    pts = rng.uniform(-10, 10, size=(100, 4)).astype(np.float32)
    pb = PointBatch.from_numpy(pts, 256)
    bad = np.array(pb.xyzi)
    bad[200, :] = np.nan
    pb = PointBatch(xyzi=jnp.asarray(bad), count=pb.count)
    err, _ = checked_scan_context(pb, ScanContextConfig.golden_v2())
    err.throw()


def test_assert_finite_tree():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_finite_tree(good)
    bad = {"a": jnp.asarray([1.0, np.inf])}
    with pytest.raises(FloatingPointError):
        assert_finite_tree(bad, "params")


def test_profiling_tools(tmp_path):
    from distropointclouds_tpu.utils.profiling import (
        MetricsLogger,
        ThroughputMeter,
        Timer,
        annotated,
    )

    t = Timer().start()
    x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
    dt = t.stop(x)
    assert dt > 0

    m = ThroughputMeter()
    for _ in range(3):
        m.record(16, x)
    assert m.total_scans == 48
    assert m.scans_per_sec > 0

    log = MetricsLogger(str(tmp_path / "m.jsonl"))
    log.log(1, loss=0.5, f1=0.25)
    log.log(2, loss=0.4, note="ok")
    log.close()
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert recs[0]["loss"] == 0.5 and recs[1]["note"] == "ok"

    with annotated("test-span"):
        _ = jnp.sum(x)


def test_camera_viz(tmp_path):
    import cv2

    from distropointclouds_tpu.io.kitti import CalibrationData, ObjectLabel
    from distropointclouds_tpu.utils.viz import (
        draw_lidar_points_on_image,
        show_image_with_boxes,
    )

    calib = CalibrationData(
        P2=np.array(
            [[700.0, 0, 600, 0], [0, 700, 180, 0], [0, 0, 1, 0]], np.float32
        ),
        P3=np.zeros((3, 4), np.float32),
        R0=np.eye(3, dtype=np.float32),
        V2C=np.array(
            [[0, -1, 0, 0], [0, 0, -1, -0.08], [1, 0, 0, -0.27]], np.float32
        ),
    )
    img = np.zeros((370, 1224, 3), np.uint8)
    obj = ObjectLabel.parse(
        "Pedestrian 0.0 0 0.5 100 150 120 250 1.7 0.6 0.8 1.0 1.2 10.0 0.3"
    )
    out = show_image_with_boxes(img, [obj], calib)
    assert out.sum() > 0  # box drawn

    pts = np.random.default_rng(0).uniform(2, 30, size=(500, 4)).astype(
        np.float32
    )
    pts[:, 1] = np.random.default_rng(1).uniform(-5, 5, 500)
    pts[:, 2] = np.random.default_rng(2).uniform(-1, 1, 500)
    out2 = draw_lidar_points_on_image(img, pts, calib)
    assert out2.sum() > 0


def test_save_lidar_scene_3d(tmp_path):
    """Offscreen 3D scene render (mayavi show_lidar_with_boxes
    replacement): points + box wireframes + highlight overlay -> PNG."""
    from distropointclouds_tpu.utils.viz import save_lidar_scene_3d

    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, size=(5000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, size=5000)
    boxes = np.array([[5.0, 1.0, -1.0, 1.7, 0.6, 0.8, 0.3]], np.float32)
    hl = np.hypot(pts[:, 0], pts[:, 1]) < 3
    out = tmp_path / "scene.png"
    save_lidar_scene_3d(
        pts, str(out), boxes_lidar=boxes, highlight_mask=hl, max_points=2000
    )
    assert out.exists() and out.stat().st_size > 1000
    # empty cloud must not crash (skip-and-log philosophy)
    save_lidar_scene_3d(
        np.zeros((0, 4), np.float32), str(tmp_path / "empty.png")
    )
    assert (tmp_path / "empty.png").exists()


def test_show_lidar_scene_3d_guarded(monkeypatch):
    """Interactive twin of the offscreen renderer (the reference's
    blocking Open3D/mayavi windows): import-guarded like the ROS shim.
    Without open3d AND without a display it must raise a pointed
    RuntimeError instead of hanging in a windowing call."""
    from distropointclouds_tpu.utils import viz

    pts = np.zeros((10, 4), np.float32)
    if viz.HAVE_OPEN3D:
        pytest.skip("open3d present: opening a live window is out of scope")
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    with pytest.raises(RuntimeError, match="save_lidar_scene_3d"):
        viz.show_lidar_scene_3d(pts)


def test_ros_node_importable_and_extract_xyz():
    """The rclpy shim must import on ROS-less hosts, and its pure-numpy
    PointCloud2 parser must decode a duck-typed message (float32 fields
    at declared offsets, skip_nans semantics)."""
    from distropointclouds_tpu.stream import ros_node

    assert hasattr(ros_node, "ScanContextRosNode")

    class Field:
        def __init__(self, name, offset, datatype):
            self.name, self.offset, self.datatype = name, offset, datatype

    class Msg:
        pass

    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(64, 3)).astype(np.float32)
    rec = np.zeros(
        64,
        dtype=np.dtype(
            {
                "names": ["x", "y", "z", "intensity"],
                "formats": [np.float32] * 4,
                "offsets": [0, 4, 8, 12],
                "itemsize": 16,
            }
        ),
    )
    rec["x"], rec["y"], rec["z"] = xyz.T
    rec["x"][7] = np.nan
    msg = Msg()
    msg.fields = [
        Field("x", 0, 7), Field("y", 4, 7), Field("z", 8, 7),
        Field("intensity", 12, 7),
    ]
    msg.point_step = 16
    msg.data = rec.tobytes()
    got = ros_node.extract_xyz(msg)
    assert got.shape == (63, 3)
    np.testing.assert_allclose(got, np.delete(xyz, 7, axis=0))

    bad = Msg()
    bad.fields = [Field("x", 0, 7)]
    bad.point_step = 4
    bad.data = b"\x00" * 16
    with pytest.raises(ValueError):
        ros_node.extract_xyz(bad)
