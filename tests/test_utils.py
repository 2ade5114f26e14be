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
