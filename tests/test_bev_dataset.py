"""BEV dataset pipeline: filtering, mosaic target remapping, multiscale
sizes, and YOLO->KITTI format conversion round-trip."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.bev.config import BevConfig, Boundary
from distropointclouds_tpu.bev.dataset import (
    filter_valid_samples,
    load_bev_sample,
    mosaic4,
    multiscale_size,
    resize_batch,
)
from distropointclouds_tpu.bev.kitti_format import (
    compute_box_3d_camera,
    detections_to_kitti_format,
    merge_rgb_to_bev,
    yolo_to_kitti_objects,
)
from distropointclouds_tpu.io.kitti import CalibrationData, KittiPaths


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_bev")
    for d in ["velodyne", "label_2", "calib"]:
        os.makedirs(root / "training" / d)
    rng = np.random.default_rng(7)
    calib_txt = (
        "P0: 700 0 600 0 0 700 180 0 0 0 1 0\n"
        "P1: 700 0 600 0 0 700 180 0 0 0 1 0\n"
        "P2: 700 0 600 44.9 0 700 180 0.1 0 0 1 0\n"
        "P3: 700 0 600 0 0 700 180 0 0 0 1 0\n"
        "R_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo2cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27\n"
    )
    # frame 0: valid pedestrian; frame 1: only DontCare -> filtered;
    # frame 2: out-of-range car -> filtered
    labels = [
        "Pedestrian 0.0 0 0.5 100 150 120 250 1.7 0.6 0.8 1.0 1.2 10.0 0.3\n",
        "DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10\n",
        "Car 0.0 0 0.5 100 150 120 250 1.5 1.7 4.0 60.0 1.2 90.0 0.3\n",
    ]
    for i in range(3):
        pts = rng.uniform(-20, 20, size=(2048, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 1, size=2048)
        pts.tofile(root / "training" / "velodyne" / f"{i:06d}.bin")
        with open(root / "training" / "label_2" / f"{i:06d}.txt", "w") as f:
            f.write(labels[i])
        with open(root / "training" / "calib" / f"{i:06d}.txt", "w") as f:
            f.write(calib_txt)
    return root


def test_filter_valid_samples(kitti_tree):
    paths = KittiPaths(str(kitti_tree))
    kept = filter_valid_samples(paths, [0, 1, 2])
    assert kept == [0]


def test_load_bev_sample(kitti_tree):
    paths = KittiPaths(str(kitti_tree))
    s = load_bev_sample(paths, 0)
    assert s["bev"].shape == (608, 608, 3)
    assert s["valid"].sum() == 1
    t = s["targets"][0]
    # pedestrian at lidar x ~ 10, y ~ -1 -> normalized x1 ~ 0.2, y1 ~ 0.48
    assert 0.1 < t[2] < 0.3
    assert 0.4 < t[1] < 0.6


def test_mosaic4(kitti_tree):
    paths = KittiPaths(str(kitti_tree))
    s = load_bev_sample(paths, 0)
    m = mosaic4([s, s, s, s], img_size=608)
    assert m["bev"].shape == (1216, 1216, 3)
    assert m["targets"].shape[0] == 4 * s["targets"].shape[0]
    assert m["valid"].sum() == 4
    # default center (608, 608): quadrant i offsets the normalized coords
    t0 = s["targets"][0]
    mt = m["targets"][m["valid"]]
    # top-left copy: (x*608+0)/1216 = x/2 ; bottom-right: (x*608+608)/1216
    assert mt[0, 2] == pytest.approx(t0[2] / 2, abs=1e-5)
    assert mt[3, 2] == pytest.approx(t0[2] / 2 + 0.5, abs=1e-5)
    assert mt[3, 1] == pytest.approx(t0[1] / 2 + 0.5, abs=1e-5)


def test_multiscale_sizes():
    rng = np.random.default_rng(0)
    sizes = {multiscale_size(i * 10, rng) for i in range(50)}
    assert sizes <= {512, 544, 576, 608, 640, 672, 704}
    assert multiscale_size(3, rng) == 608  # non-10th batches unchanged
    x = jnp.zeros((2, 608, 608, 3))
    assert resize_batch(x, 544).shape == (2, 544, 544, 3)


def test_compute_box_3d_camera_matches_reference_model():
    """Vectorized corners vs the reference's loop math
    (kitti_data_utils.py:347-372)."""
    h, w, l = 1.7, 0.6, 0.8
    t = np.array([2.0, 1.2, 10.0])
    ry = 0.4
    got = np.asarray(
        compute_box_3d_camera(
            jnp.float32(h), jnp.float32(w), jnp.float32(l),
            jnp.asarray(t, jnp.float32), jnp.float32(ry),
        )
    )
    R = np.array(
        [[np.cos(ry), 0, np.sin(ry)], [0, 1, 0], [-np.sin(ry), 0, np.cos(ry)]]
    )
    xs = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    ys = [0, 0, 0, 0, -h, -h, -h, -h]
    zs = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    ref = (R @ np.vstack([xs, ys, zs])).T + t
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_yolo_to_kitti_objects(kitti_tree):
    paths = KittiPaths(str(kitti_tree))
    calib = CalibrationData.read(paths.calib(0))
    from distropointclouds_tpu.bev.dataset import lidar_labels_for_sample
    from distropointclouds_tpu.bev.targets import build_yolo_target

    lab, _ = lidar_labels_for_sample(paths, 0)
    t, v = build_yolo_target(jnp.asarray(lab), capacity=8)
    objs = yolo_to_kitti_objects(np.asarray(t)[np.asarray(v)], calib, (370, 1224))
    assert len(objs) == 1
    o = objs[0]
    assert o.type == "Pedestrian"
    # Round-trip: original camera-frame location within the +-0.3 size pad
    assert abs(o.t[0] - 1.0) < 0.05
    assert abs(o.t[2] - 10.0) < 0.05
    assert abs(o.h - 1.8) < 0.2  # class-constant height from decode
    line = o.to_kitti_format()
    assert line.startswith("Pedestrian ")


def test_detections_to_kitti_format(kitti_tree):
    paths = KittiPaths(str(kitti_tree))
    calib = CalibrationData.read(paths.calib(0))
    # one fake net detection row [x, y, w, l, im, re, conf, cls] in pixels
    det = np.array([[100.0, 300.0, 20.0, 30.0, 0.3, 0.95, 0.9, 1.0]])
    objs = detections_to_kitti_format([det, None], calib, (370, 1224), 608)
    assert len(objs) == 1 and objs[0].type == "Pedestrian"


def test_bev_loader(kitti_tree, tmp_path):
    """create_bev_loader end-to-end: train (filtered, augmented) and val
    (ordered, clean) streams."""
    import os

    from distropointclouds_tpu.bev.loader import (
        BevLoaderConfig,
        create_bev_loader,
    )

    paths = KittiPaths(str(kitti_tree))
    os.makedirs(kitti_tree / "ImageSets", exist_ok=True)
    with open(kitti_tree / "ImageSets" / "train.txt", "w") as f:
        f.writelines(f"{i:06d}\n" for i in range(3))
    with open(kitti_tree / "ImageSets" / "val.txt", "w") as f:
        f.writelines(f"{i:06d}\n" for i in range(3))

    cfg = BevLoaderConfig(batch_size=1, hflip_prob=1.0)
    batches = list(create_bev_loader(paths, "train", cfg))
    # only sample 0 survives filtering
    assert len(batches) == 1
    b = batches[0]
    assert b["bev"].shape == (1, 608, 608, 3)
    assert b["targets"].shape[1:] == (50, 7)
    assert b["valid"].sum() == 1

    val = list(create_bev_loader(paths, "val", cfg))
    assert len(val) == 3  # unfiltered

    # mosaic mode: 4x target capacity, double-size canvas
    cfgm = BevLoaderConfig(batch_size=1, mosaic=True)
    bm = next(iter(create_bev_loader(paths, "train", cfgm)))
    assert bm["bev"].shape == (1, 1216, 1216, 3)
    assert bm["targets"].shape[1] == 200


def test_merge_rgb_to_bev():
    rgb = np.zeros((370, 1224, 3), np.uint8)
    bev = np.ones((608, 608, 3), np.uint8) * 255
    out = merge_rgb_to_bev(rgb, bev, 608)
    assert out.shape[1] == 608
    assert out[:100].max() == 0 and out[-100:].min() == 255
