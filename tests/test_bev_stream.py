"""BEV rasterization vs numpy reference model, YOLO target round-trip,
voxel downsample vs brute-force, streaming API behavior, viz smoke."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distropointclouds_tpu.bev.config import BevConfig, Boundary
from distropointclouds_tpu.bev.features import make_bev_feature
from distropointclouds_tpu.bev.targets import (
    build_yolo_target,
    get_corners,
    inverse_yolo_target,
)
from distropointclouds_tpu.core.types import PointBatch
from distropointclouds_tpu.ops.voxel import voxel_downsample


def numpy_bev_reference(points, cfg: BevConfig):
    """Independent numpy model of removePoints + makeBVFeature
    (kitti_bev_utils.py:18-76)."""
    b = cfg.boundary
    pc = points.copy()
    m = (
        (pc[:, 0] >= b.min_x) & (pc[:, 0] <= b.max_x)
        & (pc[:, 1] >= b.min_y) & (pc[:, 1] <= b.max_y)
        & (pc[:, 2] >= b.min_z) & (pc[:, 2] <= b.max_z)
    )
    pc = pc[m]
    pc[:, 2] -= b.min_z
    H1, W1 = cfg.height + 1, cfg.width + 1
    d = cfg.discretization
    pc2 = pc.copy()
    pc2[:, 0] = np.int_(np.floor(pc2[:, 0] / d))
    pc2[:, 1] = np.int_(np.floor(pc2[:, 1] / d) + W1 / 2)
    idx = np.lexsort((-pc2[:, 2], pc2[:, 1], pc2[:, 0]))
    pc2 = pc2[idx]
    height = np.zeros((H1, W1))
    _, first = np.unique(pc2[:, 0:2], axis=0, return_index=True)
    frac = pc2[first]
    max_h = abs(b.max_z - b.min_z)
    height[np.int_(frac[:, 0]), np.int_(frac[:, 1])] = frac[:, 2] / max_h
    intensity = np.zeros((H1, W1))
    density = np.zeros((H1, W1))
    _, first, counts = np.unique(
        pc2[:, 0:2], axis=0, return_index=True, return_counts=True
    )
    top = pc2[first]
    nc = np.minimum(1.0, np.log(counts + 1) / np.log(64))
    intensity[np.int_(top[:, 0]), np.int_(top[:, 1])] = top[:, 3]
    density[np.int_(top[:, 0]), np.int_(top[:, 1])] = nc
    out = np.stack(
        [
            intensity[: cfg.height, : cfg.width],
            height[: cfg.height, : cfg.width],
            density[: cfg.height, : cfg.width],
        ],
        axis=-1,
    )
    return out.astype(np.float32)


def test_bev_feature_parity(rng, reference_available):
    from distropointclouds_tpu.io import fixtures

    cfg = BevConfig()
    pts = fixtures.golden_scan("000840")
    pb = PointBatch.from_numpy(pts, cfg.max_points)
    got = np.asarray(make_bev_feature(pb, cfg))
    # float32 like the real reference (its PointCloud array is f32).
    ref = numpy_bev_reference(pts.astype(np.float32), cfg)
    assert got.shape == (608, 608, 3)
    # Density and intensity must match exactly; height can differ on
    # z-ties at f32 (argmax tie-break), so allow a tiny mismatch count.
    np.testing.assert_allclose(got[..., 2], ref[..., 2], atol=1e-6)
    bad_h = (np.abs(got[..., 1] - ref[..., 1]) > 1e-5).sum()
    bad_i = (np.abs(got[..., 0] - ref[..., 0]) > 1e-5).sum()
    assert bad_h <= 5 and bad_i <= 5


def test_yolo_target_roundtrip():
    labels = np.array(
        [
            [1, 10.0, 5.0, -0.5, 1.7, 0.6, 0.8, 0.3],
            [0, 30.0, -10.0, -0.9, 1.5, 1.7, 4.0, -1.2],
            [2, 60.0, 0.0, -0.5, 1.4, 0.6, 1.7, 0.5],  # out of range (x > 50)
        ],
        np.float32,
    )
    t, valid = build_yolo_target(jnp.asarray(labels), capacity=8)
    assert valid.tolist()[:2] == [True, True]
    assert not valid[2]
    back = np.asarray(inverse_yolo_target(t[:2]))
    # x, y, w, l round-trip; yaw modulo 2pi; z/h are fixed constants
    np.testing.assert_allclose(back[:, 1:3], labels[:2, 1:3], atol=1e-4)
    np.testing.assert_allclose(back[:, 5:7], labels[:2, 5:7], atol=1e-4)
    dyaw = np.angle(np.exp(1j * (back[:, 7] - labels[:2, 7])))
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)
    assert back[0, 4] == pytest.approx(1.8)  # pedestrian height constant


def test_get_corners_shape():
    c = np.asarray(get_corners(
        jnp.float32(10), jnp.float32(20), jnp.float32(2), jnp.float32(4),
        jnp.float32(0.0),
    ))
    assert c.shape == (4, 2)
    # axis-aligned box at yaw 0: x +- w/2, y +- l/2
    np.testing.assert_allclose(sorted(c[:, 0]), [9, 9, 11, 11])
    np.testing.assert_allclose(sorted(c[:, 1]), [18, 18, 22, 22])


def test_voxel_downsample_vs_bruteforce(rng):
    n = 2000
    xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-100:] = False
    c, m = voxel_downsample(jnp.asarray(xyz), jnp.asarray(valid), 0.5)
    c, m = np.asarray(c), np.asarray(m)

    pts = xyz[valid]
    mn = pts.min(axis=0)
    keys = np.floor((pts - mn) / 0.5).astype(np.int64)
    uniq = {}
    for k, p in zip(map(tuple, keys), pts):
        uniq.setdefault(k, []).append(p)
    expected = sorted(
        tuple(np.round(np.mean(v, axis=0), 4)) for v in uniq.values()
    )
    got = sorted(tuple(np.round(p, 4)) for p in c[m])
    assert len(got) == len(expected)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-3)


def test_stream_api(tmp_path, rng):
    from distropointclouds_tpu.stream.pipeline import (
        ScanContextStream,
        StreamConfig,
    )

    cfg = StreamConfig(
        voxel_size=0.2,
        max_points=8192,
        output_dir=str(tmp_path / "out"),
        dl_images_dir=str(tmp_path / "img"),
        queue_depth=3,
    )
    results = []
    stream = ScanContextStream(
        cfg, save=True, on_result=lambda stem, sc: results.append(stem)
    )
    for i in range(5):  # queue depth 3: two oldest dropped
        stream.push(rng.uniform(-10, 10, size=(1000, 3)).astype(np.float32))
    out = stream.drain()
    assert len(out) == 3
    assert stream.stats["dropped"] == 2
    assert stream.stats["processed"] == 3
    for stem, sc in out:
        assert sc.shape == (160, 720)
        assert os.path.exists(tmp_path / "out" / f"sc_{stem}.npy")
    # malformed input: skip-and-log, no crash
    assert stream.process_one(np.zeros((0, 3), np.float32)) is None
    assert stream.process_one("garbage") is None
    assert stream.stats["skipped"] == 2


def test_stream_matches_ros_node_semantics(rng):
    """Voxel-downsampled stream descriptor == manual downsample + drop
    policy descriptor."""
    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.ops.scan_context import scan_context_sorted
    from distropointclouds_tpu.stream.pipeline import (
        ScanContextStream,
        StreamConfig,
    )

    xyz = rng.uniform(-30, 30, size=(4000, 3)).astype(np.float32)
    cfg = StreamConfig(voxel_size=0.2, max_points=8192)
    sc = ScanContextStream(cfg).process_one(xyz)

    c, m = voxel_downsample(
        jnp.asarray(np.pad(xyz, ((0, 8192 - 4000), (0, 0)))),
        jnp.arange(8192) < 4000,
        0.2,
    )
    ref = np.asarray(scan_context_sorted(c, m, cfg.scan_context_config()))
    np.testing.assert_array_equal(sc, ref)


def test_stream_golden_profile_matches_fixture(reference_available):
    """StreamConfig(profile="golden_v2") makes the stream a drop-in for
    the scaner_version2.py batch job: its descriptor on a golden .bin
    matches the golden sc_*.npy fixture (same <=10 boundary-cell bound
    as the core parity gate) despite the node-semantics defaults of the
    other StreamConfig fields."""
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.stream.pipeline import (
        ScanContextStream,
        StreamConfig,
    )

    cfg = StreamConfig(profile="golden_v2")
    sc_cfg = cfg.scan_context_config()
    assert sc_cfg.voxel_size == 0.0 and sc_cfg.max_length == 20.0
    xyz = fixtures.golden_scan("000840")[:, :3]
    sc = ScanContextStream(cfg).process_one(xyz)
    golden = fixtures.golden_descriptor("000840")
    assert int((sc != golden).sum()) <= 10


def test_viz_outputs(tmp_path, rng, reference_available):
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.utils import viz

    sc = fixtures.golden_descriptor("000840")
    p1 = viz.save_descriptor_png(sc, str(tmp_path / "sc.png"))
    assert os.path.getsize(p1) > 1000
    p2 = viz.save_overlay(
        sc, np.clip(sc, 0, 1), [(10, 20), (50, 600)], str(tmp_path / "ov.png")
    )
    assert os.path.getsize(p2) > 1000
    p3 = viz.plot_training_history(
        {"loss": [3, 2, 1], "f1": [0.1, 0.5, 0.6]}, str(tmp_path / "h.png")
    )
    assert os.path.getsize(p3) > 1000
    pts = rng.uniform(-1, 1, size=(100, 3))
    p4 = viz.save_pointcloud_ply(
        pts, viz.heights_to_colors(pts[:, 2]), str(tmp_path / "c.ply")
    )
    header = open(p4).read(200)
    assert "element vertex 100" in header

    img = np.zeros((608, 608, 3), np.uint8)
    viz.draw_rotated_box(img, 300, 300, 30, 60, 0.5)
    assert img.sum() > 0


def test_augmentations(rng):
    from distropointclouds_tpu.bev.augment import (
        cutout,
        horizontal_flip,
        one_of,
        random_rotation,
        random_scaling,
    )

    key = jax.random.key(0)
    lidar = jnp.asarray(rng.uniform(-10, 10, size=(256, 4)).astype(np.float32))
    labels = jnp.asarray(
        np.array([[5.0, 2.0, -0.5, 1.7, 0.6, 0.8, 0.3]], np.float32)
    )
    # rotation preserves radii
    lr, lb = random_rotation(key, lidar, labels, p=1.0)
    r0 = np.linalg.norm(np.asarray(lidar)[:, :2], axis=1)
    r1 = np.linalg.norm(np.asarray(lr)[:, :2], axis=1)
    np.testing.assert_allclose(r1, r0, atol=1e-4)

    # reference scaling bug: uniform(lo, lo) -> always scales by lo
    ls, _ = random_scaling(key, lidar, labels, (0.95, 1.05), p=1.0)
    np.testing.assert_allclose(
        np.asarray(ls)[:, :3], np.asarray(lidar)[:, :3] * 0.95, rtol=1e-5
    )

    # flip: x column mirrored, im negated
    img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    tgt = jnp.asarray(np.array([[1, 0.25, 0.3, 0.1, 0.1, 0.5, 0.5]], np.float32))
    fi, ft = horizontal_flip(jax.random.key(42), img, tgt, p=1.0)
    assert np.asarray(ft)[0, 2] == pytest.approx(0.7)
    assert np.asarray(ft)[0, 5] == pytest.approx(-0.5)

    # cutout removes the target under the hole
    img2 = jnp.ones((32, 32, 3))
    tgt2 = jnp.asarray(np.array([[1, 0.5, 0.5, 0.1, 0.1, 0.0, 1.0]], np.float32))
    v = jnp.asarray([True])
    out_img, out_valid = cutout(
        jax.random.key(1), img2, tgt2, v, n_holes=4, ratio=0.9, p=1.0
    )
    assert not bool(out_valid[0])
    assert float(out_img.sum()) < float(img2.sum())


def test_compose_and_one_of(rng):
    """Compose applies all transforms with probability p; OneOf picks
    exactly one via lax.switch (transformation.py:315-337)."""
    import jax

    from distropointclouds_tpu.bev.augment import (
        compose,
        one_of,
        random_rotation,
        random_scaling,
    )

    lidar = jnp.asarray(rng.uniform(-10, 10, size=(128, 4)).astype(np.float32))
    labels = jnp.asarray(
        np.array([[5.0, 2.0, -0.5, 1.7, 0.6, 0.8, 0.3]], np.float32)
    )

    both = compose(
        [
            lambda k, l, b: random_rotation(k, l, b, p=1.0),
            lambda k, l, b: random_scaling(k, l, b, p=1.0),
        ],
        p=1.0,
    )
    lr, lb = jax.jit(both)(jax.random.key(0), lidar, labels)
    # rotation+scaling(0.95): radii scale by 0.95
    r0 = np.linalg.norm(np.asarray(lidar)[:, :2], axis=1)
    r1 = np.linalg.norm(np.asarray(lr)[:, :2], axis=1)
    np.testing.assert_allclose(r1, r0 * 0.95, rtol=1e-4)

    # p=0 gate: identity
    never = compose([lambda k, l, b: random_scaling(k, l, b, p=1.0)], p=0.0)
    ln, _ = never(jax.random.key(1), lidar, labels)
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(lidar))

    # OneOf: exactly one applied -> radii either preserved (rotation) or
    # scaled by exactly 0.95 (scaling), never both
    pick = one_of(
        [
            lambda k, l, b: random_rotation(k, l, b, p=1.0),
            lambda k, l, b: random_scaling(k, l, b, p=1.0),
        ],
        p=1.0,
    )
    seen = set()
    for i in range(6):
        lo, _ = jax.jit(pick)(jax.random.key(i), lidar, labels)
        ro = np.linalg.norm(np.asarray(lo)[:, :2], axis=1)
        ratio = np.median(ro / r0)
        seen.add(round(float(ratio), 3))
    assert seen <= {1.0, 0.95}
    assert len(seen) == 2  # both branches exercised across keys


def test_cli_throughput(tmp_path, rng, reference_available):
    """The production serving loop end-to-end via the CLI (native loader
    -> pipeline, pipelined dispatch)."""
    import json as _json

    from distropointclouds_tpu.cli.main import main
    from distropointclouds_tpu.io import fixtures

    bins = [
        os.path.join(fixtures.test_data_dir(), f"{s}.bin")
        for s in fixtures.GOLDEN_IDS[:2]
    ]
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            [
                "throughput",
                *bins,
                "--ckpt", "/root/reference/distro_model/tinycnn_best.pth",
                "--batch", "2",
                "--repeat", "2",
            ]
        )
    assert rc == 0
    last = buf.getvalue().strip().splitlines()[-1]
    rec = _json.loads(last)
    assert rec["scans"] == 4 and rec["scans_per_sec"] > 0
