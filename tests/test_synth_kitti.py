"""Synthetic KITTI generator (scripts/synth_kitti.py) — the data source
for the dress rehearsal and the generalization experiments.

v2 is the single-return depth-map synthesizer (occlusion, facades,
foliage); its contract is what real spinning LiDAR guarantees: at most
one return per (beam, azimuth) bin, and surfaces behind a nearer
surface in the same bins are never returned.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sk():
    spec = importlib.util.spec_from_file_location(
        "synth_kitti", os.path.join(REPO, "scripts", "synth_kitti.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_v2_depth_map_occlusion(sk):
    """A wall at 10 m hides a cluster at 20 m in the same bins; remove
    the wall and the cluster returns appear."""
    rng = np.random.default_rng(0)
    gy, gz = np.meshgrid(
        np.linspace(-1.2, 1.2, 120), np.linspace(-1.7, 1.2, 120)
    )
    wall = np.stack(
        [np.full(gy.size, 10.0), gy.ravel(), gz.ravel()], 1
    )
    hy, hz = np.meshgrid(
        np.linspace(-0.5, 0.5, 60), np.linspace(-1.0, 0.0, 60)
    )
    hidden = np.stack(
        [np.full(hy.size, 20.0), hy.ravel(), hz.ravel()], 1
    )

    def far_returns(pts):
        out = sk.v2_depth_map_resample(np.random.default_rng(1), pts)
        r = np.linalg.norm(out, axis=1)
        near_hidden = (
            (r > 18.5) & (r < 21.5)
            & (np.abs(out[:, 1]) < 0.6) & (out[:, 0] > 0)
        )
        return int(near_hidden.sum())

    assert far_returns(np.concatenate([wall, hidden])) == 0  # occluded
    assert far_returns(hidden) > 20  # visible without the wall

    # and the wall itself returns points at ~10 m
    out = sk.v2_depth_map_resample(rng, wall)
    r = np.linalg.norm(out, axis=1)
    assert int(((r > 9.5) & (r < 10.5)).sum()) > 50


def test_v2_single_return_property(sk):
    """One return per (beam, azimuth) bin — recomputed bins collide only
    where the output jitter pushes a return across a bin edge."""
    from distropointclouds_tpu.geometry.calib import mean_calibration

    V2C, R0, _ = (np.asarray(m, np.float64) for m in mean_calibration())
    rng = np.random.default_rng(3)
    scan, lines = sk.synth_scan_v2(rng, V2C, R0)
    assert scan.dtype == np.float32 and scan.shape[1] == 4
    assert 30_000 < len(scan) < 160_000
    p = scan[:, :3].astype(np.float64)
    r3 = np.linalg.norm(p, axis=1)
    elev = np.arcsin(np.clip(p[:, 2] / r3, -1, 1))
    beam = np.rint(
        (elev - sk.V2_BEAM_ELEV[0])
        / (sk.V2_BEAM_ELEV[-1] - sk.V2_BEAM_ELEV[0]) * 63.0
    ).astype(np.int64)
    az = np.mod(np.arctan2(p[:, 1], p[:, 0]), 2 * np.pi)
    azb = np.minimum(
        (az / (2 * np.pi) * sk.V2_N_AZ).astype(np.int64), sk.V2_N_AZ - 1
    )
    unique = len(set(zip(beam.tolist(), azb.tolist())))
    assert unique / len(scan) > 0.98

    # every label line parses as class + 15 floats (KITTI shape)
    assert lines and all(
        len(l.split()) == 15 and l.split()[0] in ("Pedestrian", "Car")
        for l in lines
    )


def test_v2_end_to_end_label_factory(sk, tmp_path, monkeypatch):
    """v2 scans through the production path: generator main() -> cli
    build-dataset -> descriptors + dual-source pedestrian labels with
    nonempty covered cells."""
    out = tmp_path / "kitti"
    monkeypatch.setattr(
        sys, "argv",
        ["synth_kitti.py", "--num", "2", "--out", str(out),
         "--seed", "11", "--realism", "v2"],
    )
    sk.main()
    assert sorted(os.listdir(out / "training" / "velodyne")) == [
        "000000.bin", "000001.bin",
    ]

    from distropointclouds_tpu.cli.main import main as cli_main

    sc_dir = tmp_path / "sc"
    rc = cli_main(
        ["build-dataset", "--kitti_root", str(out), "--out", str(sc_dir)]
    )
    assert rc == 0
    for i in range(2):
        sc = np.load(sc_dir / f"sc_{i:06d}.npy")
        assert sc.shape == (160, 720) and sc.dtype == np.float32
        frac = float((sc != 0).mean())
        assert 0.05 < frac < 0.8, frac  # street density, not soup
        peds = json.load(open(sc_dir / f"pedestrians_{i:06d}.json"))
        assert peds and len(peds) % 2 == 0  # dual-source duplicates
        assert any(len(p.get("covered_cells", [])) >= 2 for p in peds)


def test_v3_adds_unlabeled_distractors(sk):
    """v3 = v2 scene content + the measured-FP distractor classes
    (bins/bollards, bushes, curbs, fences — all UNLABELED): the scan
    must keep the single-return contract, labels must stay only
    Pedestrian/Car, and the distractor generators must emit points in
    their documented height bands (the classes the v2 checkpoint's
    false positives fall into, runs/fp_attribution_synthgen_v2.json)."""
    from distropointclouds_tpu.geometry.calib import mean_calibration

    V2C, R0, _ = (np.asarray(m, np.float64) for m in mean_calibration())
    rng = np.random.default_rng(5)
    scan, lines = sk.synth_scan_v3(rng, V2C, R0)
    assert scan.dtype == np.float32 and scan.shape[1] == 4
    assert lines and all(
        l.split()[0] in ("Pedestrian", "Car") for l in lines
    )
    # single-return property holds with the extra content
    p = scan[:, :3].astype(np.float64)
    r3 = np.linalg.norm(p, axis=1)
    elev = np.arcsin(np.clip(p[:, 2] / r3, -1, 1))
    beam = np.rint(
        (elev - sk.V2_BEAM_ELEV[0])
        / (sk.V2_BEAM_ELEV[-1] - sk.V2_BEAM_ELEV[0]) * 63.0
    ).astype(np.int64)
    az = np.mod(np.arctan2(p[:, 1], p[:, 0]), 2 * np.pi)
    azb = np.minimum(
        (az / (2 * np.pi) * sk.V2_N_AZ).astype(np.int64), sk.V2_N_AZ - 1
    )
    assert len(set(zip(beam.tolist(), azb.tolist()))) / len(scan) > 0.98

    # distractor height bands (sensor frame: ground at -1.73)
    rng = np.random.default_rng(6)
    for gen, zmax_lo, zmax_hi in (
        (sk.v3_bin_points, -1.3, -0.2),    # 0.5-1.4 m tall verticals
        (sk.v3_bush_points, -1.5, -0.4),   # 0.3-1.2 m blobs
        (sk.v3_curb_points, -1.7, -1.4),   # 0.10-0.25 m ridges
        (sk.v3_fence_points, -1.1, -0.4),  # 0.7-1.2 m rails
    ):
        pts = gen(rng)
        assert len(pts) >= 40
        z_top = float(pts[:, 2].max())
        assert zmax_lo <= z_top <= zmax_hi + 0.2, (gen.__name__, z_top)
        # all distractors stay pedestrian-scale or lower in height
        assert z_top < 0.0
