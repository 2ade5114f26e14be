"""Synthesize a KITTI-layout dataset of raw LiDAR scans for the
at-scale dress rehearsal of the data path (r2 VERDICT #6: build-dataset
and the trainers had only ever run on 4 real scans).

Point-cloud-level synthesis (not descriptor-space): a 64-beam spinning
LiDAR model samples a ground plane (the characteristic ring structure),
pedestrian and car boxes are placed in the scene and their visible
surfaces sampled, plus clutter — then each scan is written as a KITTI
``velodyne/XXXXXX.bin`` (N x 4 float32) with a camera-frame
``label_2/XXXXXX.txt`` and a ``calib/XXXXXX.txt`` (the KITTI mean
calibration, geometry/calib.py:23-57), so the REAL production path
(`cli build-dataset` -> descriptor + dual-source pedestrian labels ->
`cli train`) runs end to end at scale.

Output tree (default runs/synth_kitti):
  training/velodyne/*.bin  training/label_2/*.txt  training/calib/*.txt
  ImageSets/train.txt ImageSets/val.txt

Usage: python scripts/synth_kitti.py [--num 300] [--out runs/synth_kitti]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    # Honor an explicit platform request despite the sitecustomize hook
    # that re-registers the tunneled TPU after env parsing (CLAUDE.md) —
    # geometry.calib.mean_calibration builds jnp constants, and this
    # pure-host synthesis script must never block on the TPU tunnel.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

SENSOR_H = 1.73  # KITTI Velodyne mount height (m)


def ground_points(rng, n_az=1600):
    """64-beam ground returns: rings at ranges set by beam elevation."""
    elev = np.deg2rad(np.linspace(-24.8, -0.5, 64))
    az = rng.uniform(0, 2 * np.pi, size=(n_az,))
    rr = SENSOR_H / np.tan(-elev)  # range to flat ground per beam
    keep = rr < 75.0
    rr = rr[keep]
    pts = []
    for r in rr:
        a = az + rng.normal(0, 0.002, size=az.shape)
        rn = r * (1 + rng.normal(0, 0.01, size=az.shape))
        x = rn * np.cos(a)
        y = rn * np.sin(a)
        z = np.full_like(x, -SENSOR_H) + rng.normal(0, 0.02, size=az.shape)
        pts.append(np.stack([x, y, z], 1))
    return np.concatenate(pts)


def box_surface_points(rng, cx, cy, cz, h, w, l, yaw, n):
    """Sample the sensor-facing surfaces of an upright box (center at
    mid-height cz)."""
    # sample the two faces + top edge region in the box frame
    u = rng.uniform(-0.5, 0.5, size=n)
    v = rng.uniform(-0.5, 0.5, size=n)
    face = rng.integers(0, 4, size=n)
    xl = np.where(face == 0, u * l, np.where(face == 1, -l / 2, np.where(face == 2, l / 2, u * l)))
    yl = np.where(face == 0, -w / 2, np.where(face == 3, w / 2, u * w))
    zl = v * h
    c, s = np.cos(yaw), np.sin(yaw)
    x = cx + xl * c - yl * s
    y = cy + xl * s + yl * c
    z = cz + zl
    pts = np.stack([x, y, z], 1)
    return pts + rng.normal(0, 0.01, size=pts.shape)


def lidar_box_to_camera_label(cls, x, y, z, h, w, l, yaw, V2C, R0):
    """LiDAR box (mid-height center, velo yaw) -> KITTI label-line
    fields (rect-frame bottom center + ry). Inverse of the reference's
    camera_to_lidar_box (transformation.py:83-92: rz = -ry - pi/2)."""
    rect = R0 @ (V2C @ np.array([x, y, z, 1.0]))
    t = rect + np.array([0.0, h / 2, 0.0])  # camera y points down
    ry = -yaw - np.pi / 2
    while ry > np.pi:
        ry -= 2 * np.pi
    while ry < -np.pi:
        ry += 2 * np.pi
    return (
        f"{cls} 0.00 0 0.00 300.00 150.00 350.00 250.00 "
        f"{h:.2f} {w:.2f} {l:.2f} {t[0]:.2f} {t[1]:.2f} {t[2]:.2f} {ry:.2f}"
    )


CALIB_KEYS = ("P0", "P1", "P2", "P3", "R0_rect", "Tr_velo_to_cam", "Tr_imu_to_velo")


def write_calib(path, V2C, R0, P2):
    mats = {
        "P0": P2, "P1": P2, "P2": P2, "P3": P2,
        "R0_rect": R0, "Tr_velo_to_cam": V2C,
        "Tr_imu_to_velo": np.eye(3, 4, dtype=np.float32),
    }
    with open(path, "w") as f:
        for k in CALIB_KEYS:
            f.write(k + ": " + " ".join(f"{v:.12e}" for v in np.asarray(mats[k]).ravel()) + "\n")


def synth_scan(rng, V2C, R0):
    pts = [ground_points(rng)]
    labels = []
    # pedestrians: inside the 20 m descriptor range mostly
    for _ in range(int(rng.integers(1, 7))):
        r = rng.uniform(3.0, 19.0)
        a = rng.uniform(0, 2 * np.pi)
        cx, cy = r * np.cos(a), r * np.sin(a)
        h, w, l = rng.uniform(1.6, 1.9), rng.uniform(0.5, 0.7), rng.uniform(0.5, 0.7)
        cz = -SENSOR_H + h / 2
        yaw = rng.uniform(-np.pi, np.pi)
        n = int(np.clip(2500 / r, 60, 700))
        pts.append(box_surface_points(rng, cx, cy, cz, h, w, l, yaw, n))
        labels.append(("Pedestrian", cx, cy, cz, h, w, l, yaw))
    # cars as distractors
    for _ in range(int(rng.integers(0, 5))):
        r = rng.uniform(5.0, 40.0)
        a = rng.uniform(0, 2 * np.pi)
        cx, cy = r * np.cos(a), r * np.sin(a)
        h, w, l = 1.5, 1.7, 4.0
        cz = -SENSOR_H + h / 2
        yaw = rng.uniform(-np.pi, np.pi)
        n = int(np.clip(8000 / r, 120, 1500))
        pts.append(box_surface_points(rng, cx, cy, cz, h, w, l, yaw, n))
        labels.append(("Car", cx, cy, cz, h, w, l, yaw))
    # sparse clutter (poles, bushes)
    for _ in range(int(rng.integers(4, 12))):
        r = rng.uniform(2.0, 50.0)
        a = rng.uniform(0, 2 * np.pi)
        cx, cy = r * np.cos(a), r * np.sin(a)
        hh = rng.uniform(0.5, 3.0)
        n = int(rng.integers(20, 120))
        p = np.stack(
            [
                cx + rng.normal(0, 0.15, n),
                cy + rng.normal(0, 0.15, n),
                rng.uniform(-SENSOR_H, -SENSOR_H + hh, n),
            ],
            1,
        )
        pts.append(p)
    xyz = np.concatenate(pts).astype(np.float32)
    rng.shuffle(xyz, axis=0)
    intensity = rng.uniform(0, 1, size=(len(xyz), 1)).astype(np.float32)
    scan = np.concatenate([xyz, intensity], 1)
    lines = [
        lidar_box_to_camera_label(c, x, y, z, h, w, l, yw, V2C, R0)
        for (c, x, y, z, h, w, l, yw) in labels
    ]
    return scan, lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=300)
    ap.add_argument("--out", default=os.path.join("runs", "synth_kitti"))
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--val_fraction", type=float, default=0.1)
    args = ap.parse_args()

    from distropointclouds_tpu.geometry.calib import mean_calibration

    V2C, R0, P2 = (np.asarray(m, np.float64) for m in mean_calibration())
    rng = np.random.default_rng(args.seed)

    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(os.path.join(args.out, "training", sub), exist_ok=True)
    os.makedirs(os.path.join(args.out, "ImageSets"), exist_ok=True)

    n_pts = []
    for sid in range(args.num):
        scan, lines = synth_scan(rng, V2C, R0)
        scan.tofile(os.path.join(args.out, "training", "velodyne", f"{sid:06d}.bin"))
        with open(os.path.join(args.out, "training", "label_2", f"{sid:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        write_calib(
            os.path.join(args.out, "training", "calib", f"{sid:06d}.txt"),
            V2C, R0, P2,
        )
        n_pts.append(len(scan))
    ids = np.arange(args.num)
    rng.shuffle(ids)
    n_val = int(round(args.num * args.val_fraction))
    for name, arr in (("val", np.sort(ids[:n_val])), ("train", np.sort(ids[n_val:]))):
        with open(os.path.join(args.out, "ImageSets", f"{name}.txt"), "w") as f:
            f.writelines(f"{i:06d}\n" for i in arr)
    print(
        f"wrote {args.num} scans to {args.out} "
        f"(points/scan min={min(n_pts)} max={max(n_pts)} mean={int(np.mean(n_pts))})"
    )


if __name__ == "__main__":
    main()
