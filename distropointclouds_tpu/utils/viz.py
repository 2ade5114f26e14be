"""Headless visualization & export utilities.

Replaces the reference's visualization stack — matplotlib PNG savers
(`scaner_version2.py:293-365,372-427`, `train_sc_ped.py:107-129`,
`kitti_dataset.py:497-522`), OpenCV BEV drawing
(`kitti_bev_utils.py:163-180`, `visualization_utils_cv.py`), training
history plots (`tiny_sc_pred_v2.py:611-662`), and the blocking Open3D
windows (`scaner_version2.py:180-214`, `reconstruct_pointcloud.py:132-202`)
— with headless file outputs (PNG via matplotlib-Agg / cv2, point clouds
as PLY, since this framework targets display-less TPU hosts; open3d is
not required). Hosts WITH a display get the interactive twin
:func:`show_lidar_scene_3d` (open3d when importable, live matplotlib 3D
otherwise — import-guarded exactly like the ROS 2 shim).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_descriptor_png(
    sc: np.ndarray,
    path: str,
    cmap: str = "viridis",
    origin: str = "lower",
    normalize: bool = True,
) -> str:
    """Min-max-normalized descriptor image at 100 dpi — the exact frame
    layout of `scaner_version2.py:396-418` / `kitti_dataset.py:500-521`
    (figsize W/100 x H/100, no axes, tight)."""
    plt = _plt()
    sc = np.asarray(sc)
    if normalize:
        mn, mx = float(sc.min()), float(sc.max())
        if mx > mn:
            sc = (sc - mn) / (mx - mn)
    h, w = sc.shape
    fig = plt.figure(figsize=(w / 100.0, h / 100.0), dpi=100)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.imshow(sc, cmap=cmap, aspect="auto", origin=origin)
    fig.savefig(path, dpi=100, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def save_overlay(
    sc: np.ndarray,
    heat_pred: np.ndarray,
    centers: Sequence[Tuple[int, int]],
    path: str,
    clip_abs_z: float = 3.0,
) -> str:
    """Validation overlay: normalized SC background + semi-transparent
    predicted heatmap + white GT centers (`train_sc_ped.py:107-129`)."""
    plt = _plt()
    scn = np.clip(sc, -clip_abs_z, clip_abs_z) / clip_abs_z
    scn = (scn + 1.0) / 2.0
    fig = plt.figure(figsize=(7.2, 1.6), dpi=100)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.imshow(scn, cmap="viridis", aspect="auto", origin="lower")
    ax.imshow(heat_pred, cmap="hot", alpha=0.45, aspect="auto", origin="lower")
    if centers:
        ax.scatter([c[1] for c in centers], [c[0] for c in centers], s=8, c="w")
    fig.savefig(path, dpi=100, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def save_descriptor_with_cells(
    sc: np.ndarray,
    covered_cells: Sequence[Sequence[int]],
    centers: Sequence[Tuple[int, int]],
    path: str,
) -> str:
    """Descriptor + red covered cells + white centers
    (`scaner_version2.py:309-365` plot_sc_from_json)."""
    plt = _plt()
    mn, mx = float(sc.min()), float(sc.max())
    scn = (sc - mn) / (mx - mn) if mx > mn else sc
    h, w = sc.shape
    fig = plt.figure(figsize=(w / 100.0, h / 100.0), dpi=100)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.imshow(scn, cmap="viridis", aspect="auto", origin="lower")
    cells = np.asarray(covered_cells).reshape(-1, 2)
    if cells.size:
        ax.scatter(cells[:, 1], cells[:, 0], s=3, c="r", alpha=0.85)
    for r, s in centers:
        ax.plot(s, r, "wo", markersize=2, alpha=0.9)
    fig.savefig(path, dpi=100, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def plot_training_history(
    history: Dict[str, List[float]], path: str
) -> str:
    """Loss/metric curves per epoch (`tiny_sc_pred_v2.py:611-662`).
    ``history`` maps series name -> per-epoch values."""
    plt = _plt()
    keys = list(history)
    n = max(1, len(keys))
    cols = min(2, n)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(6 * cols, 3.2 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax, k in zip(axes, keys):
        ax.plot(history[k])
        ax.set_title(k)
        ax.set_xlabel("epoch")
        ax.grid(True, alpha=0.3)
    for ax in axes[len(keys):]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def save_pointcloud_ply(
    points: np.ndarray,
    colors: Optional[np.ndarray],
    path: str,
) -> str:
    """ASCII PLY export — the headless replacement for the reference's
    Open3D windows (`reconstruct_pointcloud.py:197-202`). colors in
    [0, 1] (float) or None."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    has_color = colors is not None
    if has_color:
        c = np.clip(np.asarray(colors).reshape(-1, 3) * 255, 0, 255).astype(
            np.uint8
        )
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        for i, p in enumerate(points):
            row = f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}"
            if has_color:
                row += f" {c[i, 0]} {c[i, 1]} {c[i, 2]}"
            f.write(row + "\n")
    return path


# ---- OpenCV BEV drawing (kitti_bev_utils.py:163-180 &
# visualization_utils_cv.py equivalents) --------------------------------

BEV_COLORS = ((0, 255, 255), (0, 0, 255), (255, 0, 0))


def draw_rotated_box(
    img: np.ndarray,
    x: float,
    y: float,
    w: float,
    l: float,
    yaw: float,
    color=(0, 255, 255),
) -> np.ndarray:
    """Rotated rectangle + heading edge in cyan (drawRotatedBox,
    kitti_bev_utils.py:163-168)."""
    import cv2

    from ..bev.targets import get_corners

    corners = np.asarray(
        get_corners(
            np.float32(x), np.float32(y), np.float32(w), np.float32(l),
            np.float32(yaw),
        )
    )
    pts = corners.reshape(-1, 1, 2).astype(np.int32)
    cv2.polylines(img, [pts], True, color, 2)
    c = corners.astype(np.int32)
    cv2.line(img, (c[0, 0], c[0, 1]), (c[3, 0], c[3, 1]), (255, 255, 0), 2)
    return img


def draw_boxes_in_bev(
    rgb_map: np.ndarray,
    targets: np.ndarray,
    valid: Optional[np.ndarray] = None,
    bev_width: int = 608,
    bev_height: int = 608,
) -> np.ndarray:
    """Draw YOLO-format targets on a BEV image (draw_box_in_bev,
    kitti_bev_utils.py:171-180)."""
    targets = np.asarray(targets).reshape(-1, 7)
    for j, t in enumerate(targets):
        if valid is not None and not valid[j]:
            continue
        if t[1:].sum() == 0:
            continue
        cls_id = int(t[0])
        x = t[1] * bev_width
        y = t[2] * bev_height
        w = t[3] * bev_width
        l = t[4] * bev_height
        yaw = np.arctan2(t[5], t[6])
        draw_rotated_box(
            rgb_map, x, y, w, l, yaw, BEV_COLORS[cls_id % len(BEV_COLORS)]
        )
    return rgb_map


def show_image_with_boxes(
    img: np.ndarray,
    objects,
    calib,
) -> np.ndarray:
    """Camera image with projected 3D boxes (visualization_utils.py:151-164
    / kitti_data_utils.py:415-438 draw_projected_box3d), headless —
    returns the drawn image instead of opening a window."""
    import cv2
    import jax.numpy as jnp

    from ..bev.kitti_format import compute_box_3d_camera
    from ..geometry import calib as C

    out = img.copy()
    for obj in objects:
        corners = np.asarray(
            compute_box_3d_camera(
                jnp.float32(obj.h), jnp.float32(obj.w), jnp.float32(obj.l),
                jnp.asarray(np.asarray(obj.t, np.float32)), jnp.float32(obj.ry),
            )
        )
        if np.any(corners[:, 2] < 0.1):  # behind camera
            continue
        uv = np.asarray(
            C.rect_to_image(jnp.asarray(corners), jnp.asarray(calib.P2))
        ).astype(np.int32)
        # 12 box edges (kitti_data_utils.py:427-437)
        for k in range(4):
            for a, b in [(k, (k + 1) % 4), (k + 4, (k + 1) % 4 + 4), (k, k + 4)]:
                cv2.line(
                    out, tuple(uv[a]), tuple(uv[b]), (255, 0, 255), 2
                )
    return out


def draw_lidar_points_on_image(
    img: np.ndarray,
    pts_velo: np.ndarray,
    calib,
    max_dist: float = 60.0,
) -> np.ndarray:
    """Project LiDAR points into the camera image colored by depth
    (visualization_utils_cv.py:166-206), headless."""
    import cv2
    import jax.numpy as jnp
    import matplotlib.cm as cm

    from ..geometry import calib as C

    out = img.copy()
    pts = jnp.asarray(np.asarray(pts_velo[:, :3], np.float32))
    fov = np.asarray(
        C.lidar_points_in_image_fov(
            pts, jnp.asarray(calib.V2C), jnp.asarray(calib.R0),
            jnp.asarray(calib.P2), 0, 0, img.shape[1], img.shape[0],
        )
    )
    uv = np.asarray(
        C.velo_to_image(
            pts, jnp.asarray(calib.V2C), jnp.asarray(calib.R0),
            jnp.asarray(calib.P2),
        )
    )
    depth = np.linalg.norm(np.asarray(pts_velo[:, :3]), axis=1)
    colors = (cm.jet(np.clip(depth / max_dist, 0, 1))[:, :3] * 255).astype(int)
    for i in np.nonzero(fov)[0]:
        cv2.circle(
            out,
            (int(uv[i, 0]), int(uv[i, 1])),
            1,
            tuple(int(c) for c in colors[i]),
            -1,
        )
    return out


def heights_to_colors(z: np.ndarray) -> np.ndarray:
    """Viridis-style height coloring for reconstructed clouds
    (reconstruct_pointcloud visualization)."""
    z = np.asarray(z, dtype=np.float64)
    zn = (z - z.min()) / max(z.max() - z.min(), 1e-9)
    import matplotlib.cm as cm

    return cm.viridis(zn)[:, :3]


_BOX_EDGES_3D = [
    (0, 1), (1, 2), (2, 3), (3, 0),  # bottom ring
    (4, 5), (5, 6), (6, 7), (7, 4),  # top ring
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def save_lidar_scene_3d(
    points: np.ndarray,
    path: str,
    boxes_lidar: Optional[np.ndarray] = None,
    corners: Optional[np.ndarray] = None,
    max_points: int = 40000,
    color_by: str = "height",
    elev: float = 28.0,
    azim: float = -160.0,
    point_size: float = 0.4,
    highlight_mask: Optional[np.ndarray] = None,
) -> None:
    """Offscreen 3D scene render: LiDAR points + 3D box wireframes.

    Headless replacement for the reference's interactive 3D windows —
    mayavi ``show_lidar_with_boxes`` (`visualization_utils.py:167-198`,
    points colored by height/intensity, GT boxes drawn as 12-edge
    wireframes `draw_gt_boxes3d` :99-134) and the blocking Open3D scenes
    (`scaner_version2.py:180-214`, `reconstruct_pointcloud.py:132-202`)
    — rendered with matplotlib 3D to a PNG so it works on display-less
    TPU hosts.

    Args:
      points: (N, >=3) xyz[+intensity].
      path: output PNG.
      boxes_lidar: optional (M, 7) [x, y, z, h, w, l, yaw] LiDAR-frame
        boxes, converted to corners via geometry.boxes.
      corners: optional precomputed (M, 8, 3) corners (bottom ring 0-3,
        top ring 4-7) — e.g. from ``center_to_corner_box3d``.
      color_by: 'height' | 'intensity' | 'distance'.
      highlight_mask: optional (N,) bool — points drawn in red on top
        (the reconstruct overlay's covered-cells paint,
        reconstruct_pointcloud.py:153-165).
    """
    plt = _plt()
    fig = _lidar_scene_figure(
        plt, points, boxes_lidar=boxes_lidar, corners=corners,
        max_points=max_points, color_by=color_by, elev=elev, azim=azim,
        point_size=point_size, highlight_mask=highlight_mask,
    )
    fig.savefig(path, dpi=110, facecolor="black")
    plt.close(fig)


def _lidar_scene_figure(
    plt,
    points: np.ndarray,
    boxes_lidar: Optional[np.ndarray] = None,
    corners: Optional[np.ndarray] = None,
    max_points: int = 40000,
    color_by: str = "height",
    elev: float = 28.0,
    azim: float = -160.0,
    point_size: float = 0.4,
    highlight_mask: Optional[np.ndarray] = None,
):
    """Build the 3D LiDAR scene figure on the CALLER's pyplot (Agg for
    the offscreen saver, an interactive backend for show_*)."""
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401 (side-effect import)

    pts = np.asarray(points, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[0] == 0:
        pts = np.zeros((1, 4), np.float32)
    hl = (
        np.asarray(highlight_mask, bool)
        if highlight_mask is not None
        else np.zeros(len(pts), bool)
    )
    if len(pts) > max_points:
        idx = np.random.default_rng(0).choice(
            len(pts), size=max_points, replace=False
        )
        pts, hl = pts[idx], hl[idx]

    if color_by == "intensity" and pts.shape[1] >= 4:
        c = pts[:, 3]
    elif color_by == "distance":
        c = np.hypot(pts[:, 0], pts[:, 1])
    else:
        c = pts[:, 2]

    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(111, projection="3d")
    base = ~hl
    ax.scatter(
        pts[base, 0], pts[base, 1], pts[base, 2],
        c=c[base], cmap="viridis", s=point_size, linewidths=0,
    )
    if hl.any():
        ax.scatter(
            pts[hl, 0], pts[hl, 1], pts[hl, 2],
            color="red", s=point_size * 6, linewidths=0,
        )

    if corners is None and boxes_lidar is not None and len(boxes_lidar):
        from ..geometry.boxes import center_to_corner_box3d

        corners = np.asarray(
            center_to_corner_box3d(np.asarray(boxes_lidar, np.float32))
        )
    if corners is not None:
        for box in np.asarray(corners):
            for a, b in _BOX_EDGES_3D:
                ax.plot(
                    [box[a, 0], box[b, 0]],
                    [box[a, 1], box[b, 1]],
                    [box[a, 2], box[b, 2]],
                    color="lime", linewidth=1.2,
                )

    # Equal-ish aspect: matplotlib 3D has no set_aspect('equal'); use a
    # bounding cube over the 2nd-98th percentile extent so a handful of
    # far returns doesn't shrink the whole scene.
    lo = np.percentile(pts[:, :3], 2, axis=0)
    hi = np.percentile(pts[:, :3], 98, axis=0)
    span = float(max((hi - lo).max(), 2.0)) / 2.0
    mid = (hi + lo) / 2.0
    ax.set_xlim(mid[0] - span, mid[0] + span)
    ax.set_ylim(mid[1] - span, mid[1] + span)
    ax.set_zlim(mid[2] - span / 2, mid[2] + span / 2)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    ax.set_facecolor("black")
    fig.patch.set_facecolor("black")
    fig.tight_layout()
    return fig


HAVE_OPEN3D = True
try:  # optional: interactive windows need a display + open3d
    import open3d as _o3d  # noqa: F401
except Exception:  # pragma: no cover - exercised on open3d-less hosts
    HAVE_OPEN3D = False


def show_lidar_scene_3d(
    points: np.ndarray,
    boxes_lidar: Optional[np.ndarray] = None,
    corners: Optional[np.ndarray] = None,
    highlight_mask: Optional[np.ndarray] = None,
    window_name: str = "distropointclouds",
) -> None:
    """Interactive 3D window: LiDAR points + 3D box wireframes.

    The interactive twin of :func:`save_lidar_scene_3d` — the
    reference's blocking Open3D scenes (`scaner_version2.py:180-214`,
    `reconstruct_pointcloud.py:132-202`: base points gray, covered
    cells painted red) and mayavi `show_lidar_with_boxes`
    (`visualization_utils.py:167-198`). Uses open3d when importable
    (same geometry objects: PointCloud + 12-edge LineSets); falls back
    to an interactive matplotlib window on hosts with a display but no
    open3d. On display-less TPU hosts raise with a pointer to the
    offscreen renderer instead of hanging in a windowing call.

    Args mirror :func:`save_lidar_scene_3d` (points (N, >=3);
    boxes_lidar (M, 7) or precomputed corners (M, 8, 3);
    highlight_mask paints points red, the reconstruct overlay).
    """
    pts = np.asarray(points, dtype=np.float64)[:, :3]
    hl = (
        np.asarray(highlight_mask, bool)
        if highlight_mask is not None
        else np.zeros(len(pts), bool)
    )
    if corners is None and boxes_lidar is not None and len(boxes_lidar):
        from ..geometry.boxes import center_to_corner_box3d

        corners = np.asarray(
            center_to_corner_box3d(np.asarray(boxes_lidar, np.float32))
        )

    if HAVE_OPEN3D:
        pcd = _o3d.geometry.PointCloud()
        pcd.points = _o3d.utility.Vector3dVector(pts)
        colors = np.full((len(pts), 3), 0.6)
        colors[hl] = (1.0, 0.0, 0.0)  # reconstruct_pointcloud.py:158-165
        pcd.colors = _o3d.utility.Vector3dVector(colors)
        geoms = [pcd]
        if corners is not None:
            for box in np.asarray(corners, np.float64):
                ls = _o3d.geometry.LineSet()
                ls.points = _o3d.utility.Vector3dVector(box)
                ls.lines = _o3d.utility.Vector2iVector(
                    np.asarray(_BOX_EDGES_3D, np.int32)
                )
                ls.colors = _o3d.utility.Vector3dVector(
                    np.tile((0.0, 1.0, 0.0), (len(_BOX_EDGES_3D), 1))
                )
                geoms.append(ls)
        _o3d.visualization.draw_geometries(geoms, window_name=window_name)
        return

    import os

    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")):
        raise RuntimeError(
            "show_lidar_scene_3d needs open3d or a display; on headless "
            "hosts use save_lidar_scene_3d(...) to render the same scene "
            "to a PNG."
        )
    import matplotlib

    matplotlib.use("TkAgg", force=True)
    import matplotlib.pyplot as plt

    # Same scene construction as the offscreen saver, but on a live
    # backend: the window is rotatable/zoomable like the reference's
    # mayavi/Open3D scenes.
    fig = _lidar_scene_figure(
        plt, np.asarray(points), corners=corners,
        highlight_mask=highlight_mask,
    )
    fig.canvas.manager.set_window_title(window_name)
    plt.show()
