"""ROS 2 adapter: a thin rclpy shim over :class:`ScanContextStream`.

The reference is a full ROS 2 node (`scan_context_node.py:191-312`):
subscribe ``sensor_msgs/PointCloud2`` on ``/velodyne_points`` with
best-effort keep-last-5 QoS (:236-243), extract xyz per message
(:249-276), compute + persist the descriptor (:278-291). The TPU
framework keeps all of that logic transport-free in
``stream/pipeline.py``; this module is only the transport binding —
import-guarded so the package works on ROS-less TPU hosts, and the
PointCloud2 decoding is pure numpy so it is testable without ROS.

Run: ``python -m distropointclouds_tpu.cli ros-node`` or
``python -m distropointclouds_tpu.stream.ros_node`` on a host with
rclpy sourced.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from .pipeline import ScanContextStream, StreamConfig

logger = logging.getLogger("distropointclouds_tpu.ros")

try:  # pragma: no cover - exercised only on ROS hosts
    import rclpy
    from rclpy.node import Node
    from rclpy.qos import (
        HistoryPolicy,
        QoSProfile,
        ReliabilityPolicy,
    )
    from sensor_msgs.msg import PointCloud2

    HAVE_ROS = True
except Exception:  # rclpy not installed — adapter stays importable
    HAVE_ROS = False
    Node = object  # type: ignore[assignment,misc]

# PointCloud2 field datatypes (sensor_msgs/PointField constants) -> numpy.
_POINTFIELD_DTYPES = {
    1: np.int8,
    2: np.uint8,
    3: np.int16,
    4: np.uint16,
    5: np.int32,
    6: np.uint32,
    7: np.float32,
    8: np.float64,
}


def extract_xyz(msg) -> np.ndarray:
    """(N, 3) float32 xyz from a PointCloud2(-like) message.

    Fast path: ``sensor_msgs_py.point_cloud2.read_points_numpy``
    (the reference's fast path, scan_context_node.py:252-259). Fallback:
    a pure-numpy structured-dtype view over ``msg.data`` using the
    declared field offsets — no ROS helper needed, which also makes this
    function unit-testable with a duck-typed message.
    """
    try:  # pragma: no cover - needs sensor_msgs_py
        from sensor_msgs_py import point_cloud2 as pc2

        arr = pc2.read_points_numpy(
            msg, field_names=("x", "y", "z"), skip_nans=True
        )
        return np.ascontiguousarray(arr, dtype=np.float32).reshape(-1, 3)
    except Exception:
        pass

    fields = {f.name: f for f in msg.fields}
    for name in ("x", "y", "z"):
        if name not in fields:
            raise ValueError(f"PointCloud2 missing field {name!r}")
    names, formats, offsets = [], [], []
    for name in ("x", "y", "z"):
        f = fields[name]
        names.append(name)
        formats.append(_POINTFIELD_DTYPES[int(f.datatype)])
        offsets.append(int(f.offset))
    dtype = np.dtype(
        {"names": names, "formats": formats, "offsets": offsets,
         "itemsize": int(msg.point_step)}
    )
    n = len(msg.data) // int(msg.point_step)
    rec = np.frombuffer(bytes(msg.data), dtype=dtype, count=n)
    xyz = np.stack(
        [rec["x"], rec["y"], rec["z"]], axis=-1
    ).astype(np.float32)
    finite = np.isfinite(xyz).all(axis=-1)  # skip_nans semantics
    return xyz[finite]


class ScanContextRosNode(Node):  # pragma: no cover - needs rclpy
    """The live node: declares the reference's 12 parameters
    (scan_context_node.py:196-207), subscribes with best-effort
    keep-last QoS (:236-243), and forwards each cloud to the compiled
    stream pipeline (skip-and-log stays in ScanContextStream)."""

    def __init__(self):
        super().__init__("scan_context_node")
        defaults = StreamConfig()
        declared = {
            "topic": defaults.topic,
            "voxel_size": defaults.voxel_size,
            "max_length": defaults.max_length,
            "sector_res": defaults.sector_res,
            "ring_res": defaults.ring_res,
            "use_full_height_range": defaults.use_full_height_range,
            "custom_height_offset": defaults.custom_height_offset,
            "visualize": defaults.visualize,
            "store_pointcloud_png": defaults.store_pointcloud_png,
            "output_dir": defaults.output_dir,
            "dl_images_dir": defaults.dl_images_dir,
            "cmap": defaults.cmap,
        }
        for name, default in declared.items():
            self.declare_parameter(name, default)
        values = {
            name: self.get_parameter(name).value for name in declared
        }
        self.stream_cfg = StreamConfig(**values)
        self.stream = ScanContextStream(self.stream_cfg, save=True)

        qos = QoSProfile(
            reliability=ReliabilityPolicy.BEST_EFFORT,
            history=HistoryPolicy.KEEP_LAST,
            depth=self.stream_cfg.queue_depth,
        )
        self.create_subscription(
            PointCloud2, self.stream_cfg.topic, self._cb, qos
        )
        self.get_logger().info(
            f"scan_context_node listening on {self.stream_cfg.topic} "
            f"(ring={self.stream_cfg.ring_res}, "
            f"sector={self.stream_cfg.sector_res})"
        )

    def _cb(self, msg) -> None:
        try:
            xyz = extract_xyz(msg)
        except Exception:
            self.get_logger().warning("undecodable cloud; skipping")
            self.stream.stats["skipped"] += 1
            return
        stamp = msg.header.stamp
        stem = f"{msg.header.frame_id}_{stamp.sec}_{stamp.nanosec}"
        self.stream.push(xyz, stem)
        self.stream.drain()


def main(args: Optional[list] = None) -> int:  # pragma: no cover
    if not HAVE_ROS:
        raise SystemExit(
            "rclpy is not available — this adapter needs a sourced ROS 2 "
            "environment. The transport-free API (stream.pipeline."
            "ScanContextStream) provides the same processing without ROS."
        )
    rclpy.init(args=args)
    node = ScanContextRosNode()
    try:
        rclpy.spin(node)
    except KeyboardInterrupt:
        pass
    finally:
        node.destroy_node()
        rclpy.shutdown()
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
