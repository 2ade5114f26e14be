"""Streaming scan-context API: the jittable replacement for the ROS node.

`scan_context_node.py:191-312` subscribes to ``/velodyne_points``
(best-effort QoS, keep-last 5), voxel-downsamples each cloud, computes
the descriptor, and saves ``sc_<stem>.npy`` + a viridis PNG per message.
Here the same behavior is a host-side stream wrapper around ONE compiled
XLA program (downsample -> descriptor [-> detector]), with:

- the node's full parameter surface (scan_context_node.py:196-207)
  mapped onto :class:`StreamConfig`;
- a keep-last-N drop-oldest inbox mirroring the QoS depth;
- skip-and-log on malformed/empty clouds (the node's per-message
  try/except, scan_context_node.py:278-291 — SURVEY §5 failure
  handling);
- optional .npy / PNG persistence identical in layout to the node's.

No ROS dependency: feed it (N, 3) numpy arrays from any transport.
"""

from __future__ import annotations

import collections
import dataclasses
import logging
import os
import time
from typing import Callable, Deque, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EdgePolicy, ScanContextConfig
from ..core.types import PointBatch
from ..ops.voxel import voxel_downsample

logger = logging.getLogger("distropointclouds_tpu.stream")


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Mirror of the 12 ROS parameters (scan_context_node.py:196-207)."""

    topic: str = "/velodyne_points"  # transport hint only
    voxel_size: float = 0.20
    max_length: float = 80.0
    sector_res: int = 720
    ring_res: int = 160
    use_full_height_range: bool = True
    custom_height_offset: float = 2.0
    visualize: bool = False
    store_pointcloud_png: bool = False
    output_dir: str = "scan_results"
    dl_images_dir: str = "scan_dl_images_live"
    cmap: str = "viridis"
    # Stream extras
    queue_depth: int = 5  # QoS keep-last depth (scan_context_node.py:236-241)
    max_points: int = 131072
    # Named descriptor profile override. None = the node's semantics
    # built from the ROS-parameter fields above; "golden_v2" makes the
    # stream a drop-in for the scaner_version2.py batch job (clamp
    # edges, zero substitution, max_length 20, no downsample) so its
    # output matches the golden sc_*.npy fixtures.
    profile: Optional[str] = None

    def scan_context_config(self) -> ScanContextConfig:
        if self.profile is not None:
            base = getattr(ScanContextConfig, self.profile)()
            return dataclasses.replace(base, max_points=self.max_points)
        return ScanContextConfig(
            num_ring=self.ring_res,
            num_sector=self.sector_res,
            max_length=self.max_length,
            edge_policy=EdgePolicy.DROP,  # node semantics (r <= max_length)
            use_full_height_range=self.use_full_height_range,
            height_offset=self.custom_height_offset,
            zero_substitution=False,
            voxel_size=self.voxel_size,
            max_points=self.max_points,
        )


class ScanContextStream:
    """Push (N, 3) clouds in, get descriptors out — one compiled program."""

    def __init__(
        self,
        cfg: StreamConfig = StreamConfig(),
        save: bool = False,
        on_result: Optional[Callable[[str, np.ndarray], None]] = None,
        impl: Optional[str] = None,
    ):
        """impl: descriptor implementation override ("bitonic" |
        "sort_route"); None = auto (bitonic on TPU, sort_route
        elsewhere — same dispatch as ops.scan_context). The override
        exists so the TPU branch is testable on the CPU backend (both
        are bit-identical)."""
        self.cfg = cfg
        self.sc_cfg = cfg.scan_context_config()
        self.save = save
        self.on_result = on_result
        self._inbox: Deque[Tuple[str, np.ndarray]] = collections.deque(
            maxlen=cfg.queue_depth
        )
        self.stats = {"received": 0, "processed": 0, "skipped": 0, "dropped": 0}

        sc_cfg = self.sc_cfg
        voxel = sc_cfg.voxel_size  # profile-authoritative (0 = off)

        def program(points: PointBatch) -> jnp.ndarray:
            xyz = points.xyzi[..., :3]
            valid = points.valid_mask()
            if voxel > 0:
                xyz, valid = voxel_downsample(xyz, valid, voxel)
            # Same auto dispatch as ops.scan_context: the bitonic VMEM
            # kernel on TPU, the sort+routing path elsewhere (all
            # bit-identical).
            chosen = impl or (
                "bitonic" if jax.default_backend() == "tpu" else "sort_route"
            )
            if chosen == "bitonic":
                from ..ops.bitonic import scan_context_bitonic

                return scan_context_bitonic(xyz, valid, sc_cfg)
            from ..ops.scan_context import scan_context_sort_route

            return scan_context_sort_route(xyz, valid, sc_cfg)

        self._program = jax.jit(program)

    # -- ingestion -----------------------------------------------------
    def push(self, xyz: np.ndarray, stem: Optional[str] = None) -> None:
        """Enqueue a cloud (drop-oldest beyond queue_depth)."""
        self.stats["received"] += 1
        if stem is None:
            stem = f"frame_{self.stats['received']:06d}_{time.time():.6f}"
        if len(self._inbox) == self._inbox.maxlen:
            self.stats["dropped"] += 1
        self._inbox.append((stem, xyz))

    def drain(self) -> List[Tuple[str, np.ndarray]]:
        """Process everything queued; returns [(stem, descriptor)]."""
        out = []
        while self._inbox:
            stem, xyz = self._inbox.popleft()
            r = self.process_one(xyz, stem)
            if r is not None:
                out.append((stem, r))
        return out

    # -- processing ----------------------------------------------------
    def process_one(
        self, xyz: np.ndarray, stem: str = "frame"
    ) -> Optional[np.ndarray]:
        """Compute one descriptor; skip-and-log on malformed input."""
        try:
            xyz = np.asarray(xyz, dtype=np.float32)
            if xyz.ndim != 2 or xyz.shape[-1] < 3 or xyz.shape[0] == 0:
                logger.warning("empty/malformed cloud %s; skipping", stem)
                self.stats["skipped"] += 1
                return None
            pb = PointBatch.from_numpy(xyz[:, :3], self.sc_cfg.max_points)
            sc = np.asarray(self._program(pb))
            self.stats["processed"] += 1
            if self.save:
                self._persist(stem, sc)
            if self.on_result is not None:
                self.on_result(stem, sc)
            return sc
        except Exception:  # pragma: no cover - defensive skip-and-log
            logger.exception("processing error on %s; skipping", stem)
            self.stats["skipped"] += 1
            return None

    # -- persistence (node-compatible layout) --------------------------
    def _persist(self, stem: str, sc: np.ndarray) -> None:
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        np.save(
            os.path.join(self.cfg.output_dir, f"sc_{stem}.npy"),
            sc.astype(np.float32),
        )
        if self.cfg.store_pointcloud_png or self.cfg.visualize:
            try:
                from ..utils.viz import save_descriptor_png

                os.makedirs(self.cfg.dl_images_dir, exist_ok=True)
                save_descriptor_png(
                    sc,
                    os.path.join(self.cfg.dl_images_dir, f"sc_{stem}.png"),
                    cmap=self.cfg.cmap,
                )
            except Exception:  # matplotlib optional
                logger.warning("PNG save unavailable", exc_info=True)
