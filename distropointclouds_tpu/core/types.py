"""Core array-container types (JAX pytrees).

TPU programs need static shapes, so variable-length point clouds are
carried as fixed-size padded buffers plus a live-point count — the
foundational layout decision of this framework (SURVEY §7 step 1). The
reference passes raw ``(N, 4)`` numpy arrays around
(`scaner_version2.py:57-62`); here a scan is a ``PointBatch``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PointBatch:
    """A batch of fixed-size padded LiDAR scans.

    Attributes:
      xyzi:  [..., max_points, 4] float32 — x, y, z, intensity. Padded
             entries are zeros and must be ignored via ``count``.
      count: [...] int32 — number of live points per scan.
    """

    xyzi: jax.Array
    count: jax.Array

    @property
    def xyz(self) -> jax.Array:
        return self.xyzi[..., :3]

    @property
    def max_points(self) -> int:
        return self.xyzi.shape[-2]

    def valid_mask(self) -> jax.Array:
        """[..., max_points] bool — True for live points."""
        n = self.xyzi.shape[-2]
        idx = jnp.arange(n)
        return idx < self.count[..., None]

    @staticmethod
    def from_numpy(points: np.ndarray, max_points: int) -> "PointBatch":
        """Pad/truncate a single (N, C) scan to a fixed-size buffer."""
        points = np.asarray(points, dtype=np.float32)
        if points.ndim != 2:
            raise ValueError(f"expected (N, C) points, got {points.shape}")
        n, c = points.shape
        if c == 3:  # tolerate xyz-only input; intensity = 0
            points = np.concatenate(
                [points, np.zeros((n, 1), np.float32)], axis=1
            )
        n = min(n, max_points)
        buf = np.zeros((max_points, 4), np.float32)
        buf[:n] = points[:n]
        return PointBatch(xyzi=jnp.asarray(buf), count=jnp.asarray(n, jnp.int32))

    @staticmethod
    def stack(batches: list["PointBatch"]) -> "PointBatch":
        return PointBatch(
            xyzi=jnp.stack([b.xyzi for b in batches]),
            count=jnp.stack([b.count for b in batches]),
        )


@struct.dataclass
class Detections:
    """Fixed-capacity detection set in descriptor space.

    Attributes:
      ring:   [..., K] float32 — center ring index (may be fractional).
      sector: [..., K] float32 — center sector index.
      score:  [..., K] float32 — confidence (or area in pixels for
              connected-component detections, matching
              `tiny_sc_ped.py:196-215`).
      valid:  [..., K] bool.
    """

    ring: jax.Array
    sector: jax.Array
    score: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.ring.shape[-1]

    def to_list(self) -> list[dict]:
        """Host-side export matching the reference's detection JSON schema
        (`tiny_sc_ped.py:210-214`)."""
        ring = np.asarray(self.ring)
        sector = np.asarray(self.sector)
        score = np.asarray(self.score)
        valid = np.asarray(self.valid)
        if ring.ndim != 1:
            raise ValueError("to_list expects a single (unbatched) Detections")
        out = []
        for r, s, sc, v in zip(ring, sector, score, valid):
            if v:
                out.append(
                    {
                        "center_ring_idx": float(r),
                        "center_sector_idx": float(s),
                        "score": float(sc),
                    }
                )
        return out
