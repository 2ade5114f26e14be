"""Legacy Complex-YOLO BEV constants (`distro_model/config/kitti_config.py`).

Kept as a frozen dataclass (jit-static) instead of module globals; the
averaged-calibration matrices are provided as functions returning
arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

CLASS_LIST = ("Car", "Pedestrian", "Cyclist")
COLORS = ((0, 255, 255), (0, 0, 255), (255, 0, 0))


@dataclasses.dataclass(frozen=True)
class Boundary:
    """Point-cloud crop box (kitti_config.py:14-31)."""

    min_x: float = 0.0
    max_x: float = 50.0
    min_y: float = -25.0
    max_y: float = 25.0
    min_z: float = -2.73
    max_z: float = 1.27

    @staticmethod
    def front() -> "Boundary":
        return Boundary()

    @staticmethod
    def back() -> "Boundary":
        return Boundary(min_x=-50.0, max_x=0.0)


@dataclasses.dataclass(frozen=True)
class BevConfig:
    """BEV rasterization geometry (kitti_config.py:33-36)."""

    width: int = 608   # across y: -25 .. 25 m
    height: int = 608  # across x: 0 .. 50 m
    boundary: Boundary = Boundary()
    max_points: int = 131072

    @property
    def discretization(self) -> float:
        return (self.boundary.max_x - self.boundary.min_x) / self.height


def mean_calibration() -> dict:
    """KITTI-train-average calibration matrices (kitti_config.py:42-65),
    as 4x4 / 3x4 float arrays for the no-per-frame-calib code paths."""
    Tr_velo_to_cam = np.array(
        [
            [7.49916597e-03, -9.99971248e-01, -8.65110297e-04, -6.71807577e-03],
            [1.18652889e-02, 9.54520517e-04, -9.99910318e-01, -7.33152811e-02],
            [9.99882833e-01, 7.49141178e-03, 1.18719929e-02, -2.78557062e-01],
            [0, 0, 0, 1],
        ]
    )
    R0 = np.array(
        [
            [0.99992475, 0.00975976, -0.00734152, 0],
            [-0.0097913, 0.99994262, -0.00430371, 0],
            [0.00729911, 0.0043753, 0.99996319, 0],
            [0, 0, 0, 1],
        ]
    )
    P2 = np.array(
        [
            [719.787081, 0.0, 608.463003, 44.9538775],
            [0.0, 719.787081, 174.545111, 0.1066855],
            [0.0, 0.0, 1.0, 3.0106472e-03],
            [0.0, 0.0, 0.0, 0],
        ]
    )
    return {
        "Tr_velo_to_cam": Tr_velo_to_cam,
        "R0": R0,
        "P2": P2,
        "R0_inv": np.linalg.inv(R0),
        "Tr_velo_to_cam_inv": np.linalg.inv(Tr_velo_to_cam),
        "P2_inv": np.linalg.pinv(P2),
    }
