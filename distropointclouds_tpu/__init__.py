"""distropointclouds_tpu: a TPU-native LiDAR perception framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
armando-genis/DistroPointclouds (Scan Context descriptor pipeline,
pedestrian segmentation/detection CNNs, descriptor inversion, KITTI data
tooling, streaming API) designed for TPU hardware: static shapes,
scatter-free sort-based binning, NHWC convs on the MXU, and data-parallel
training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .core.config import (
    DetectorConfig,
    EdgePolicy,
    MeshConfig,
    PipelineConfig,
    ScanContextConfig,
    TrainConfig,
)
from .core.types import Detections, PointBatch

__all__ = [
    "DetectorConfig",
    "EdgePolicy",
    "MeshConfig",
    "PipelineConfig",
    "ScanContextConfig",
    "TrainConfig",
    "Detections",
    "PointBatch",
]
