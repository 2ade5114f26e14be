"""Device mesh construction and sharding rules.

The reference's "distributed" support is a never-enabled
``DistributedSampler`` flag (`kitti_dataloader.py:41-42`,
`train_config.py:88` hardcodes ``distributed=False``) plus unused
``torch.distributed`` imports (`data_preparation.py:12-14`). Here
parallelism is first-class and TPU-native (SURVEY §2.4):

- ``data`` axis: batch (scans) sharded across chips; gradients are
  reduced by XLA-inserted all-reduces over ICI (jit + sharded inputs +
  replicated params do this automatically — no NCCL analog needed).
- ``sector`` axis: the polar analog of sequence parallelism. The
  descriptor grid's 720-sector axis is sharded; XLA inserts the halo
  exchanges that circular (polar) convolution padding requires via
  collective-permute. Useful when descriptor resolution outgrows one
  chip; size 1 by default.

Multi-host: call :func:`initialize_distributed` once per process, then
build the mesh over ``jax.devices()`` (all hosts' devices); per-host
input sharding uses ``jax.process_index()``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig


def make_mesh(
    cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'sector') mesh. With cfg.data == 0, all available
    devices go to the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    data = cfg.data if cfg.data > 0 else len(devices) // max(cfg.sector, 1)
    n = data * cfg.sector
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{cfg.sector} needs {n} devices, have {len(devices)}"
        )
    arr = np.array(devices[:n]).reshape(data, cfg.sector)
    return Mesh(arr, axis_names=("data", "sector"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scans sharded over 'data'; points within a scan replicated over
    'sector' (each shard bins all its scans' points)."""
    return NamedSharding(mesh, P("data"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """[B, R, S] descriptor grids: batch over 'data', sectors over
    'sector'."""
    return NamedSharding(mesh, P("data", None, "sector"))


def activation_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] NHWC activations: batch over 'data', width (sector
    axis) over 'sector'. XLA/GSPMD handles conv halo exchange."""
    return NamedSharding(mesh, P("data", None, "sector", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """device_put a host pytree with the batch axis sharded over 'data'."""
    return jax.device_put(tree, batch_sharding(mesh))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (`jax.distributed.initialize`). Single-process
    setups (including the 8-device CPU test mesh) need not call this."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """Deterministic per-host slice of a file list (the input-pipeline
    analog of DistributedSampler: each host reads its own stripe)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]
