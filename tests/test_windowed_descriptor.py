"""Azimuth-windowed Pallas descriptor: parity in interpret mode.

The kernel's fast path assumes LiDAR azimuth ordering; correctness must
NOT — the straggler fallback covers arbitrary orderings. Both paths are
exercised here against the golden fixtures and the sorted reference
implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.core.config import ScanContextConfig
from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.ops.pallas_kernels import scan_context_windowed
from distropointclouds_tpu.ops.scan_context import scan_context_sorted


def _padded(scan, max_points):
    xyz = np.zeros((max_points, 3), np.float32)
    n = min(len(scan), max_points)
    xyz[:n] = scan[:n, :3]
    valid = np.arange(max_points) < n
    return xyz, valid


@pytest.mark.parametrize("scan_id", fixtures.GOLDEN_IDS)
def test_windowed_golden_parity(reference_available, scan_id):
    cfg = ScanContextConfig.golden_v2()
    xyz, valid = _padded(fixtures.golden_scan(scan_id), cfg.max_points)
    grid = np.asarray(
        scan_context_windowed(
            jnp.asarray(xyz), jnp.asarray(valid), cfg, interpret=True
        )
    )
    golden = fixtures.golden_descriptor(scan_id)
    assert (grid != golden).sum() <= 10


def test_windowed_shuffled_input(reference_available):
    """Fully shuffled points (worst case for the window assumption) must
    still be exact via the straggler fallback."""
    cfg = ScanContextConfig.golden_v2()
    xyz, valid = _padded(fixtures.golden_scan("000840"), cfg.max_points)
    perm = np.random.default_rng(0).permutation(cfg.max_points)
    grid = np.asarray(
        scan_context_windowed(
            jnp.asarray(xyz[perm]), jnp.asarray(valid[perm]), cfg,
            interpret=True,
        )
    )
    golden = fixtures.golden_descriptor("000840")
    np.testing.assert_array_equal(grid, golden)


@pytest.mark.parametrize(
    "profile",
    [ScanContextConfig.ros_node(), ScanContextConfig.scaner_v1()],
    ids=["ros_node", "scaner_v1"],
)
def test_windowed_matches_sorted_random(rng, profile):
    cfg = profile
    n = 4096
    xyz = rng.uniform(-60, 60, size=(n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(-3, 4, size=n)
    valid = np.arange(n) < n - 256
    a = np.asarray(
        scan_context_windowed(
            jnp.asarray(xyz), jnp.asarray(valid), cfg, interpret=True
        )
    )
    b = np.asarray(
        scan_context_sorted(jnp.asarray(xyz), jnp.asarray(valid), cfg)
    )
    np.testing.assert_array_equal(a, b)


def test_windowed_empty_and_batched(rng):
    cfg = ScanContextConfig.golden_v2()
    xyz = np.zeros((2, 2048, 3), np.float32)
    xyz[1] = rng.uniform(-15, 15, size=(2048, 3)).astype(np.float32)
    valid = np.zeros((2, 2048), bool)
    valid[1] = True
    grids = np.asarray(
        scan_context_windowed(
            jnp.asarray(xyz), jnp.asarray(valid), cfg, interpret=True
        )
    )
    assert grids.shape == (2, 160, 720)
    np.testing.assert_array_equal(grids[0], 0.0)
    ref = np.asarray(
        scan_context_sorted(
            jnp.asarray(xyz[1]), jnp.asarray(valid[1]), cfg
        )
    )
    np.testing.assert_array_equal(grids[1], ref)
