"""Runtime validation: NaN/bounds checking for kernels (SURVEY §5).

The reference's only quality control is prints; its latent hazards
(concurrent dataset writes, silent out-of-range indices) are designed
out here, and this module adds the *active* checks: ``checkify``-wrapped
kernels that report NaN/Inf inputs and out-of-range bins instead of
silently clamping, for use in debugging and data validation (not the
hot path — checks cost a pass over the data).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..core.config import ScanContextConfig
from ..core.types import PointBatch
from ..ops.scan_context import polar_bin_indices, scan_context


def checked_scan_context(
    points: PointBatch,
    cfg: ScanContextConfig = ScanContextConfig(),
) -> Tuple[checkify.Error, jnp.ndarray]:
    """Descriptor with input validation: errors on non-finite coordinates
    among live points and on bin indices escaping the grid.

    Returns (error, grid); call ``error.throw()`` to raise on failure.
    """

    def fn(points: PointBatch):
        xyz = points.xyzi[..., :3]
        valid = points.valid_mask()
        finite = jnp.all(jnp.where(valid[..., None], jnp.isfinite(xyz), True))
        checkify.check(finite, "non-finite coordinates among live points")
        ring, sector, _, v = polar_bin_indices(xyz, valid, cfg)
        ring_ok = jnp.all(
            jnp.where(v, (ring >= 0) & (ring < cfg.num_ring), True)
        )
        sector_ok = jnp.all(
            jnp.where(v, (sector >= 0) & (sector < cfg.num_sector), True)
        )
        checkify.check(ring_ok, "ring index out of range")
        checkify.check(sector_ok, "sector index out of range")
        return scan_context(points, cfg)

    checked = checkify.checkify(fn, errors=checkify.user_checks)
    return checked(points)


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side guard: raise if any leaf contains NaN/Inf (used by the
    trainer to catch divergence early)."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
