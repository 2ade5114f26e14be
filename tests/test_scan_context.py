"""Descriptor kernel tests: golden parity + cross-implementation checks.

Acceptance criterion (SURVEY §2.2, *verified* during the survey): exact
equality with the golden ``sc_*.npy`` except bin-boundary cells — at most
a handful of cells per scan whose point sits exactly on a ring/sector
edge under float32 casting rules. We assert >= 115,190 / 115,200 cells
bit-exact per scan and that every mismatching cell's value is explainable
by a neighboring-bin point (the golden value appears in an adjacent cell
of our grid or vice versa, or both cells changed by a tiny height).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distropointclouds_tpu.core.config import EdgePolicy, ScanContextConfig
from distropointclouds_tpu.core.types import PointBatch
from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.ops.scan_context import (
    scan_context,
    scan_context_scatter,
    scan_context_sorted,
)


def numpy_reference_clamp(xyz, cfg: ScanContextConfig):
    """Independent numpy model of scaner_version2.py:64-115 semantics."""
    x = xyz[:, 0].astype(np.float32)
    y = xyz[:, 1].astype(np.float32)
    z = xyz[:, 2].astype(np.float32)
    if cfg.zero_substitution:
        x = np.where(x == 0, np.float32(0.001), x)
        y = np.where(y == 0, np.float32(0.001), y)
    if not cfg.use_full_height_range:
        z = z + np.float32(cfg.height_offset)
    theta = np.rad2deg(np.arctan2(y, x)) % np.float32(360.0)
    r = np.sqrt(x * x + y * y)
    ring = np.minimum(r // np.float32(cfg.gap_ring), cfg.num_ring - 1).astype(np.int32)
    sector = (theta // np.float32(cfg.gap_sector)).astype(np.int32)
    sector = np.clip(sector, 0, cfg.num_sector - 1)
    fill = -np.inf if cfg.use_full_height_range else 0.0
    sc = np.full(cfg.grid_shape, fill, dtype=np.float32)
    np.maximum.at(sc, (ring, sector), z)
    if cfg.use_full_height_range:
        sc = np.where(np.isneginf(sc), 0.0, sc).astype(np.float32)
    return sc


def mismatch_is_boundary_explainable(ours, golden, rr, ss, cfg):
    """A differing cell is a bin-boundary artifact if the missing value
    shows up in one of the 4 adjacent bins of the other grid."""
    R, S = cfg.grid_shape
    neighbors = [
        (min(rr + 1, R - 1), ss),
        (max(rr - 1, 0), ss),
        (rr, (ss + 1) % S),
        (rr, (ss - 1) % S),
    ]
    gv, ov = golden[rr, ss], ours[rr, ss]
    for nr, nc in neighbors:
        if ours[nr, nc] == gv or golden[nr, nc] == ov:
            return True
    # Or the same cell only moved by the height of one straddling point.
    return abs(gv - ov) < 0.05


@pytest.mark.parametrize("scan_id", fixtures.GOLDEN_IDS)
@pytest.mark.parametrize("impl", ["sort", "scatter", "sort_route", "bitonic"])
def test_golden_parity(reference_available, scan_id, impl):
    """All four impls, including the TPU-production "bitonic" path at
    full scale (2^17 points, 160x720 grid) via its CPU XLA body — the
    exact math the Mosaic kernel compiles (ops/bitonic.py:215-224)."""
    cfg = ScanContextConfig.golden_v2()
    raw = fixtures.golden_scan(scan_id)
    golden = fixtures.golden_descriptor(scan_id)
    pb = PointBatch.from_numpy(raw, cfg.max_points)
    ours = np.asarray(scan_context(pb, cfg, impl=impl))

    assert ours.shape == golden.shape == (160, 720)
    mismatch = ours != golden
    n_bad = int(mismatch.sum())
    # Survey-verified tolerance: <= 3 boundary cells/scan for the numpy
    # recompute; allow headroom for jnp-vs-numpy float32 ulp differences.
    assert n_bad <= 10, f"{scan_id}: {n_bad} mismatching cells"
    for rr, ss in zip(*np.nonzero(mismatch)):
        assert mismatch_is_boundary_explainable(ours, golden, rr, ss, cfg), (
            f"{scan_id}: unexplained mismatch at ({rr},{ss}): "
            f"ours={ours[rr, ss]} golden={golden[rr, ss]}"
        )


@pytest.mark.parametrize(
    "profile",
    [
        ScanContextConfig.golden_v2(),
        ScanContextConfig.ros_node(),
        ScanContextConfig.scaner_v1(),
    ],
    ids=["golden_v2", "ros_node", "scaner_v1"],
)
def test_sort_equals_scatter_random(rng, profile):
    """The scatter-free path must agree exactly with the XLA scatter
    baseline on random clouds under every profile."""
    n = 4096
    xyz = rng.uniform(-30, 30, size=(n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(-3, 5, size=n).astype(np.float32)
    # Sprinkle exact zeros to exercise the substitution path.
    xyz[:64, 0] = 0.0
    xyz[64:128, 1] = 0.0
    valid = np.arange(n) < (n - 512)  # include padding
    a = np.asarray(scan_context_sorted(jnp.asarray(xyz), jnp.asarray(valid), profile))
    b = np.asarray(scan_context_scatter(jnp.asarray(xyz), jnp.asarray(valid), profile))
    np.testing.assert_array_equal(a, b)


def test_matches_numpy_model_random(rng):
    cfg = ScanContextConfig.golden_v2()
    n = 8192
    xyz = rng.uniform(-25, 25, size=(n, 3)).astype(np.float32)
    expected = numpy_reference_clamp(xyz, cfg)
    got = np.asarray(
        scan_context_sorted(jnp.asarray(xyz), jnp.ones(n, dtype=bool), cfg)
    )
    # float32 polar math matches numpy's except possible ulp boundary
    # flips; on random (continuous) data those have probability ~0.
    np.testing.assert_array_equal(got, expected)


def test_empty_cloud_is_zero_grid():
    """scan_context_node.py:107-108: empty input -> zeros(R, S)."""
    cfg = ScanContextConfig.golden_v2()
    pb = PointBatch.from_numpy(np.zeros((0, 4), np.float32), 1024)
    out = np.asarray(scan_context(pb, cfg))
    assert out.shape == (160, 720)
    np.testing.assert_array_equal(out, np.zeros((160, 720), np.float32))


def test_single_point():
    cfg = ScanContextConfig.golden_v2()
    pt = np.array([[1.0, 1.0, -1.5, 0.0]], np.float32)
    pb = PointBatch.from_numpy(pt, 16)
    out = np.array(scan_context(pb, cfg))
    r = np.sqrt(2.0)
    ring = int(min(np.float32(r) // np.float32(cfg.gap_ring), 159))
    sector = int(np.float32(45.0) // np.float32(cfg.gap_sector))
    assert out[ring, sector] == np.float32(-1.5)
    out[ring, sector] = 0
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_clamp_puts_far_points_in_outer_ring():
    cfg = ScanContextConfig.golden_v2()
    pt = np.array([[100.0, 0.0, 2.0, 0.0]], np.float32)  # r = 100 >> 20
    out = np.asarray(scan_context(PointBatch.from_numpy(pt, 16), cfg))
    assert out[159].max() == np.float32(2.0)


def test_drop_rejects_far_points():
    cfg = ScanContextConfig.ros_node()
    pt = np.array([[100.0, 0.0, 2.0, 0.0]], np.float32)  # r = 100 > 80
    out = np.asarray(scan_context(PointBatch.from_numpy(pt, 16), cfg))
    np.testing.assert_array_equal(out, np.zeros_like(out))


def test_batched_vmap(reference_available):
    cfg = ScanContextConfig.golden_v2()
    pbs = [
        PointBatch.from_numpy(fixtures.golden_scan(s), cfg.max_points)
        for s in fixtures.GOLDEN_IDS[:2]
    ]
    batch = PointBatch.stack(pbs)
    grids = np.asarray(scan_context(batch, cfg))
    assert grids.shape == (2, 160, 720)
    for i, s in enumerate(fixtures.GOLDEN_IDS[:2]):
        single = np.asarray(scan_context(pbs[i], cfg))
        np.testing.assert_array_equal(grids[i], single)


def test_duplicate_points_in_same_cell():
    cfg = ScanContextConfig.golden_v2()
    pts = np.array(
        [[5.0, 5.0, z, 0.0] for z in [-2.0, 3.0, 0.5, 3.0, -10.0]], np.float32
    )
    out = np.asarray(scan_context(PointBatch.from_numpy(pts, 16), cfg))
    assert out.max() == np.float32(3.0)
    assert (out != 0).sum() == 1


def test_sort_route_bitexact_vs_sorted(rng):
    """The log-shift routing compaction (sort_route) must be bit-identical
    to the two-sort path on every profile, including degenerate clouds
    (all points in one cell = worst-case displacement) and padding."""
    from distropointclouds_tpu.ops.scan_context import (
        scan_context_sort_route,
        scan_context_sorted,
    )

    for profile in (
        ScanContextConfig.golden_v2(),
        ScanContextConfig.ros_node(),
        ScanContextConfig.scaner_v1(),
    ):
        n = 4096
        xyz = rng.uniform(-90, 90, size=(n, 3)).astype(np.float32)
        valid = rng.uniform(size=n) < 0.8
        a = np.asarray(
            scan_context_sorted(jnp.asarray(xyz), jnp.asarray(valid), profile)
        )
        b = np.asarray(
            scan_context_sort_route(
                jnp.asarray(xyz), jnp.asarray(valid), profile
            )
        )
        np.testing.assert_array_equal(a, b)

    cfg = ScanContextConfig.golden_v2()
    one_cell = np.tile(
        np.asarray([[1.0, 1.0, 0.0]], np.float32), (2048, 1)
    )
    one_cell[:, 2] = rng.normal(size=2048)
    a = np.asarray(
        scan_context_sorted(
            jnp.asarray(one_cell), jnp.ones(2048, bool), cfg
        )
    )
    b = np.asarray(
        scan_context_sort_route(
            jnp.asarray(one_cell), jnp.ones(2048, bool), cfg
        )
    )
    np.testing.assert_array_equal(a, b)


def test_compact_run_ends_unit():
    """Direct unit test of the routing compaction on a hand-built sorted
    stream: 4 cells, duplicate runs, sentinel tail."""
    from distropointclouds_tpu.ops.scan_context import compact_run_ends

    cells = jnp.asarray([0, 0, 0, 1, 2, 2, 3, 4, 4], jnp.int32)
    z = jnp.asarray([-1.0, 0.5, 2.0, -3.0, 0.0, 7.0, 1.5, 9.0, 9.5])
    out = np.asarray(compact_run_ends(cells, z, 4))
    np.testing.assert_allclose(out, [2.0, -3.0, 7.0, 1.5])


def test_bitonic_body_exact_small(rng):
    """The VMEM bitonic descriptor body (sort by cell + segmented max +
    routing) must reproduce scatter-max exactly, including degenerate
    inputs (all points one cell, all sentinel/padding)."""
    from distropointclouds_tpu.ops.bitonic import bitonic_descriptor_body

    N, C = 1024, 300
    cases = {
        "random": rng.integers(0, C + 1, size=N).astype(np.int32),
        "all-same": np.zeros(N, np.int32),
        "all-sentinel": np.full(N, C, np.int32),
    }
    for name, cells in cases.items():
        z = rng.normal(size=N).astype(np.float32)
        ref = np.full(C, -np.inf, np.float32)
        for c_, z_ in zip(cells, z):
            if c_ < C:
                ref[c_] = max(ref[c_], z_)
        out = np.asarray(
            bitonic_descriptor_body(
                jnp.asarray(cells.reshape(8, 128)),
                jnp.asarray(z.reshape(8, 128)),
                C,
            )
        ).reshape(-1)[:C]
        same = (out == ref) | (np.isneginf(out) & np.isneginf(ref))
        assert same.all(), name


def test_bitonic_matches_sorted_midscale(rng):
    """scan_context_bitonic == scan_context_sorted bit-exactly on a
    mid-scale random cloud (CPU runs the identical body as plain XLA)."""
    from distropointclouds_tpu.ops.bitonic import scan_context_bitonic
    from distropointclouds_tpu.ops.scan_context import scan_context_sorted

    cfg = ScanContextConfig(
        num_ring=32, num_sector=128, max_length=20.0, max_points=8192
    )
    n = 8192
    xyz = rng.uniform(-25, 25, size=(n, 3)).astype(np.float32)
    valid = rng.uniform(size=n) < 0.8
    a = np.asarray(
        scan_context_sorted(jnp.asarray(xyz), jnp.asarray(valid), cfg)
    )
    b = np.asarray(
        scan_context_bitonic(jnp.asarray(xyz), jnp.asarray(valid), cfg)
    )
    np.testing.assert_array_equal(a, b)


def test_bitonic_matches_sorted_all_profiles(rng):
    """Bitonic == sorted bit-exactly under drop-policy and offset-height
    profiles too (regression: offset mode floors every cell's max at 0
    via the sorted path's markers — the bitonic finalization must apply
    the same floor)."""
    import dataclasses

    from distropointclouds_tpu.ops.bitonic import scan_context_bitonic
    from distropointclouds_tpu.ops.scan_context import scan_context_sorted

    for name in ("golden_v2", "ros_node", "scaner_v1"):
        cfg = dataclasses.replace(
            getattr(ScanContextConfig, name)(),
            num_ring=32, num_sector=128, max_points=8192,
        )
        xyz = rng.uniform(-90, 90, size=(4096, 3)).astype(np.float32)
        xyz[:, 2] = rng.uniform(-6, 2, size=4096)  # many below the offset
        valid = rng.uniform(size=4096) < 0.8
        a = np.asarray(
            scan_context_sorted(jnp.asarray(xyz), jnp.asarray(valid), cfg)
        )
        b = np.asarray(
            scan_context_bitonic(jnp.asarray(xyz), jnp.asarray(valid), cfg)
        )
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_bitonic_pallas_call_interpret_smoke(rng):
    """The actual pl.pallas_call wiring (BlockSpec blocking, per-scan
    grid, out reshaping — ops/bitonic.py:255-266) under the Pallas
    interpreter, vs the plain-XLA body (r2 VERDICT weak #3: pytest
    exercised only the body, never the pallas_call path)."""
    from distropointclouds_tpu.ops.bitonic import bitonic_grid_from_bins

    B, N, C = 3, 1024, 300
    cells = rng.integers(0, C + 1, size=(B, N)).astype(np.int32)
    z = rng.normal(size=(B, N)).astype(np.float32)
    ref = np.asarray(
        bitonic_grid_from_bins(
            jnp.asarray(cells), jnp.asarray(z), C, use_pallas=False
        )
    )
    out = np.asarray(
        bitonic_grid_from_bins(
            jnp.asarray(cells), jnp.asarray(z), C, interpret=True
        )
    )
    same = (out == ref) | (np.isneginf(out) & np.isneginf(ref))
    assert same.all()


def test_stream_bitonic_branch_matches_sort_route(tmp_path, rng):
    """The stream pipeline's TPU (bitonic) branch is selectable and
    bit-identical to the default sort_route branch (r2 VERDICT weak #3:
    the branch was untested off-TPU)."""
    from distropointclouds_tpu.stream.pipeline import (
        ScanContextStream,
        StreamConfig,
    )

    cfg = StreamConfig(
        output_dir=str(tmp_path / "a"), max_points=8192, voxel_size=0.0
    )
    xyz = rng.uniform(-60, 60, size=(5000, 3)).astype(np.float32)
    a = ScanContextStream(cfg, impl="sort_route").process_one(xyz, "f0")
    b = ScanContextStream(cfg, impl="bitonic").process_one(xyz, "f0")
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Opt-in fast backend: packed single-key bitonic (non-parity, quantized z)


def test_packed_matches_sorted_within_quantization(rng):
    """The packed fast backend equals the bit-exact sorted path up to
    its documented z-quantization step (|delta| <= step/2) under every
    profile; empty-cell pattern identical."""
    import dataclasses
    import math as _math

    from distropointclouds_tpu.ops.bitonic import (
        Z_QUANT_RANGE,
        packed_zbits,
        scan_context_packed,
    )
    from distropointclouds_tpu.ops.scan_context import scan_context_sorted

    for name in ("golden_v2", "ros_node", "scaner_v1"):
        cfg = dataclasses.replace(
            getattr(ScanContextConfig, name)(),
            num_ring=32, num_sector=128, max_points=8192,
        )
        zbits = packed_zbits(cfg.num_ring * cfg.num_sector)
        step = (Z_QUANT_RANGE[1] - Z_QUANT_RANGE[0]) / ((1 << zbits) - 1)
        xyz = rng.uniform(-90, 90, size=(4096, 3)).astype(np.float32)
        xyz[:, 2] = rng.uniform(-6, 4, size=4096)
        valid = rng.uniform(size=4096) < 0.8
        a = np.asarray(
            scan_context_sorted(jnp.asarray(xyz), jnp.asarray(valid), cfg)
        )
        b = np.asarray(
            scan_context_packed(jnp.asarray(xyz), jnp.asarray(valid), cfg)
        )
        np.testing.assert_allclose(
            b, a, atol=step / 2 + 1e-6, err_msg=name
        )
        # empty cells (exact 0 in both) stay exactly 0
        np.testing.assert_array_equal(b == 0.0, a == 0.0, err_msg=name)


def test_packed_golden_full_scale(reference_available):
    """Packed backend at the golden 160x720 grid on a real scan: within
    step/2 (~1 mm) of the golden descriptor everywhere except the same
    boundary-cell allowance as the exact impls."""
    from distropointclouds_tpu.ops.bitonic import Z_QUANT_RANGE, packed_zbits

    cfg = ScanContextConfig.golden_v2()
    zbits = packed_zbits(cfg.num_ring * cfg.num_sector)
    step = (Z_QUANT_RANGE[1] - Z_QUANT_RANGE[0]) / ((1 << zbits) - 1)
    raw = fixtures.golden_scan("000840")
    golden = fixtures.golden_descriptor("000840")
    pb = PointBatch.from_numpy(raw, cfg.max_points)
    ours = np.asarray(scan_context(pb, cfg, impl="bitonic_packed"))
    bad = np.abs(ours - golden) > step / 2 + 1e-6
    assert int(bad.sum()) <= 10
    for rr, ss in zip(*np.nonzero(bad)):
        assert mismatch_is_boundary_explainable(ours, golden, rr, ss, cfg)


def test_packed_pallas_call_interpret_smoke(rng):
    """The packed kernel's pallas_call wiring under the interpreter vs
    the plain-XLA body."""
    from distropointclouds_tpu.ops.bitonic import packed_grid_from_bins

    B, N, C, zbits = 2, 1024, 300, 16
    cells = rng.integers(0, C + 1, size=(B, N)).astype(np.int32)
    zq = rng.integers(0, 1 << zbits, size=(B, N)).astype(np.int32)
    packed = np.where(cells < C, (cells << zbits) | zq, C << zbits)
    args = (jnp.asarray(packed), C, zbits, -16.0, 32.0 / ((1 << zbits) - 1))
    ref = np.asarray(packed_grid_from_bins(*args, use_pallas=False))
    out = np.asarray(packed_grid_from_bins(*args, interpret=True))
    # The interpreter rounds the dequantization (z_min + zq * step,
    # which cancels near z=0) differently from XLA CPU: absolute error
    # up to ~2 ulp of |z_min| = 2e-6 — far below the backend's
    # documented step/2 accuracy bound. The sort/route placement itself
    # must agree exactly (same cells populated).
    same = np.isclose(out, ref, rtol=0, atol=2e-6) | (
        np.isneginf(out) & np.isneginf(ref)
    )
    assert same.all()
    np.testing.assert_array_equal(np.isneginf(out), np.isneginf(ref))


def test_fast_profile_is_maxpool_of_golden(reference_available):
    """ScanContextConfig.fast(): the 80x360 grid's bin edges align with
    the golden grid 2:1, so each coarse cell's max equals maxpool2x2 of
    the golden descriptor — except where the golden grid's empty-cell
    zero-fill masks an all-negative coarse max, plus the usual boundary
    cells."""
    cfg = ScanContextConfig.fast()
    raw = fixtures.golden_scan("002160")
    golden = fixtures.golden_descriptor("002160")
    pooled = golden.reshape(80, 2, 360, 2).max(axis=(1, 3))
    pb = PointBatch.from_numpy(raw, cfg.max_points)
    coarse = np.asarray(scan_context(pb, cfg, impl="sort_route"))
    diff = pooled != coarse
    unexplained = 0
    for rr, ss in zip(*np.nonzero(diff)):
        # empty-subcell zero-fill: pooled saw a 0 from an empty fine
        # cell, the true coarse max is negative
        if pooled[rr, ss] == 0.0 and coarse[rr, ss] < 0.0:
            continue
        unexplained += 1
    assert unexplained <= 10, f"{unexplained} non-zero-fill mismatches"


def test_pipeline_fast_profile_end_to_end(reference_available):
    """PipelineConfig.fast() runs the full pipeline at 80x360 (TinyCNN
    is fully convolutional) and returns finite probs + detections."""
    from distropointclouds_tpu.models.torch_import import load_tiny_cnn
    from distropointclouds_tpu.pipeline import jit_pipeline

    cfg = __import__("distropointclouds_tpu").PipelineConfig.fast()
    fn = jit_pipeline("tiny_cnn", cfg, "components")
    variables = load_tiny_cnn()
    pb = PointBatch.stack(
        [PointBatch.from_numpy(fixtures.golden_scan("000840"),
                               cfg.scan_context.max_points)]
    )
    out = fn(variables, pb)
    assert out["probs"].shape == (1, 80, 360)
    assert np.isfinite(np.asarray(out["probs"])).all()
    assert out["descriptor"].shape == (1, 80, 360)


def test_fast_stride2_decimation_bounds(reference_available):
    """point_stride=2 (the 10k-shot decimation): bin every 2nd point.
    Pins the measured accuracy envelope vs the pooled golden grid:
    <= 0.2% of coarse cells emptied, mean |delta| over nonempty cells
    <= 0.1 m (the p99 tail is ~1 m on sparse 1-2 point cells —
    documented in docs/PERF.md; this is an OPT-IN mode)."""
    cfg = ScanContextConfig.fast(stride=2)
    assert cfg.point_stride == 2
    for sid in ("000840", "002160"):
        golden = fixtures.golden_descriptor(sid)
        pooled = golden.reshape(80, 2, 360, 2).max(axis=(1, 3))
        pb = PointBatch.from_numpy(fixtures.golden_scan(sid), cfg.max_points)
        ours = np.asarray(scan_context(pb, cfg, impl="bitonic_packed"))
        assert ours.shape == (80, 360)
        nonempty = pooled != 0
        emptied = int(((ours == 0) & nonempty).sum())
        assert emptied <= 0.002 * pooled.size, emptied
        mean_d = float(np.abs(ours - pooled)[nonempty].mean())
        assert mean_d <= 0.1, mean_d


def test_point_stride_applies_to_all_impls(rng):
    """point_stride decimates identically for every impl (it is applied
    once in the scan_context dispatcher)."""
    import dataclasses

    cfg = dataclasses.replace(
        ScanContextConfig.golden_v2(),
        num_ring=32, num_sector=128, max_points=4096, point_stride=2,
    )
    pts = rng.uniform(-25, 25, size=(4096, 4)).astype(np.float32)
    pb = PointBatch.from_numpy(pts, cfg.max_points)
    ref = np.asarray(scan_context(pb, cfg, impl="sort"))
    for impl in ("sort_route", "scatter", "bitonic"):
        np.testing.assert_array_equal(
            np.asarray(scan_context(pb, cfg, impl=impl)), ref, err_msg=impl
        )
    # and equals manually-decimated stride-1
    cfg1 = dataclasses.replace(cfg, point_stride=1)
    manual = np.asarray(
        scan_context(PointBatch.from_numpy(pts[::2], cfg.max_points), cfg1,
                     impl="sort")
    )
    np.testing.assert_array_equal(ref, manual)


def test_packed_jit_nonpow2_pad_branch(rng):
    """The packed backend under jit when the (post-stride) point count
    is NOT a power of two, so the sentinel pad branch runs inside the
    trace. Regression for r4: the pad constant was int(jax scalar),
    which raises ConcretizationTypeError under jit — every prior caller
    happened to use power-of-two max_points and never hit the branch."""
    import dataclasses

    from distropointclouds_tpu.ops.bitonic import scan_context_packed

    from distropointclouds_tpu.ops.bitonic import Z_QUANT_RANGE, packed_zbits
    from distropointclouds_tpu.ops.scan_context import scan_context_sorted

    cfg = dataclasses.replace(
        ScanContextConfig.golden_v2(),
        num_ring=32, num_sector=128, max_points=3000,
    )
    zbits = packed_zbits(cfg.num_ring * cfg.num_sector)
    step = (Z_QUANT_RANGE[1] - Z_QUANT_RANGE[0]) / ((1 << zbits) - 1)
    xyz = rng.uniform(-25, 25, size=(2, 3000, 3)).astype(np.float32)
    xyz[..., 2] = rng.uniform(-4, 4, size=(2, 3000)).astype(np.float32)
    valid = jnp.asarray(rng.uniform(size=(2, 3000)) < 0.9)
    xyz = jnp.asarray(xyz)
    jitted = np.asarray(
        jax.jit(lambda a, b: scan_context_packed(a, b, cfg))(xyz, valid)
    )
    # jit may fuse the dequantize (z_min + zq * step) into an FMA whose
    # rounding differs from eager by a few ulps of the +-16 m clip range
    # (~2e-6), ON TOP of the quantization bound — so the gate is
    # step/2 + that rounding headroom vs the bit-exact sorted path,
    # not jit==eager equality (measured max exceedance 1.7e-6).
    ref = np.stack([
        np.asarray(scan_context_sorted(xyz[i], valid[i], cfg))
        for i in range(2)
    ])
    np.testing.assert_allclose(jitted, ref, atol=step / 2 + 4e-6)
    np.testing.assert_array_equal(jitted == 0.0, ref == 0.0)
