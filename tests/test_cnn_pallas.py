"""Parity tests for the fused planar Pallas TinyCNN (ops/cnn_pallas.py).

The kernel bodies are pure jnp, so the same math runs three ways:
as a plain XLA program (use_pallas=False), under the Pallas interpreter
(interpret=True), and Mosaic-compiled on TPU (exercised by bench.py's
parity gate, not here). The oracle is the flax TinyCNN that is itself
pinned to the torch reference within 1e-4 (tests/test_models.py;
reference model `tiny_sc_ped.py:134-154`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.models.layers import normalize_minmax
from distropointclouds_tpu.models.tiny_cnn import TinyCNN
from distropointclouds_tpu.models.torch_import import load_tiny_cnn
from distropointclouds_tpu.ops.cnn_pallas import (
    fold_weights,
    tiny_cnn_pallas_forward,
)


@pytest.fixture(scope="module")
def variables():
    return load_tiny_cnn()


@pytest.fixture(scope="module")
def flax_logits(variables):
    model = TinyCNN(dtype=jnp.float32)

    def f(x):
        return model.apply(variables, x[..., None], train=False)

    return f


def _golden_x(sid):
    sc = jnp.asarray(fixtures.golden_descriptor(sid))
    return normalize_minmax(sc[None])


def test_fold_weights_shapes(variables):
    w = fold_weights(variables)
    shapes = {
        "w1": (16, 10), "w2": (32, 145), "w3": (64, 289),
        "w4c0": (128, 193), "w4c1": (128, 192), "w4c2": (128, 192),
        "wd1": (256, 129), "wd2": (128, 65), "wd3": (64, 33),
        "wh4": (4, 65),
    }
    assert {k: v.shape for k, v in w.items()} == shapes


@pytest.mark.parametrize("sid", ["000840", "002160"])
def test_fallback_f32_matches_flax(variables, flax_logits, sid):
    x = _golden_x(sid)
    ref = flax_logits(x)
    out = tiny_cnn_pallas_forward(
        variables, x, use_pallas=False, dtype=jnp.float32
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_fallback_bf16_within_deployed_tolerance(variables, flax_logits):
    """bf16 planar kernels stay in the same accuracy class as the
    deployed flax-bf16 path (|dlogit| ~2.6e-2 vs torch, docs/PERF.md)."""
    x = _golden_x("002073")
    ref = flax_logits(x)
    out = tiny_cnn_pallas_forward(
        variables, x, use_pallas=False, dtype=jnp.bfloat16
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 0.06


def test_interpret_pallas_matches_flax(variables, flax_logits):
    """Full pallas_call wiring (grids, BlockSpecs, program_id strip
    indexing, revisited input blocks) under the interpreter."""
    x = _golden_x("002095")
    ref = flax_logits(x)
    out = tiny_cnn_pallas_forward(
        variables, x, interpret=True, use_pallas=False, dtype=jnp.float32
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_pipeline_cnn_impl_pallas(variables):
    """cnn_impl="pallas" plugs into build_pipeline and agrees with the
    flax path end-to-end (raw points -> descriptor -> probs)."""
    import dataclasses

    from distropointclouds_tpu.core.config import PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.pipeline import build_pipeline

    cfg = PipelineConfig(compute_dtype="float32")
    pts = fixtures.golden_scan("000840")
    pb = PointBatch.from_numpy(pts, cfg.scan_context.max_points)
    a = build_pipeline("tiny_cnn", cfg, postprocess="none")(variables, pb)
    cfgp = dataclasses.replace(cfg, cnn_impl="pallas")
    b = build_pipeline("tiny_cnn", cfgp, postprocess="none")(variables, pb)
    np.testing.assert_array_equal(
        np.asarray(a["descriptor"]), np.asarray(b["descriptor"])
    )
    assert float(jnp.max(jnp.abs(a["probs"] - b["probs"]))) < 1e-5


def test_batched_consistency(variables):
    """B>1: each batch element equals its B=1 result (strip/block
    indexing does not leak across the batch)."""
    xs = jnp.concatenate([_golden_x("000840"), _golden_x("002160")], axis=0)
    out = tiny_cnn_pallas_forward(
        variables, xs, use_pallas=False, dtype=jnp.float32
    )
    for i, sid in enumerate(["000840", "002160"]):
        one = tiny_cnn_pallas_forward(
            variables, _golden_x(sid), use_pallas=False, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(one[0]), atol=1e-6
        )


def test_pipeline_pallas_exact_precision(variables):
    """PipelineConfig.exact() with cnn_impl="pallas" honors
    matmul_precision (r2 ADVICE medium: it was silently ignored): the
    pallas backend under exact() must agree with the flax exact() path
    to f32 parity."""
    import dataclasses

    from distropointclouds_tpu.core.config import PipelineConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.pipeline import build_pipeline

    cfg = PipelineConfig.exact()
    pts = fixtures.golden_scan("000840")
    pb = PointBatch.from_numpy(pts, cfg.scan_context.max_points)
    a = build_pipeline("tiny_cnn", cfg, postprocess="none")(variables, pb)
    cfgp = dataclasses.replace(cfg, cnn_impl="pallas")
    b = build_pipeline("tiny_cnn", cfgp, postprocess="none")(variables, pb)
    assert float(jnp.max(jnp.abs(a["probs"] - b["probs"]))) < 1e-5
