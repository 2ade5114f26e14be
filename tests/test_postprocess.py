"""Post-processing parity: peaks vs torch max-pool NMS, connected
components vs scipy.ndimage.label, banded thresholds; end-to-end
pipeline smoke on golden fixtures."""

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.core.config import DetectorConfig, PipelineConfig
from distropointclouds_tpu.core.types import PointBatch
from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.ops.postprocess import (
    banded_threshold,
    components_to_detections,
    connected_components,
    extract_peaks,
)


def reference_peaks(heat, thr=0.4, k=7, topk=200):
    """Numpy/torch model of train_sc_ped.py:291-309."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = torch.tensor(heat)[None, None]
    pooled = F.max_pool2d(t, kernel_size=k, stride=1, padding=k // 2)
    keep = (t == pooled) & (t >= thr)
    coords = torch.nonzero(keep[0, 0], as_tuple=False)
    scores = t[0, 0][keep[0, 0]]
    if scores.numel() == 0:
        return []
    scores, idxs = torch.topk(scores, k=min(topk, scores.numel()))
    coords = coords[idxs]
    return [
        (int(coords[i, 0]), int(coords[i, 1]), float(scores[i]))
        for i in range(scores.numel())
    ]


def test_peaks_match_torch(rng):
    heat = rng.uniform(0, 1, size=(160, 720)).astype(np.float32) * 0.3
    # plant some peaks
    for r, s, v in [(10, 10, 0.9), (10, 30, 0.8), (100, 500, 0.95), (159, 719, 0.7)]:
        heat[r, s] = v
    ref = reference_peaks(heat, thr=0.4, k=7, topk=200)
    got = extract_peaks(jnp.asarray(heat), DetectorConfig())
    got_list = [
        (int(r), int(s), float(v))
        for r, s, v in zip(
            np.asarray(got.ring), np.asarray(got.sector), np.asarray(got.score)
        )
        if True
    ]
    got_list = [
        g for g, v in zip(got_list, np.asarray(got.valid)) if v
    ]
    assert len(got_list) == len(ref)
    assert set((r, s) for r, s, _ in got_list) == set((r, s) for r, s, _ in ref)
    # scores sorted descending
    scores = [v for _, _, v in got_list]
    assert scores == sorted(scores, reverse=True)


def test_connected_components_vs_scipy(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    mask = rng.uniform(size=(160, 720)) < 0.3
    ours = np.asarray(connected_components(jnp.asarray(mask)))
    ref, n = scipy_ndimage.label(mask)
    # Same partition: component ids differ, but the induced partitions
    # must be identical.
    assert (ours >= 0).sum() == (ref > 0).sum()
    # map our root -> scipy label must be a bijection on components
    roots = ours[mask]
    slabels = ref[mask]
    pairs = set(zip(roots.tolist(), slabels.tolist()))
    assert len(pairs) == n
    assert len(set(p[0] for p in pairs)) == n
    assert len(set(p[1] for p in pairs)) == n


def test_components_to_detections_vs_reference(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    mask = np.zeros((160, 720), bool)
    # blobs: big (kept), small (dropped), snake (kept)
    mask[10:20, 10:20] = True  # 100 px
    mask[50:52, 50:55] = True  # 10 px -> dropped (min 20)
    mask[100, 100:200] = True  # 100 px snake
    mask[140:145, 700:720] = True  # 100 px at boundary

    got = components_to_detections(jnp.asarray(mask), min_pixels=20, capacity=16)
    got_set = {
        (round(float(r), 4), round(float(s), 4), int(a))
        for r, s, a, v in zip(
            np.asarray(got.ring),
            np.asarray(got.sector),
            np.asarray(got.score),
            np.asarray(got.valid),
        )
        if v
    }

    lab, n = scipy_ndimage.label(mask)
    ref_set = set()
    for cid in range(1, n + 1):
        coords = np.argwhere(lab == cid)
        if coords.shape[0] < 20:
            continue
        ref_set.add(
            (
                round(float(coords[:, 0].mean()), 4),
                round(float(coords[:, 1].mean()), 4),
                int(coords.shape[0]),
            )
        )
    assert got_set == ref_set


def test_components_random_parity(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    # dense-ish random mask: many merging components stress the labeling
    mask = scipy_ndimage.binary_dilation(rng.uniform(size=(80, 160)) < 0.08)
    got = components_to_detections(jnp.asarray(mask), min_pixels=5, capacity=2048)
    got_areas = sorted(
        int(a) for a, v in zip(np.asarray(got.score), np.asarray(got.valid)) if v
    )
    lab, n = scipy_ndimage.label(mask)
    ref_areas = sorted(
        int((lab == c).sum()) for c in range(1, n + 1) if (lab == c).sum() >= 5
    )
    assert got_areas == ref_areas


def test_banded_threshold():
    probs = np.full((160, 720), 0.45, np.float32)
    out = np.asarray(banded_threshold(jnp.asarray(probs), DetectorConfig()))
    assert not out[:60].any()      # near: thr 0.5
    assert out[60:120].all()       # mid: thr 0.4
    assert out[120:].all()         # far: thr 0.3


def test_full_pipeline_on_fixtures(reference_available):
    """The minimum end-to-end slice (SURVEY §7 step 4): .bin -> decode ->
    SC -> TinyCNN -> mask -> detections, one jitted program, on all
    golden scans. The shipped checkpoint famously detects nothing
    (SURVEY §6), which is itself the expected output."""
    from distropointclouds_tpu.pipeline import shipped_tinycnn_pipeline

    fn, variables = shipped_tinycnn_pipeline()
    cfg = PipelineConfig()
    pbs = [
        PointBatch.from_numpy(
            fixtures.golden_scan(s), cfg.scan_context.max_points
        )
        for s in fixtures.GOLDEN_IDS
    ]
    batch = PointBatch.stack(pbs)
    out = fn(variables, batch)
    assert out["descriptor"].shape == (4, 160, 720)
    assert out["probs"].shape == (4, 160, 720)
    for i, sid in enumerate(fixtures.GOLDEN_IDS):
        golden = fixtures.golden_descriptor(sid)
        assert (np.asarray(out["descriptor"][i]) != golden).sum() <= 10
        assert float(out["probs"][i].max()) < 0.08  # shipped ckpt: no dets
        assert not bool(np.asarray(out["detections"].valid[i]).any())


def test_pipeline_components_empty_guard(rng):
    """The batch-level empty-mask guard in the pipeline must return the
    IDENTICAL Detections as the unguarded path for both an all-empty
    batch and a batch with real components."""
    import jax

    from distropointclouds_tpu.core.config import (
        PipelineConfig,
        ScanContextConfig,
    )
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.models.tiny_cnn import TinyCNN
    from distropointclouds_tpu.pipeline import build_pipeline

    cfg = PipelineConfig(scan_context=ScanContextConfig(max_points=2048))
    fn = jax.jit(build_pipeline("tiny_cnn", cfg, postprocess="components"))
    variables = TinyCNN().init(jax.random.key(0), jnp.zeros((1, 160, 720, 1)))

    pts = rng.uniform(-20, 20, size=(2, 2048, 4)).astype(np.float32)
    pb = PointBatch(
        xyzi=jnp.asarray(pts), count=jnp.asarray([2048, 2048], jnp.int32)
    )
    out = fn(variables, pb)
    det = out["detections"]
    # An untrained TinyCNN on random data produces SOME mask content or
    # none — either way, compare against the direct unguarded call.
    from distropointclouds_tpu.ops.postprocess import components_to_detections

    mask = np.asarray(out["probs"]) > cfg.detector.mask_threshold
    ref = jax.vmap(
        lambda m: components_to_detections(
            m, cfg.detector.min_component_pixels, capacity=64,
            max_iters=cfg.detector.cc_max_iters,
        )
    )(jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(det.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(det.ring), np.asarray(ref.ring))
    np.testing.assert_allclose(
        np.asarray(det.score), np.asarray(ref.score)
    )

    # Force the non-empty branch explicitly with a synthetic blob.
    from distropointclouds_tpu.pipeline import MODELS  # noqa: F401

    probs = np.zeros((2, 160, 720), np.float32)
    probs[0, 10:18, 100:110] = 0.9
    m = jnp.asarray(probs) > 0.5
    direct = jax.vmap(
        lambda mm: components_to_detections(mm, 20, capacity=64, max_iters=64)
    )(m)
    assert bool(np.asarray(direct.valid)[0].any())
