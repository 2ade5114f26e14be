"""End-to-end jitted pipeline: raw points -> descriptor -> CNN -> detections.

The reference runs this as separate Python stages across files
(`scaner_version2.py` batch descriptor, `tiny_sc_ped.run_inference`
model+components, `train_sc_ped.extract_peaks`); here the whole thing is
ONE XLA program per scan batch — decode stays on host (a single
``np.fromfile``), everything after `PointBatch` is fused by XLA, vmapped
over the batch, and shardable over a device mesh (see parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .core.config import DetectorConfig, PipelineConfig, ScanContextConfig
from .core.types import Detections, PointBatch
from .models.layers import normalize_clip, normalize_minmax
from .models.tiny_cnn import TinyCNN
from .models.tiny_unet import TinyUNet
from .models.sc_unet import ScanContextUNet
from .ops.postprocess import (
    banded_threshold,
    components_to_detections,
    extract_peaks,
)
from .ops.scan_context import scan_context

MODELS = {
    "tiny_cnn": TinyCNN,
    "tiny_unet": TinyUNet,
    "sc_unet": ScanContextUNet,
}


def normalize(grid: jnp.ndarray, mode: str, clip_abs: float = 3.0) -> jnp.ndarray:
    if mode == "minmax":
        return normalize_minmax(grid)
    if mode == "clip":
        return normalize_clip(grid, clip_abs)
    if mode == "none":
        return grid
    raise ValueError(f"unknown normalization {mode!r}")


def build_pipeline(
    model_name: str = "tiny_cnn",
    cfg: PipelineConfig = PipelineConfig(),
    postprocess: str = "components",
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> Callable:
    """Build the jittable full-pipeline function.

    Args:
      model_name: tiny_cnn | tiny_unet | sc_unet.
      postprocess:
        - "components": sigmoid -> thr -> connected components
          (tiny_sc_ped.py:217-234 semantics; default thr
          ``cfg.detector.mask_threshold``)
        - "peaks": sigmoid -> max-pool NMS peaks (train_sc_ped eval)
        - "banded": sigmoid -> ring-banded thresholds -> components
          (tiny_sc_pred_v2 inference)
        - "none": return probabilities only.

    Returns fn(variables, points: PointBatch) -> dict with
    'descriptor' [B, R, S], 'probs' [B, R, S], 'detections' (absent for
    "none"). Wrap with jax.jit yourself or use :func:`jit_pipeline`.
    """
    kwargs = dict(model_kwargs or {})
    # CNN compute dtype from the config (explicit model_kwargs win).
    kwargs.setdefault("dtype", jnp.dtype(cfg.compute_dtype))
    model = MODELS[model_name](**kwargs)
    det = cfg.detector

    def batched_components(mask):
        """Connected components for a [B, H, W] mask batch, guarded by a
        batch-level lax.cond: an all-empty batch (no pixel above
        threshold anywhere — the common streaming case, and always the
        case with the reference's vacuous shipped checkpoint) returns
        the identical empty Detections without running the label
        sweeps / top_k / stats at all. The cond must sit OUTSIDE the
        vmap — under vmap a cond lowers to select and both branches
        execute."""
        B = mask.shape[0]
        cap = det.component_capacity

        def full(m):
            return jax.vmap(
                lambda mm: components_to_detections(
                    mm, det.min_component_pixels, capacity=cap,
                    max_iters=det.cc_max_iters,
                )
            )(m)

        def empty(m):
            zeros = jnp.zeros((B, cap), jnp.float32)
            return Detections(
                ring=zeros, sector=zeros, score=zeros,
                valid=jnp.zeros((B, cap), bool),
            )

        return jax.lax.cond(jnp.any(mask), full, empty, mask)

    def fn(variables, points: PointBatch):
        # [B, R, S] or [R, S]
        grid = scan_context(points, cfg.scan_context, impl=cfg.descriptor_impl)
        squeeze = grid.ndim == 2
        if squeeze:
            grid = grid[None]
        x = normalize(grid, cfg.normalize)
        if model_name == "tiny_cnn" and cfg.cnn_impl == "pallas":
            from .ops.cnn_pallas import tiny_cnn_pallas_forward

            # matmul_precision is honored by the pallas backend too: the
            # kernel dots carry no explicit precision, so the trace-time
            # default-precision context threads through, and a requested
            # "float32" also forces f32 operands (bf16-truncated inputs
            # would defeat the requested precision before the MXU).
            pallas_dtype = jnp.dtype(cfg.compute_dtype)
            if cfg.matmul_precision == "float32":
                pallas_dtype = jnp.dtype(jnp.float32)
            if cfg.matmul_precision is not None:
                with jax.default_matmul_precision(cfg.matmul_precision):
                    logits = tiny_cnn_pallas_forward(
                        variables, x, dtype=pallas_dtype
                    )
            else:
                logits = tiny_cnn_pallas_forward(variables, x, dtype=pallas_dtype)
        elif cfg.matmul_precision is not None:
            # Trace-time context: every conv/einsum the model builds
            # inside it carries this precision. "float32" gives the
            # verified on-TPU 1e-4 logit parity vs torch; the default
            # (None -> backend default, bf16 MXU passes on TPU) is the
            # deployment analog of the reference's CUDA AMP path
            # (measured tradeoffs: core/config.py matmul_precision).
            with jax.default_matmul_precision(cfg.matmul_precision):
                logits = model.apply(variables, x[..., None], train=False)
        else:
            logits = model.apply(variables, x[..., None], train=False)
        if isinstance(logits, tuple):
            logits = logits[0]
        probs = jax.nn.sigmoid(logits[..., 0])
        out = {"descriptor": grid, "probs": probs}
        if postprocess == "components":
            out["detections"] = batched_components(probs > det.mask_threshold)
        elif postprocess == "peaks":
            # extract_peaks is natively batched (the Pallas NMS kernel
            # grids over the batch dim; top_k batches over leading dims).
            out["detections"] = extract_peaks(probs, det)
        elif postprocess == "banded":
            out["detections"] = batched_components(banded_threshold(probs, det))
        elif postprocess != "none":
            raise ValueError(f"unknown postprocess {postprocess!r}")
        if squeeze:
            out = jax.tree.map(lambda a: a[0], out)
        return out

    return fn


def jit_pipeline(
    model_name: str = "tiny_cnn",
    cfg: PipelineConfig = PipelineConfig(),
    postprocess: str = "components",
    model_kwargs: Optional[Dict[str, Any]] = None,
) -> Callable:
    """Jitted :func:`build_pipeline` (configs are closed over, so the
    returned callable takes only (variables, points))."""
    return jax.jit(build_pipeline(model_name, cfg, postprocess, model_kwargs))


def shipped_tinycnn_pipeline(
    cfg: PipelineConfig = PipelineConfig(),
) -> Tuple[Callable, Dict]:
    """The reference's inference setup: shipped tinycnn_best.pth weights,
    min-max normalization, thr 0.5, components (tiny_sc_ped.run_inference).
    Returns (jitted_fn, variables)."""
    from .models.torch_import import load_tiny_cnn

    return jit_pipeline("tiny_cnn", cfg, "components"), load_tiny_cnn()
