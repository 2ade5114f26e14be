"""Hand-written Pallas TPU kernels for hot post-processing ops.

The descriptor's sort pipeline and the CNN are best served by XLA's
tuned sort and conv emitters (docs/PERF.md records the measurements),
but the small dense grid ops between them are worth fusing by hand:

- :func:`peak_nms_pallas`: the 7x7 max-pool NMS of
  `train_sc_ped.py:291-309` as ONE VMEM-resident kernel. The kxk max is
  decomposed separably (k-tap row max, then k-tap column max) with
  shifted `jnp.maximum` chains on the in-register block — 2k vector ops
  over the grid instead of a k^2 reduce_window, no HBM round-trips
  between the pooling, the equality test, and the threshold.

Falls back to the XLA implementation on non-TPU backends (Pallas TPU
kernels don't run on CPU without interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some non-TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False


def _shift_rows(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """Shift rows by s (positive = down), filling vacated rows."""
    H = x.shape[0]
    if s == 0:
        return x
    pad = jnp.full((abs(s), x.shape[1]), fill, x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[: H - s]], axis=0)
    return jnp.concatenate([x[-s:], pad], axis=0)


def _shift_cols(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    W = x.shape[1]
    if s == 0:
        return x
    pad = jnp.full((x.shape[0], abs(s)), fill, x.dtype)
    if s > 0:
        return jnp.concatenate([pad, x[:, : W - s]], axis=1)
    return jnp.concatenate([x[:, -s:], pad], axis=1)


def _peak_kernel(heat_ref, out_ref, *, kernel: int, threshold: float):
    h = heat_ref[0]
    neg = jnp.float32(-jnp.inf)
    half = kernel // 2
    # Separable k x k max: rows then columns.
    m = h
    for s in range(1, half + 1):
        m = jnp.maximum(m, _shift_cols(h, s, neg))
        m = jnp.maximum(m, _shift_cols(h, -s, neg))
    m2 = m
    for s in range(1, half + 1):
        m2 = jnp.maximum(m2, _shift_rows(m, s, neg))
        m2 = jnp.maximum(m2, _shift_rows(m, -s, neg))
    out_ref[0] = ((h == m2) & (h >= threshold)).astype(jnp.float32)


def peak_nms_mask_pallas(
    heat: jnp.ndarray, kernel: int = 7, threshold: float = 0.4
) -> jnp.ndarray:
    """[B, H, W] -> [B, H, W] float32 0/1 local-max mask, one fused
    Pallas kernel per batch element (grid over B, block = full plane in
    VMEM: 160 x 720 f32 = 450 KB)."""
    B, H, W = heat.shape
    return pl.pallas_call(
        functools.partial(_peak_kernel, kernel=kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W),
                lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM if _HAVE_PLTPU else None,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, H, W),
            lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM if _HAVE_PLTPU else None,
        ),
    )(heat)


def peak_nms_mask_fast(
    heat: jnp.ndarray, kernel: int = 7, threshold: float = 0.4
) -> jnp.ndarray:
    """Backend-dispatching NMS mask: Pallas on TPU, separable XLA
    reduce_windows elsewhere. Semantics identical to
    postprocess.peak_nms_mask (torch max_pool2d parity)."""
    squeeze = heat.ndim == 2
    if squeeze:
        heat = heat[None]
    if jax.default_backend() == "tpu" and _HAVE_PLTPU:
        out = peak_nms_mask_pallas(heat, kernel, threshold).astype(bool)
    else:
        # Separable reduce_window (max is separable) — cheaper than the
        # k^2 window.
        pooled = jax.lax.reduce_window(
            heat, -jnp.inf, jax.lax.max,
            (1, 1, kernel), (1, 1, 1),
            [(0, 0), (0, 0), (kernel // 2, kernel // 2)],
        )
        pooled = jax.lax.reduce_window(
            pooled, -jnp.inf, jax.lax.max,
            (1, kernel, 1), (1, 1, 1),
            [(0, 0), (kernel // 2, kernel // 2), (0, 0)],
        )
        out = (heat == pooled) & (heat >= threshold)
    return out[0] if squeeze else out
