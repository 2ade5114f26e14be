"""Shared NHWC building blocks with exact PyTorch-semantics parity.

The reference models are small PyTorch CNNs; rebuilding them for TPU
means NHWC layout (XLA's native conv layout), bf16-capable compute, and
MXU-friendly formulations of the odd ops:

- ``ConvTranspose2x2``: a kernel-2 stride-2 transposed conv has
  non-overlapping outputs, so it is expressed as one einsum (an MXU
  matmul) + reshape — exactly equal to `nn.ConvTranspose2d(k=2, s=2)`
  and faster than a general conv_transpose lowering.
- ``upsample_bilinear_align_corners``: torch's
  ``Upsample(mode='bilinear', align_corners=True)`` as two interpolation
  matmuls (one per spatial axis) — again MXU work instead of gathers.
- ``polar_pad``: circular padding on the sector axis + zero padding on
  the ring axis (`tiny_sc_pred_v2.py:113-117`, PolarConv2d).
- ``max_pool_2x2``: `nn.MaxPool2d(2)` (floor semantics on odd sizes).

BatchNorm uses flax's BatchNorm with momentum 0.9 (== torch momentum
0.1) and eps 1e-5, matching torch defaults.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """nn.MaxPool2d(2): 2x2 window, stride 2, floor on odd sizes."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def polar_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Circular pad on sectors (W), zero pad on rings (H)
    (tiny_sc_pred_v2.py:113-117). x: [B, H, W, C]."""
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="wrap")
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """torch Upsample(scale_factor=scale, mode='bilinear',
    align_corners=True) on [B, H, W, C], as two interpolation matmuls."""
    B, H, W, C = x.shape

    def interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
        if n_in == 1:
            return jnp.ones((n_out, 1), jnp.float32)
        # align_corners: src = i * (n_in - 1) / (n_out - 1)
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(np.float32)
        A = np.zeros((n_out, n_in), np.float32)
        A[np.arange(n_out), lo] += 1.0 - frac
        A[np.arange(n_out), hi] += frac
        return jnp.asarray(A)

    Ah = interp_matrix(H, H * scale)
    Aw = interp_matrix(W, W * scale)
    x = jnp.einsum("ph,bhwc->bpwc", Ah, x)
    x = jnp.einsum("qw,bhwc->bhqc", Aw, x)
    return x


class Conv(nn.Module):
    """Plain conv with torch-style symmetric zero padding."""

    features: int
    kernel: int = 3
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvBNReLU(nn.Module):
    """Conv -> BatchNorm -> ReLU (`train_sc_ped.py:217-223` ConvBNAct /
    `tiny_sc_ped.py:137-145` encoder stages)."""

    features: int
    kernel: int = 3
    padding: int = 1
    use_bias: bool = False
    polar: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.polar:
            x = polar_pad(x, self.kernel // 2)
            pad = "VALID"
        else:
            pad = [(self.padding, self.padding)] * 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        # BN computes in the model dtype (params stay f32). An f32 BN
        # after a bf16 conv would break XLA's bf16 propagation: the f32
        # elementwise epilogue forces every inter-layer activation to
        # materialize in f32, nearly doubling the CNN's HBM traffic
        # (measured: TinyCNN fwd 270 -> 152 us/scan at B=96 once the
        # whole chain stays bf16 — docs/PERF.md, bias-add finding).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class ConvTranspose2x2(nn.Module):
    """nn.ConvTranspose2d(in, out, kernel_size=2, stride=2): outputs are
    non-overlapping, so y[2i+a, 2j+b, o] = sum_c x[i, j, c] * W[c, o, a, b]
    — one einsum + reshape, exact and MXU-shaped.

    Kernel stored as [2, 2, in, out] (HWIO) for converter symmetry.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, C, self.features),
            jnp.float32,
        )
        y = jnp.einsum(
            "bhwc,uvco->bhuwvo", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        y = y.reshape(B, H * 2, W * 2, self.features)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def normalize_minmax(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample [min, max] -> [0, 1] (tiny_sc_ped.py:54-60,
    tiny_sc_pred_v2.py:46-50). x: [..., H, W]; constant inputs pass
    through unchanged."""
    mn = jnp.min(x, axis=(-2, -1), keepdims=True)
    mx = jnp.max(x, axis=(-2, -1), keepdims=True)
    return jnp.where(mx > mn, (x - mn) / jnp.where(mx > mn, mx - mn, 1.0), x)


def normalize_clip(x: jnp.ndarray, clip_abs: float = 3.0) -> jnp.ndarray:
    """clip(x, +-clip_abs) / clip_abs -> [-1, 1] (train_sc_ped.py:160)."""
    return jnp.clip(x, -clip_abs, clip_abs) / clip_abs
