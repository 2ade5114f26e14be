"""TinyUNet: the center-heatmap detector (flagship trainer B model).

Architecture of `train_sc_ped.py:217-285`: DoubleConv stem, 3 maxpool
Downs (base 32 -> 256), 3 bilinear-upsample Ups with skip concat
([skip, x] channel order), a 1x1 heat head and an optional 1x1 mask
head. Upsampling is align_corners=True bilinear, realized as
interpolation matmuls (see layers.py).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU, max_pool_2x2, upsample_bilinear_align_corners


class DoubleConv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, dtype=self.dtype, name="c1")(x, train)
        x = ConvBNReLU(self.features, dtype=self.dtype, name="c2")(x, train)
        return x


class Up(nn.Module):
    """Bilinear up + pad-to-skip + concat([skip, x]) + DoubleConv
    (train_sc_ped.py:241-253)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = upsample_bilinear_align_corners(x, 2)
        dh = skip.shape[1] - x.shape[1]
        dw = skip.shape[2] - x.shape[2]
        if dh or dw:
            x = jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)))
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class TinyUNet(nn.Module):
    base: int = 32
    out_heat: int = 1
    out_mask: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        b = self.base
        x1 = DoubleConv(b, dtype=self.dtype, name="inc")(x, train)
        x2 = DoubleConv(b * 2, dtype=self.dtype, name="d1")(max_pool_2x2(x1), train)
        x3 = DoubleConv(b * 4, dtype=self.dtype, name="d2")(max_pool_2x2(x2), train)
        x4 = DoubleConv(b * 8, dtype=self.dtype, name="d3")(max_pool_2x2(x3), train)

        y = Up(b * 4, dtype=self.dtype, name="u2")(x4, x3, train)
        y = Up(b * 2, dtype=self.dtype, name="u1")(y, x2, train)
        y = Up(b, dtype=self.dtype, name="u0")(y, x1, train)

        heat = nn.Conv(self.out_heat, (1, 1), dtype=self.dtype, name="head_heat")(y)
        heat = heat.astype(jnp.float32)
        if self.out_mask > 0:
            mask = nn.Conv(
                self.out_mask, (1, 1), dtype=self.dtype, name="head_mask"
            )(y)
            return heat, mask.astype(jnp.float32)
        return heat
