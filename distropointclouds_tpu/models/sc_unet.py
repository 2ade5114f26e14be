"""ScanContextUNet: polar-aware multi-scale UNet (the reference's most
sophisticated model, trainer C).

Architecture of `tiny_sc_pred_v2.py:104-234`:
- PolarConv blocks: circular padding on the sector axis (the grid wraps
  at 360 deg), zero padding on rings (tiny_sc_pred_v2.py:104-117).
- 4-level UNet, base 32 -> bottleneck 512, ConvTranspose k2 s2 ups, skip
  concat ([up, skip] channel order — note: opposite of TinyUNet).
- MultiScaleOutput head: 3/5/7-kernel 1-channel heads blended by hard
  ring-range weights (near rings use the large kernel, far rings the
  small one, plus 0.3 x medium everywhere;
  tiny_sc_pred_v2.py:119-149).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU, ConvTranspose2x2, max_pool_2x2


class PolarDoubleConv(nn.Module):
    """Two PolarConv+BN+ReLU stages (tiny_sc_pred_v2.py:188-196)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(
            self.features, polar=True, use_bias=True, dtype=self.dtype, name="c1"
        )(x, train)
        x = ConvBNReLU(
            self.features, polar=True, use_bias=True, dtype=self.dtype, name="c2"
        )(x, train)
        return x


class MultiScaleOutput(nn.Module):
    """Ring-banded blend of 3/5/7-kernel heads
    (tiny_sc_pred_v2.py:119-149). The band boundaries are in *feature*
    rows, matching the reference's use of the input height at full
    resolution (60 / 90 rows)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        small = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                        name="small")(x)
        medium = nn.Conv(1, (5, 5), padding=[(2, 2)] * 2, dtype=self.dtype,
                         name="medium")(x)
        large = nn.Conv(1, (7, 7), padding=[(3, 3)] * 2, dtype=self.dtype,
                        name="large")(x)

        h = x.shape[1]
        rows = jnp.arange(h)
        near = jnp.where(rows < 60, 1.0, jnp.where(rows < 90, 0.5, 0.0))
        far = jnp.where(rows >= 90, 1.0, jnp.where(rows >= 60, 0.5, 0.0))
        near = near[None, :, None, None].astype(x.dtype)
        far = far[None, :, None, None].astype(x.dtype)
        return large * near + small * far + 0.3 * medium


class ScanContextUNet(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        e1 = PolarDoubleConv(32, dtype=d, name="enc1")(x, train)
        e2 = PolarDoubleConv(64, dtype=d, name="enc2")(max_pool_2x2(e1), train)
        e3 = PolarDoubleConv(128, dtype=d, name="enc3")(max_pool_2x2(e2), train)
        e4 = PolarDoubleConv(256, dtype=d, name="enc4")(max_pool_2x2(e3), train)
        bn = PolarDoubleConv(512, dtype=d, name="bottleneck")(
            max_pool_2x2(e4), train
        )

        y = ConvTranspose2x2(256, dtype=d, name="up4")(bn)
        y = PolarDoubleConv(256, dtype=d, name="dec4")(
            jnp.concatenate([y, e4], axis=-1), train
        )
        y = ConvTranspose2x2(128, dtype=d, name="up3")(y)
        y = PolarDoubleConv(128, dtype=d, name="dec3")(
            jnp.concatenate([y, e3], axis=-1), train
        )
        y = ConvTranspose2x2(64, dtype=d, name="up2")(y)
        y = PolarDoubleConv(64, dtype=d, name="dec2")(
            jnp.concatenate([y, e2], axis=-1), train
        )
        y = ConvTranspose2x2(32, dtype=d, name="up1")(y)
        y = PolarDoubleConv(32, dtype=d, name="dec1")(
            jnp.concatenate([y, e1], axis=-1), train
        )
        out = MultiScaleOutput(dtype=d, name="final")(y)
        return out.astype(jnp.float32)
