"""TinyCNN: the encoder-decoder segmenter matching the shipped checkpoint.

Architecture of `tiny_sc_ped.py:134-154` (140,993 params):
  enc: conv16 -> conv32 -> pool -> conv64 -> pool -> conv128 -> pool
  dec: 3 x (ConvTranspose k2 s2) -> 1x1 conv logits
each conv followed by BatchNorm + ReLU. Input [B, H, W, 1] (NHWC; the
reference is NCHW [B, 1, H, W]), output logits [B, H, W, 1].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU, ConvTranspose2x2, max_pool_2x2


class TinyCNN(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        x = ConvBNReLU(16, use_bias=True, dtype=d, name="enc1")(x, train)
        x = ConvBNReLU(32, use_bias=True, dtype=d, name="enc2")(x, train)
        x = max_pool_2x2(x)
        x = ConvBNReLU(64, use_bias=True, dtype=d, name="enc3")(x, train)
        x = max_pool_2x2(x)
        x = ConvBNReLU(128, use_bias=True, dtype=d, name="enc4")(x, train)
        x = max_pool_2x2(x)

        x = ConvTranspose2x2(64, dtype=d, name="dec1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=d, name="dbn1",
        )(x)
        x = nn.relu(x)
        x = ConvTranspose2x2(32, dtype=d, name="dec2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=d, name="dbn2",
        )(x)
        x = nn.relu(x)
        x = ConvTranspose2x2(16, dtype=d, name="dec3")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=d, name="dbn3",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), padding="VALID", dtype=d, name="head")(x)
        return x.astype(jnp.float32)
