"""TinyCNN forward on TPU: speed vs parity under matmul/conv precision.

The CNN is ~216 us/scan of the ~400 us/scan headline pipeline
(docs/PERF.md). Convs/einsums carry no explicit precision= today, so
they run at whatever lax DEFAULT lowers to on TPU. This probe measures,
at B=96:
  - forward time under precision 'bfloat16' / 'bfloat16_3x' ('tensorfloat32')
    / 'float32' (HIGHEST)
  - max |logit delta| vs the torch CPU reference (the 1e-4 parity
    contract, CLAUDE.md) on all four goldens
so we know (a) which precision DEFAULT actually is on this chip,
(b) whether a cheaper precision still satisfies parity.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.models.tiny_cnn import TinyCNN
from distropointclouds_tpu.models.layers import normalize_minmax
from distropointclouds_tpu.models import torch_import

B, H, W = 96, 160, 720
ITERS = 20


def torch_reference_logits(xs):
    """Torch CPU logits for normalized inputs xs [N, H, W] (the parity
    oracle; independent re-declaration as in tests/test_models.py)."""
    import torch
    import torch.nn as tnn

    class TorchTinyCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.enc = tnn.Sequential(
                tnn.Conv2d(1, 16, 3, padding=1), tnn.BatchNorm2d(16), tnn.ReLU(),
                tnn.Conv2d(16, 32, 3, padding=1), tnn.BatchNorm2d(32), tnn.ReLU(),
                tnn.MaxPool2d(2),
                tnn.Conv2d(32, 64, 3, padding=1), tnn.BatchNorm2d(64), tnn.ReLU(),
                tnn.MaxPool2d(2),
                tnn.Conv2d(64, 128, 3, padding=1), tnn.BatchNorm2d(128), tnn.ReLU(),
                tnn.MaxPool2d(2),
            )
            self.dec = tnn.Sequential(
                tnn.ConvTranspose2d(128, 64, 2, stride=2), tnn.BatchNorm2d(64), tnn.ReLU(),
                tnn.ConvTranspose2d(64, 32, 2, stride=2), tnn.BatchNorm2d(32), tnn.ReLU(),
                tnn.ConvTranspose2d(32, 16, 2, stride=2), tnn.BatchNorm2d(16), tnn.ReLU(),
                tnn.Conv2d(16, 1, 1),
            )

        def forward(self, x):
            return self.dec(self.enc(x))

    m = TorchTinyCNN()
    sd = torch.load(
        torch_import.REFERENCE_TINYCNN_PTH, map_location="cpu", weights_only=True
    )
    m.load_state_dict(sd)
    m.eval()
    with torch.no_grad():
        out = m(torch.from_numpy(xs)[:, None])[:, 0].numpy()
    return out


def main():
    print("devices:", jax.devices())
    ids = fixtures.GOLDEN_IDS
    scs = np.stack([fixtures.golden_descriptor(s).astype(np.float32) for s in ids])
    xs = np.asarray(normalize_minmax(jnp.asarray(scs)))
    ref = torch_reference_logits(xs)
    print("torch ref ready", ref.shape, ref.mean())
    sys.stdout.flush()

    variables = torch_import.load_tiny_cnn()
    model = TinyCNN()
    batch = jnp.asarray(np.stack([xs[i % len(ids)] for i in range(B)]))[..., None]
    batch = jax.device_put(batch)

    for prec in ("default", "bfloat16", "tensorfloat32", "float32"):
        ctx = (
            jax.default_matmul_precision(prec)
            if prec != "default"
            else _null_ctx()
        )
        with ctx:
            fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
            out = np.asarray(fwd(variables, batch))[..., 0]
            delta = float(np.abs(out[: len(ids)] - ref).max())
            # timing: dispatch all, fence only the last (in-order stream)
            def fence(o):
                return float(jnp.sum(o[:, 0, 0, 0]))

            fence(fwd(variables, batch))
            fence(fwd(variables, batch))
            t0 = time.perf_counter()
            outs = [fwd(variables, batch) for _ in range(ITERS)]
            fence(outs[-1])
            dt = (time.perf_counter() - t0) / ITERS
        print(
            json.dumps(
                {
                    "precision": prec,
                    "ms_batch": round(dt * 1e3, 2),
                    "us_per_scan": round(dt / B * 1e6, 1),
                    "max_abs_logit_delta_vs_torch": delta,
                    "parity_1e-4": bool(delta <= 1e-4),
                }
            )
        )
        sys.stdout.flush()


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
