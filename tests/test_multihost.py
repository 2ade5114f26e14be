"""Multi-HOST data parallelism, actually exercised (SURVEY §2.4 P5).

The single-host suite fakes 8 devices in one process; this test fakes
two HOSTS: two subprocesses, each owning 2 virtual CPU devices, joined
into one jax.distributed cluster over a localhost coordinator. The real
trainer-B train step runs once on a ('data'=4,) mesh whose batch rows
live on different processes — XLA's gradient all-reduce crosses the
process boundary — and both hosts must agree with each other exactly
and with a single-process run of the same step.

The reference's entire multi-host footprint is a never-enabled
DistributedSampler flag (kitti_dataloader.py:41-42, train_config.py:88)
and an uninitialized torch.distributed import (data_preparation.py:
12-14); this is the working TPU-native replacement under test.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert p.returncode == 0 and lines, (
            f"worker {i} rc={p.returncode}\n{out[-2000:]}"
        )
        results.append(lines[-1])
    # Cross-host agreement: one global program, one global answer.
    assert results[0] == results[1], results

    loss = float(results[0].split()[1])
    checksum = float(results[0].split()[2])

    # Single-process reference of the identical step on the full batch.
    from distropointclouds_tpu.core.config import TrainConfig
    from distropointclouds_tpu.models.tiny_unet import TinyUNet
    from distropointclouds_tpu.train.loop import init_state, make_train_step

    cfg = TrainConfig(model="tiny_unet", grad_clip=1.0)
    model = TinyUNet(base=8)
    B, H, W = 4, 32, 96
    r = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(r.normal(size=(B, H, W, 1)).astype(np.float32)),
        "target": jnp.asarray(
            (r.uniform(size=(B, H, W, 1)) < 0.05).astype(np.float32)
        ),
    }
    state, tx = init_state(
        model, cfg, jax.random.key(0), jnp.zeros((1, H, W, 1)), 10
    )
    ref_state, ref_metrics = jax.jit(make_train_step(model, tx, cfg))(
        state, batch
    )
    np.testing.assert_allclose(
        loss, float(np.asarray(ref_metrics["loss"])), rtol=2e-4, atol=1e-6
    )
    ref_checksum = float(
        sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(ref_state.params))
    )
    # Adam's first step is ~+-lr per element; reduction-order ulps can
    # flip a few near-zero-gradient updates (same caveat as the
    # single-host sharded test), which moves a |params| checksum by
    # O(a few * 2*lr). Bound loosely; the strong gates are above.
    assert abs(checksum - ref_checksum) < 100 * cfg.lr, (
        checksum, ref_checksum
    )
