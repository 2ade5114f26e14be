"""Worker process for tests/test_multihost.py (NOT a test module).

Each worker is one simulated HOST: it owns 2 virtual CPU devices and
joins a 2-process jax.distributed cluster over a localhost coordinator,
forming a global ('data'=4,) mesh. It then runs ONE step of the real
trainer-B train step (TinyUNet + focal loss + optax, the same step the
single-process sharded test gates) on a globally-sharded batch whose
rows live on different HOSTS, so the gradient all-reduce XLA inserts
must cross the process boundary — the single-controller multi-host
pattern of SURVEY §2.4/P5 (`jax.distributed.initialize`,
`process_index`-sharded input, collectives over the mesh).

Prints one RESULT line: loss and a post-step parameter checksum. The
parent test asserts both workers print identical values and that the
loss matches a single-process run of the same step.
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    # Both the env var AND the config update: a sitecustomize hook
    # re-registers the tunneled TPU after env parsing (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from distropointclouds_tpu.core.config import MeshConfig, TrainConfig
    from distropointclouds_tpu.models.tiny_unet import TinyUNet
    from distropointclouds_tpu.parallel.mesh import make_mesh, process_shard
    from distropointclouds_tpu.train.loop import init_state, make_train_step

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 2
    n_dev = nproc * 2
    mesh = make_mesh(MeshConfig(data=n_dev, sector=1), jax.devices())

    # process_shard: the input-pipeline stripe (DistributedSampler
    # analog, kitti_dataloader.py:41-42) must follow process_index.
    stripe = process_shard(list(range(10)))
    assert stripe == list(range(10))[jax.process_index()::nproc], stripe

    cfg = TrainConfig(model="tiny_unet", grad_clip=1.0)
    model = TinyUNet(base=8)
    B, H, W = n_dev, 32, 96
    r = np.random.default_rng(0)
    bx = r.normal(size=(B, H, W, 1)).astype(np.float32)
    bt = (r.uniform(size=(B, H, W, 1)) < 0.05).astype(np.float32)
    state, tx = init_state(
        model, cfg, jax.random.key(0), jnp.zeros((1, H, W, 1)), 10
    )
    step = make_train_step(model, tx, cfg)

    xsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def globalize(host_array, sharding):
        h = np.asarray(host_array)
        return jax.make_array_from_callback(h.shape, sharding, lambda idx: h[idx])

    gbatch = {"x": globalize(bx, xsh), "target": globalize(bt, xsh)}
    gstate = jax.tree.map(lambda a: globalize(a, repl), state)

    sharded_step = jax.jit(
        step,
        in_shardings=(repl, {"x": xsh, "target": xsh}),
        out_shardings=(repl, repl),
    )
    new_state, metrics = sharded_step(gstate, gbatch)
    jax.block_until_ready(new_state)
    loss = float(np.asarray(metrics["loss"]))
    checksum = float(
        sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(new_state.params))
    )
    print(f"RESULT {loss:.8f} {checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
