"""Checkpoint manager details: best/last retention, variables-only
restore, metadata, missing-tag errors; torch converter details (TinyUNet
mask head, trainer-C dict format); schedules and optimizer edges."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distropointclouds_tpu.core.config import TrainConfig
from distropointclouds_tpu.models.tiny_cnn import TinyCNN
from distropointclouds_tpu.train.checkpoint import CheckpointManager
from distropointclouds_tpu.train.loop import init_state, make_train_step


@pytest.fixture()
def tiny_state():
    cfg = TrainConfig(model="tiny_cnn", lr=1e-2)
    model = TinyCNN()
    state, tx = init_state(model, cfg, jax.random.key(0), jnp.zeros((1, 16, 32, 1)))
    return cfg, model, state, tx


def test_checkpoint_roundtrip_and_meta(tmp_path, tiny_state):
    cfg, model, state, tx = tiny_state
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("last", state, epoch=3, metrics={"loss": 1.25, "f1": 0.5})
    assert mgr.has("last") and not mgr.has("best")

    restored, meta = mgr.restore("last", state)
    assert meta["epoch"] == 3
    assert meta["metrics"]["loss"] == 1.25
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # overwrite same tag with advanced state
    step = make_train_step(model, tx, cfg)
    batch = {"x": jnp.ones((2, 16, 32, 1)), "target": jnp.zeros((2, 16, 32, 1))}
    state2, _ = step(state, batch)
    mgr.save("last", state2, epoch=4)
    restored2, meta2 = mgr.restore("last", state2)
    assert meta2["epoch"] == 4
    assert int(restored2.step) == 1


def test_checkpoint_variables_only(tmp_path, tiny_state):
    cfg, model, state, tx = tiny_state
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("best", state, epoch=1)
    variables = mgr.restore_variables("best")
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.ones((1, 16, 32, 1)),
    )
    assert out.shape == (1, 16, 32, 1)


def test_checkpoint_missing_tag(tmp_path, tiny_state):
    _, _, state, _ = tiny_state
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        mgr.restore("best", state)
    with pytest.raises(FileNotFoundError):
        mgr.restore_variables("nope")


def test_tiny_unet_mask_head_import(tmp_path):
    """Two-head TinyUNet (out_mask > 0) converts and matches torch."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import build_torch_tinyunet

    from distropointclouds_tpu.models.tiny_unet import TinyUNet
    from distropointclouds_tpu.models.torch_import import load_tiny_unet

    torch.manual_seed(3)
    m = build_torch_tinyunet(out_mask=1)
    m.eval()
    ckpt = tmp_path / "two_head.pt"
    torch.save({"model": m.state_dict()}, ckpt)
    variables = load_tiny_unet(str(ckpt), out_mask=1)

    x = np.random.default_rng(0).normal(size=(1, 32, 96, 1)).astype(np.float32)
    with torch.no_grad():
        rh, rm = m(torch.tensor(x.transpose(0, 3, 1, 2)))
    gh, gm = TinyUNet(out_mask=1).apply(variables, jnp.asarray(x))
    assert np.abs(np.asarray(gh)[0, ..., 0] - rh[0, 0].numpy()).max() < 1e-4
    assert np.abs(np.asarray(gm)[0, ..., 0] - rm[0, 0].numpy()).max() < 1e-4


def test_optimizer_weight_decay_matters():
    """AdamW (trainer B) vs Adam (trainer A) produce different updates."""
    from distropointclouds_tpu.train.loop import make_optimizer

    params = {"w": jnp.ones((4, 4)) * 2.0}
    grads = {"w": jnp.ones((4, 4)) * 0.1}
    a = make_optimizer(TrainConfig(weight_decay=0.0, lr=1e-2), params)
    b = make_optimizer(TrainConfig(weight_decay=0.1, lr=1e-2), params)
    ua, _ = a.update(grads, a.init(params), params)
    ub, _ = b.update(grads, b.init(params), params)
    assert not np.allclose(np.asarray(ua["w"]), np.asarray(ub["w"]))


def test_checkpoint_npz_fallback_variables_only(tmp_path, tiny_state, monkeypatch):
    """With orbax unavailable, the npz fallback must still serve
    template-free inference restore (train_sc_ped.py:504-511 reload
    path on an orbax-less host)."""
    import distropointclouds_tpu.train.checkpoint as C

    monkeypatch.setattr(C, "_HAVE_ORBAX", False)
    cfg, model, state, tx = tiny_state
    mgr = C.CheckpointManager(str(tmp_path))
    mgr.save("best", state, epoch=1, metrics={"iou": 0.4})
    assert os.path.exists(tmp_path / "best.npz")

    # Template-free variables restore (inference path).
    variables = mgr.restore_variables("best")
    for a, b in zip(
        jax.tree.leaves(variables["params"]), jax.tree.leaves(state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.ones((1, 16, 32, 1)),
    )
    assert out.shape == (1, 16, 32, 1)

    # Template-based full-state restore still works from the same file.
    restored, meta = mgr.restore("best", state)
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
