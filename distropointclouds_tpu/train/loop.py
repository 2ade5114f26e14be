"""Jitted training step: functional state, optax optimizers, DP sharding.

Replaces the three PyTorch training loops (`tiny_sc_ped.py:159-191`,
`train_sc_ped.py:346-416`, `tiny_sc_pred_v2.py:266-301`) with one
functional step: ``(TrainState, batch) -> (TrainState, metrics)``,
compiled once and sharded over the ``data`` mesh axis. Gradient
all-reduce is inserted by XLA (replicated params + sharded batch), which
is the TPU-native equivalent of DDP/NCCL (SURVEY §2.4). Mixed precision
is bf16 compute with f32 params/optimizer state — no GradScaler needed
(the reference uses CUDA AMP + GradScaler, train_sc_ped.py:365-386).

Optimizer features cover all three trainers: Adam / AdamW, weight decay,
encoder-lr scaling (trainer C's param groups,
tiny_sc_pred_v2.py:483-494), cosine warm restarts (T0=10, T_mult=2,
tiny_sc_pred_v2.py:497-499), gradient clipping (:289).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..core.config import TrainConfig
from . import losses as L


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def cosine_warm_restarts(
    base_lr: float, steps_per_epoch: int, t0_epochs: int, t_mult: int,
    total_epochs: int,
) -> optax.Schedule:
    """torch CosineAnnealingWarmRestarts(T_0, T_mult): cosine cycles of
    length T0, T0*mult, T0*mult^2, ... (in epochs), restarting at base lr."""
    schedules = []
    boundaries = []
    t = t0_epochs
    covered = 0
    while covered < total_epochs:
        steps = max(1, t * steps_per_epoch)
        schedules.append(
            optax.cosine_decay_schedule(base_lr, decay_steps=steps, alpha=0.0)
        )
        covered += t
        boundaries.append(covered * steps_per_epoch)
        t *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


def make_optimizer(
    cfg: TrainConfig,
    params: Any,
    steps_per_epoch: int = 100,
) -> optax.GradientTransformation:
    if cfg.scheduler == "cosine_restarts":
        lr = cosine_warm_restarts(
            cfg.lr, steps_per_epoch, cfg.scheduler_t0, cfg.scheduler_t_mult,
            cfg.epochs,
        )
    else:
        lr = cfg.lr

    def base(lr_scale: float):
        sched = (lambda s: lr(s) * lr_scale) if callable(lr) else lr * lr_scale
        if cfg.weight_decay > 0:
            return optax.adamw(sched, weight_decay=cfg.weight_decay)
        return optax.adam(sched)

    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))

    if cfg.encoder_lr_scale != 1.0:
        # Trainer C param groups: encoder (enc*/bottleneck) at lr*scale,
        # decoder at full lr (tiny_sc_pred_v2.py:483-494).
        def group(path, _):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            is_enc = top.startswith("enc") or top == "bottleneck"
            return "encoder" if is_enc else "decoder"

        labels = jax.tree_util.tree_map_with_path(group, params)
        chain.append(
            optax.multi_transform(
                {"encoder": base(cfg.encoder_lr_scale), "decoder": base(1.0)},
                labels,
            )
        )
    else:
        chain.append(base(1.0))
    return optax.chain(*chain)


def compute_loss(
    cfg: TrainConfig,
    logits,
    batch: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Trainer-specific loss composition on [B, H, W, 1] logits.

    batch keys: 'target' (mask or heatmap), optional 'target_mask'
    (aux mask for trainer B's two-head mode), optional 'weight'
    (trainer C's adaptive pixel weights).
    """
    aux: Dict[str, jnp.ndarray] = {}
    if isinstance(logits, tuple):
        logits, mask_logits = logits
    else:
        mask_logits = None
    # Losses always reduce in f32 even when the model computes in bf16
    # (mixed precision): the analog of CUDA AMP's autocast running
    # BCE-with-logits in fp32 (train_sc_ped.py:365-386).
    logits = logits.astype(jnp.float32)
    if mask_logits is not None:
        mask_logits = mask_logits.astype(jnp.float32)
    y = batch["target"]
    # Per-sample weights [B] mask padded duplicate samples (the final
    # partial batch is padded by repetition for static shapes; weight 0
    # keeps them out of gradients and reported losses).
    sw = batch.get("sample_weight")
    if cfg.model == "tiny_cnn":
        # Trainer A: BCE(pos_weight) [+ dice] (tiny_sc_ped.py:159-175).
        loss = L.bce_with_logits(logits, y, cfg.pos_weight, sample_weight=sw)
        aux["bce"] = loss
        if cfg.use_dice:
            d = L.dice_loss(logits, y, sample_weight=sw)
            aux["dice"] = d
            loss = loss + d
    elif cfg.model == "sc_unet":
        # Trainer C: adaptive focal with pixel weights
        # (tiny_sc_pred_v2.py:239-261).
        loss = L.adaptive_focal_loss(
            logits, y, batch.get("weight"), cfg.focal_gamma, cfg.focal_alpha,
            sample_weight=sw,
        )
        aux["focal"] = loss
    else:
        # Trainer B: focal heatmap loss [+ aux mask loss]
        # (train_sc_ped.py:372-381).
        hm = L.bce_focal_loss(
            logits, y, cfg.focal_alpha, cfg.focal_gamma, sample_weight=sw
        )
        aux["heat_focal"] = hm
        loss = cfg.hm_loss_w * hm
        if mask_logits is not None and cfg.mask_loss_w > 0:
            m = L.bce_focal_loss(
                mask_logits, batch["target_mask"], cfg.focal_alpha,
                cfg.focal_gamma, sample_weight=sw,
            ) + L.dice_loss(mask_logits, batch["target_mask"], sample_weight=sw)
            aux["mask"] = m
            loss = loss + cfg.mask_loss_w * m
    aux["loss"] = loss
    return loss, aux


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jittable train step (grad + optax update + BN stats)."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"],
                train=True,
                mutable=["batch_stats"],
            )
            loss, aux = compute_loss(cfg, out, batch)
            return loss, (aux, mutated["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    return step


def make_eval_step(model, cfg: TrainConfig) -> Callable:
    """Eval-mode forward returning loss metrics + probabilities."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["x"],
            train=False,
        )
        loss, aux = compute_loss(cfg, out, batch)
        logits = out[0] if isinstance(out, tuple) else out
        logits = logits.astype(jnp.float32)  # f32 probs under bf16 compute
        aux["iou"] = L.iou_from_logits(
            logits, batch["target"], sample_weight=batch.get("sample_weight")
        )
        return aux, jax.nn.sigmoid(logits)

    return step


def init_state(
    model, cfg: TrainConfig, rng: jax.Array, sample_x: jnp.ndarray,
    steps_per_epoch: int = 100,
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(rng, sample_x, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, params, steps_per_epoch)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        ),
        tx,
    )
