"""The high-level training driver: epochs, eval, checkpoints, early stop.

One `fit()` covers all three reference trainers (their loops differ only
in config — SURVEY §3.3): per-epoch train + val passes with jitted
steps, center-matching or IoU eval, best/last checkpointing
(train_sc_ped.py:530-541), early stopping and a final held-out test pass
(tiny_sc_pred_v2.py:579-605), and a structured JSONL metrics log instead
of prints (SURVEY §5 observability).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..ops.postprocess import extract_peaks
from ..core.config import DetectorConfig
from . import metrics as M
from .checkpoint import CheckpointManager
from .data import (
    ScanContextArrays,
    build_targets,
    epoch_batches,
    prefetch_to_device,
    split_indices,
)
from .loop import TrainState, init_state, make_eval_step, make_train_step


def fit(
    data: ScanContextArrays,
    cfg: TrainConfig,
    model=None,
    log_path: Optional[str] = None,
    resume: bool = False,
    eval_threshold: float = 0.35,
    mesh=None,
    eval_only: bool = False,
    vis_dir: Optional[str] = None,
    split: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    eval_every: int = 1,
    track_test: bool = False,
) -> Tuple[TrainState, Dict[str, float]]:
    """Train per the given TrainConfig; returns (best_state, final metrics).

    Selection metric: center-matching F1 for tiny_unet
    (train_sc_ped.py:536: best.pt on F1), pixel IoU otherwise
    (tiny_sc_ped.py:262, tiny_sc_pred_v2 uses F1 over pixels — we use
    IoU for tiny_cnn and pixel F1 for sc_unet).

    Selection (val split) and reporting (test split) are decoupled, the
    reference's own protocol (train_sc_ped.py:491-492,544-548: best.pt
    by *val* F1, final report on a separate *test* split): the best
    checkpoint is picked on ``va_idx`` only, and the returned final
    metrics come from ``te_idx`` at that fixed checkpoint. With
    ``track_test=True`` the test split is ALSO evaluated on every eval
    epoch — logged as ``test_*`` and summarized as
    ``test_f1_biased_max`` (the max-over-epochs number an eval-set
    selection would have reported; kept on record as the explicitly
    labeled optimistic upper bound, never used for selection).

    eval_every: run the validation pass (which includes the host-bound
    greedy center matcher) every N epochs instead of every epoch; the
    final epoch always evaluates. Checkpoint selection / early stopping
    tick only on evaluated epochs.
    """
    from ..pipeline import MODELS

    if model is None:
        # compute_dtype: bf16 activations with f32 params/optimizer state
        # — the TPU-native analog of trainer B's CUDA AMP + GradScaler
        # (train_sc_ped.py:365-386,515; no loss scaling needed in bf16).
        model = MODELS[cfg.model](dtype=jnp.dtype(cfg.compute_dtype))

    n = len(data)
    if cfg.device_cache and mesh is None:
        # Device-resident dataset: epochs gather batches in HBM and ship
        # only index arrays (kills the per-epoch H2D re-upload; measured
        # in docs/PERF.md "KITTI-scale dress rehearsal").
        data = data.to_device()
    if split is not None:
        # Explicit index split (e.g. hold out specific golden scans).
        tr_idx, va_idx, te_idx = (np.asarray(s, np.int64) for s in split)
    else:
        tr_idx, va_idx, te_idx = split_indices(
            n, cfg, shuffle=cfg.model != "tiny_cnn"
        )
    steps_per_epoch = max(1, len(tr_idx) // cfg.batch_size)

    rng = jax.random.key(cfg.seed)
    state, tx = init_state(
        model,
        cfg,
        rng,
        jnp.zeros((1, cfg.height, cfg.width, 1)),
        steps_per_epoch,
    )
    if mesh is not None:
        # Data-parallel: replicated state, batch sharded over 'data'.
        # XLA inserts the gradient all-reduce over ICI (SURVEY §2.4).
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        bshard = NamedSharding(mesh, P("data"))
        train_step = jax.jit(
            make_train_step(model, tx, cfg),
            in_shardings=(repl, bshard),
            out_shardings=(repl, repl),
        )
        eval_step = jax.jit(
            make_eval_step(model, cfg),
            in_shardings=(repl, bshard),
            out_shardings=(repl, repl),
        )
    else:
        train_step = jax.jit(make_train_step(model, tx, cfg))
        eval_step = jax.jit(make_eval_step(model, cfg))
    targets_train = jax.jit(
        lambda b, k: build_targets(b, cfg, k)
    )
    targets_eval = jax.jit(
        lambda b: build_targets(
            b,
            TrainConfig(**{**cfg.__dict__, "roll_aug": False, "mask_dropout": 0.0}),
            None,
        )
    )

    ckpt = CheckpointManager(cfg.ckpt_dir)
    start_epoch = 1
    best_metric = -np.inf
    resumed_best_state = None
    resumed_biased: Dict[str, float] = {}
    resumed_best_epoch = 0
    if resume and ckpt.has("last"):
        state, meta = ckpt.restore("last", state)
        start_epoch = meta.get("epoch", 0) + 1
        best_metric = meta.get("metrics", {}).get("best_metric", -np.inf)
        # tbm_-prefixed flat floats: CheckpointManager meta coerces
        # every value through float(), so the tracker is stored flat.
        resumed_biased = {
            k[len("tbm_"):]: v
            for k, v in meta.get("metrics", {}).items()
            if k.startswith("tbm_")
        }
        if ckpt.has("best"):
            # The pre-stall best checkpoint must stay the reporting
            # state until an evaluated epoch beats it — resuming with
            # best_state = last silently reported the stall point.
            resumed_best_state, best_meta = ckpt.restore("best", state)
            resumed_best_epoch = best_meta.get("epoch", 0)

    host_rng = np.random.default_rng(cfg.seed)
    log_f = open(log_path, "a") if log_path else None

    def log(rec: Dict):
        if log_f:
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()

    # Batched peak extraction, jitted ONCE (the reference loops
    # extract_peaks per val image, train_sc_ped.py:419-464; on a 1-core
    # host that makes eval dispatch-bound — here it's one device program
    # per eval batch; only the greedy matcher stays on host).
    det_cfg = DetectorConfig()
    peaks_fn = jax.jit(
        lambda p: extract_peaks(p, det_cfg, threshold=eval_threshold)
    )

    def run_eval(idx: np.ndarray, epoch: int = 0) -> Dict[str, float]:
        if len(idx) == 0:
            return {}
        saved_vis = False
        losses: List[Tuple[float, int]] = []
        ious: List[Tuple[float, int]] = []
        tp = fp = fn = 0
        pix = {"tp": 0.0, "fp": 0.0, "fn": 0.0}
        band_pix: Dict[str, Dict[str, float]] = {}
        for batch in epoch_batches(
            data, idx, cfg.batch_size, host_rng, shuffle=False
        ):
            n_real = int(batch.pop("n_real"))
            dev = targets_eval(jax.device_put(batch))
            aux, probs = eval_step(state, dev)
            det_batch = peaks_fn(probs[..., 0]) if cfg.model == "tiny_unet" else None
            losses.append((float(aux["loss"]), n_real))
            ious.append((float(aux["iou"]), n_real))
            p = np.asarray(probs)[..., 0][:n_real]
            t = np.asarray(dev["target"])[..., 0][:n_real]
            if vis_dir and not saved_vis and n_real:
                # Per-epoch validation overlay (train_sc_ped.py:107-129,
                # 455-459: background SC + predicted heat + GT centers).
                try:
                    from ..utils.viz import save_overlay

                    os.makedirs(vis_dir, exist_ok=True)
                    centers0 = [
                        tuple(map(int, np.asarray(batch["centers"])[0, j]))
                        for j in range(batch["ped_valid"].shape[1])
                        if np.asarray(batch["ped_valid"])[0, j]
                    ]
                    save_overlay(
                        np.asarray(batch["sc"])[0], p[0], centers0,
                        os.path.join(vis_dir, f"val_epoch{epoch:03d}.png"),
                        cfg.clip_abs_z,
                    )
                    saved_vis = True
                except Exception:
                    saved_vis = True
            if cfg.model == "tiny_unet":
                # center matching against GT centers (train_sc_ped eval);
                # peaks came from ONE batched device call above — only
                # the greedy wrap-aware matcher runs on host.
                centers = np.asarray(batch["centers"])[:n_real]
                valid = np.asarray(batch["ped_valid"])[:n_real]
                d_ring = np.asarray(det_batch.ring)[:n_real]
                d_sector = np.asarray(det_batch.sector)[:n_real]
                d_score = np.asarray(det_batch.score)[:n_real]
                d_valid = np.asarray(det_batch.valid)[:n_real]
                for bi in range(n_real):
                    preds = [
                        (float(r), float(s), float(v))
                        for r, s, v, ok in zip(
                            d_ring[bi], d_sector[bi], d_score[bi], d_valid[bi]
                        )
                        if ok
                    ]
                    gts = [
                        tuple(map(int, centers[bi, j]))
                        for j in range(valid.shape[1])
                        if valid[bi, j]
                    ]
                    # num_sector follows the training grid so sector
                    # wrap stays correct on reduced-resolution grids.
                    a, b, c = M.match_centers(preds, gts, num_sector=cfg.width)
                    tp, fp, fn = tp + a, fp + b, fn + c
            else:
                pm = M.pixel_metrics(jnp.asarray(p), jnp.asarray(t))
                for k in ("tp", "fp", "fn"):
                    pix[k] += float(pm[k])
                if cfg.model == "sc_unet":
                    # Range-stratified bands with banded thresholds
                    # (tiny_sc_pred_v2.py:303-410).
                    for band, bm in M.range_stratified_metrics(
                        jnp.asarray(p), jnp.asarray(t)
                    ).items():
                        acc = band_pix.setdefault(
                            band, {"tp": 0.0, "fp": 0.0, "fn": 0.0}
                        )
                        for k in ("tp", "fp", "fn"):
                            acc[k] += float(bm[k])
        # Weight per-batch means by their real sample counts so the
        # padded final batch doesn't skew the epoch averages.
        out = {
            "loss": float(np.average([v for v, _ in losses],
                                     weights=[w for _, w in losses])),
            "iou": float(np.average([v for v, _ in ious],
                                    weights=[w for _, w in ious])),
        }
        if cfg.model == "tiny_unet":
            out.update(M.precision_recall_f1(tp, fp, fn))
        else:
            out.update(
                M.precision_recall_f1(int(pix["tp"]), int(pix["fp"]), int(pix["fn"]))
            )
            for band, acc in band_pix.items():
                bf = M.precision_recall_f1(
                    int(acc["tp"]), int(acc["fp"]), int(acc["fn"])
                )
                out[f"{band}_f1"] = bf["f1"]
        return out

    if eval_only:
        # train_sc_ped.py:504-511 --eval_only: reload best and evaluate.
        if ckpt.has("best"):
            state, _ = ckpt.restore("best", state)
        val = {f"val_{k}": v for k, v in run_eval(va_idx).items()}
        test = {f"test_{k}": v for k, v in run_eval(te_idx).items()}
        out = {**val, **test}
        log({"eval_only": out})
        print("eval_only:", out)
        if log_f:
            log_f.close()
        return state, out

    patience_left = cfg.early_stop_patience or np.inf
    best_state = resumed_best_state if resumed_best_state is not None else state
    best_epoch = resumed_best_epoch
    test_biased_max: Dict[str, float] = resumed_biased
    history: Dict[str, List[float]] = {}
    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        train_losses = []
        train_counts = []
        it = epoch_batches(data, tr_idx, cfg.batch_size, host_rng, shuffle=True)
        for batch in prefetch_to_device(it, size=2):
            train_counts.append(int(batch.pop("n_real")))
            rng, sub = jax.random.split(rng)
            dev = targets_train(batch, sub)
            state, aux = train_step(state, dev)
            train_losses.append(aux["loss"])
        train_loss = float(
            np.average(np.asarray(jnp.stack(train_losses)), weights=train_counts)
        )

        do_eval = (epoch % max(1, eval_every) == 0) or epoch == cfg.epochs
        val = run_eval(va_idx, epoch) if do_eval else {}
        sel = val.get("f1" if cfg.model != "tiny_cnn" else "iou", 0.0)
        test_now: Dict[str, float] = {}
        if do_eval and track_test and len(te_idx):
            # Per-epoch held-out tracking: logged, never selected on.
            test_now = run_eval(te_idx)
            sel_key = "f1" if cfg.model != "tiny_cnn" else "iou"
            if test_now.get(sel_key, 0.0) >= test_biased_max.get(sel_key, -1.0):
                test_biased_max = dict(test_now)
                test_biased_max["epoch"] = epoch
        rec = {
            "epoch": epoch,
            "train_loss": train_loss,
            "time_s": round(time.time() - t0, 2),
            **{f"val_{k}": v for k, v in val.items()},
            **{f"test_{k}": v for k, v in test_now.items()},
        }
        log(rec)
        for k, v in rec.items():
            if isinstance(v, (int, float)) and k != "epoch":
                history.setdefault(k, []).append(float(v))
        print(
            f"[epoch {epoch:03d}] train_loss={train_loss:.4f} "
            + " ".join(f"val_{k}={v:.4f}" for k, v in val.items())
        )

        ckpt.save(
            "last",
            state,
            epoch,
            {**val, "best_metric": best_metric,
             **{f"tbm_{k}": float(v) for k, v in test_biased_max.items()}},
        )
        if do_eval:
            if sel > best_metric:
                best_metric = sel
                best_state = state
                best_epoch = epoch
                ckpt.save(
                    "best", state, epoch, {**val, "best_metric": best_metric}
                )
                patience_left = cfg.early_stop_patience or np.inf
            else:
                patience_left -= 1
                if patience_left <= 0:
                    print(f"early stop at epoch {epoch}")
                    break

    final: Dict[str, float] = {}
    if len(te_idx):
        state = best_state
        final = {f"test_{k}": v for k, v in run_eval(te_idx).items()}
        final["best_epoch"] = best_epoch
        if track_test and test_biased_max:
            # The number the old (biased) protocol would have headlined:
            # max over evaluated epochs of the test metric itself.
            sel_key = "f1" if cfg.model != "tiny_cnn" else "iou"
            final[f"test_{sel_key}_biased_max"] = test_biased_max.get(sel_key, 0.0)
            final["test_biased_max_epoch"] = test_biased_max.get("epoch", 0)
        log({"final": final})
        print("test:", final)
    if log_f:
        log_f.close()
    if history:
        # Training-history curves (tiny_sc_pred_v2.py:611-662).
        try:
            from ..utils.viz import plot_training_history

            plot_training_history(
                history, os.path.join(cfg.ckpt_dir, "training_history.png")
            )
        except Exception:
            pass
    return best_state, final
