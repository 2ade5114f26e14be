"""Checkpoint save/restore with true mid-training resume.

The reference only saves (`tiny_sc_ped.py:257-265` bare state_dict on
best IoU; `train_sc_ped.py:530-541` {"model", "epoch", "metrics"} last +
best; `tiny_sc_pred_v2.py:568-576` full dict incl. optimizer/scheduler)
and can reload weights for eval (`--ckpt/--eval_only`,
train_sc_ped.py:504-511) but has no resume of optimizer state in
trainers A/B. Here every checkpoint carries
{params, batch_stats, opt_state, step} plus host metadata
{epoch, metrics, best}, via orbax; ``latest``/``best`` retention mirrors
the reference's last.pt / best.pt pair.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .loop import TrainState

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _flatten_vars(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    """Flatten a nested mapping of arrays into '/'-joined keys."""
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if hasattr(v, "items"):
            out.update(_flatten_vars(v, key))
        else:
            out[key] = np.asarray(v)
    return out


class CheckpointManager:
    """last/best checkpoints + metadata under one directory."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._ckptr = ocp.StandardCheckpointer()

    # -- paths ---------------------------------------------------------
    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def _meta_path(self, tag: str) -> str:
        return os.path.join(self.directory, f"{tag}.meta.json")

    # -- save ----------------------------------------------------------
    def save(
        self,
        tag: str,
        state: TrainState,
        epoch: int,
        metrics: Optional[Dict[str, float]] = None,
    ) -> None:
        state = jax.device_get(state)
        if _HAVE_ORBAX:
            path = self._path(tag)
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            self._ckptr.save(path, state)
            self._ckptr.wait_until_finished()
        else:  # numpy fallback
            flat, treedef = jax.tree.flatten(state)
            # Alongside the positional entries (template-based restore),
            # store model variables under structured 'v:' keys so
            # restore_variables works template-free on orbax-less hosts.
            var_entries = {
                f"v:{k}": v
                for k, v in {
                    **_flatten_vars(state.params, "params"),
                    **_flatten_vars(state.batch_stats, "batch_stats"),
                }.items()
            }
            np.savez(
                self._path(tag) + ".npz",
                **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)},
                **var_entries,
            )
        with open(self._meta_path(tag), "w") as f:
            json.dump(
                {
                    "epoch": int(epoch),
                    "metrics": {
                        k: float(v) for k, v in (metrics or {}).items()
                    },
                    "step": int(np.asarray(state.step)),
                },
                f,
                indent=2,
            )

    # -- restore -------------------------------------------------------
    def restore(self, tag: str, template: TrainState) -> Tuple[TrainState, Dict]:
        """Restore into the structure of ``template`` (an initialized
        TrainState with matching shapes)."""
        meta = {}
        if os.path.exists(self._meta_path(tag)):
            meta = json.load(open(self._meta_path(tag)))
        if _HAVE_ORBAX and os.path.isdir(self._path(tag)):
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), template
            )
            state = self._ckptr.restore(self._path(tag), abstract)
            return state, meta
        npz = self._path(tag) + ".npz"
        if os.path.exists(npz):
            data = np.load(npz)
            flat, treedef = jax.tree.flatten(template)
            restored = [data[f"a{i}"] for i in range(len(flat))]
            return jax.tree.unflatten(treedef, restored), meta
        raise FileNotFoundError(f"no checkpoint '{tag}' in {self.directory}")

    def restore_variables(self, tag: str) -> Dict:
        """Template-free restore of model variables only — for inference
        (the analog of loading just the 'model' entry of a reference
        checkpoint dict, train_sc_ped.py:504-511). Returns
        {"params": ..., "batch_stats": ...}."""
        if _HAVE_ORBAX and os.path.isdir(self._path(tag)):
            raw = self._ckptr.restore(self._path(tag))
            return {
                "params": raw["params"],
                "batch_stats": raw["batch_stats"],
            }
        npz = self._path(tag) + ".npz"
        if os.path.exists(npz):
            data = np.load(npz)
            out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
            found = False
            for name in data.files:
                if not name.startswith("v:"):
                    continue
                found = True
                parts = name[2:].split("/")
                node = out
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = data[name]
            if found:
                return out
        raise FileNotFoundError(f"no checkpoint '{tag}' in {self.directory}")

    def has(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag)) or os.path.exists(
            self._path(tag) + ".npz"
        )
