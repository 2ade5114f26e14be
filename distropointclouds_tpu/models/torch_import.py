"""One-time PyTorch checkpoint -> flax params converters.

The only shipped weights in the reference are
``distro_model/tinycnn_best.pth`` (a bare ``state_dict`` for
`tiny_sc_ped.TinyCNN`, 140,993 params — SURVEY §2.1). Converters are
also provided for trainer B/C checkpoints (``{"model": state_dict, ...}``
dicts, `train_sc_ped.py:530-541` / `tiny_sc_pred_v2.py:568-576`) so
users can migrate their own trained weights.

Layout conversions:
  torch Conv2d weight  (O, I, kH, kW) -> flax HWIO  (kH, kW, I, O)
  torch ConvTranspose2d weight (I, O, 2, 2) -> ConvTranspose2x2 kernel
      layout (2, 2, I, O)
  torch BatchNorm {weight, bias, running_mean, running_var} ->
      flax params {scale, bias} + batch_stats {mean, var}

torch is used only to deserialize the pickle; everything downstream is
numpy/JAX. Works with torch's CPU build.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

REFERENCE_TINYCNN_PTH = "/root/reference/distro_model/tinycnn_best.pth"


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "items"):
        obj = obj["model"]  # trainer B/C checkpoint dicts
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _conv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _convT(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 0, 1)}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _bn(sd, key) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}
    return params, stats


def load_tiny_cnn(path: str = REFERENCE_TINYCNN_PTH) -> Dict:
    """Convert tinycnn_best.pth into flax variables for
    :class:`~distropointclouds_tpu.models.tiny_cnn.TinyCNN`.

    Returns {"params": ..., "batch_stats": ...}. Key map follows the
    reference's Sequential indices (tiny_sc_ped.py:137-151).
    """
    sd = _load_state_dict(path)
    params: Dict = {}
    stats: Dict = {}

    enc_pairs = [("enc1", 0, 1), ("enc2", 3, 4), ("enc3", 7, 8), ("enc4", 11, 12)]
    for name, ci, bi in enc_pairs:
        bn_p, bn_s = _bn(sd, f"enc.{bi}")
        params[name] = {"conv": _conv(sd, f"enc.{ci}"), "bn": bn_p}
        stats[name] = {"bn": bn_s}

    dec_pairs = [("dec1", "dbn1", 0, 1), ("dec2", "dbn2", 3, 4), ("dec3", "dbn3", 6, 7)]
    for cname, bname, ci, bi in dec_pairs:
        params[cname] = _convT(sd, f"dec.{ci}")
        bn_p, bn_s = _bn(sd, f"dec.{bi}")
        params[bname] = bn_p
        stats[bname] = bn_s

    params["head"] = _conv(sd, "dec.9")
    return {
        "params": _to_jnp(params),
        "batch_stats": _to_jnp(stats),
    }


def load_tiny_unet(path: str, out_mask: int = 0) -> Dict:
    """Convert a trainer-B checkpoint (train_sc_ped.py:530-541) into flax
    variables for TinyUNet. Module key map follows train_sc_ped.py:255-270."""
    sd = _load_state_dict(path)
    params: Dict = {}
    stats: Dict = {}

    def double_conv(dst: str, src: str):
        p: Dict = {}
        s: Dict = {}
        for i, sub in enumerate(["c1", "c2"]):
            bn_p, bn_s = _bn(sd, f"{src}.net.{i}.bn")
            p[sub] = {"conv": _conv(sd, f"{src}.net.{i}.conv"), "bn": bn_p}
            s[sub] = {"bn": bn_s}
        params[dst] = p
        stats[dst] = s

    double_conv("inc", "inc")
    for dst, src in [("d1", "d1"), ("d2", "d2"), ("d3", "d3")]:
        double_conv(dst, f"{src}.conv")
    for dst, src in [("u2", "u2"), ("u1", "u1"), ("u0", "u0")]:
        p: Dict = {}
        s: Dict = {}
        for i, sub in enumerate(["c1", "c2"]):
            bn_p, bn_s = _bn(sd, f"{src}.conv.net.{i}.bn")
            p[sub] = {"conv": _conv(sd, f"{src}.conv.net.{i}.conv"), "bn": bn_p}
            s[sub] = {"bn": bn_s}
        params[dst] = {"conv": p}
        stats[dst] = {"conv": s}
    params["head_heat"] = _conv(sd, "head_heat")
    if out_mask > 0:
        params["head_mask"] = _conv(sd, "head_mask")
    return {"params": _to_jnp(params), "batch_stats": _to_jnp(stats)}


def load_sc_unet(path: str) -> Dict:
    """Convert a trainer-C checkpoint (tiny_sc_pred_v2.py:568-576) into
    flax variables for ScanContextUNet. Key map follows
    tiny_sc_pred_v2.py:151-196 (_conv_block Sequential indices:
    0 PolarConv, 1 BN, 3 PolarConv, 4 BN)."""
    sd = _load_state_dict(path)
    params: Dict = {}
    stats: Dict = {}

    def block(dst: str, src: str):
        p: Dict = {}
        s: Dict = {}
        for sub, ci, bi in [("c1", 0, 1), ("c2", 3, 4)]:
            bn_p, bn_s = _bn(sd, f"{src}.{bi}")
            p[sub] = {"conv": _conv(sd, f"{src}.{ci}.conv"), "bn": bn_p}
            s[sub] = {"bn": bn_s}
        params[dst] = p
        stats[dst] = s

    for dst, src in [
        ("enc1", "enc1"), ("enc2", "enc2"), ("enc3", "enc3"), ("enc4", "enc4"),
        ("bottleneck", "bottleneck"),
        ("dec4", "dec4"), ("dec3", "dec3"), ("dec2", "dec2"), ("dec1", "dec1"),
    ]:
        block(dst, src)
    for dst, src in [
        ("up4", "upconv4"), ("up3", "upconv3"), ("up2", "upconv2"), ("up1", "upconv1")
    ]:
        params[dst] = _convT(sd, src)
    params["final"] = {
        "small": _conv(sd, "final.small_obj_head"),
        "medium": _conv(sd, "final.medium_obj_head"),
        "large": _conv(sd, "final.large_obj_head"),
    }
    return {"params": _to_jnp(params), "batch_stats": _to_jnp(stats)}


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
