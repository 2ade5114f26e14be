"""Fused Pallas TinyCNN inference: VMEM-resident planar conv kernels.

Replaces the flax/XLA TinyCNN forward (`models/tiny_cnn.py`, reference
`tiny_sc_ped.py:134-154`) for deployment: XLA lowers the 8-layer CNN as
separate conv calls whose activations round-trip HBM (~160 us/scan at
bf16, docs/PERF.md bias-add finding). Here the network runs as FOUR
Pallas kernels that keep activations in VMEM and express every conv as
one planar MXU matmul:

- layout: activations are [C, L] with the flattened spatial dim on
  LANES (L = H*W), channels on sublanes. A 3x3 conv is then
  ``W [Cout, 9*Cin+1] @ im2col [9*Cin+1, L]`` where im2col stacks 9
  lane-rotated copies of the input (plus a ones row carrying the bias)
  -- K and N both MXU-shaped (N huge, K = 9*Cin), unlike the
  channels-on-lanes form whose N = Cout <= 32 wastes 4-8x of the MXU.
- BatchNorm (eval mode) folds into the conv weights (`fold_weights`).
- the k2s2 ConvTranspose decoder has NO spatial mixing, so it stays
  phase-decomposed ([4^k phases, 1800] at 20x90) and the final
  depth-to-space interleave is one cheap XLA transpose of the logits.
- 2x2 max pools (the only ops needing lane decimation, which Mosaic
  has no cheap primitive for) run in XLA between kernels; their HBM
  cost is ~17 us/scan total.

Kernels (per scan; strips are 128-lane-aligned, halo slack sized so
strip-edge rotation artifacts never reach the written interior):
  K1  conv1+conv2 (160x720), grid (B, 10) strips of 16 rows
  K2  conv3       (80x360),  grid (B, 5) strips of 16 rows
  K3  conv4       (40x180),  grid (B,), whole level, K-chunked
  K4  decoder (3 deconvs + head) at 20x90, grid (B,), pure matmuls

The kernel bodies are pure jnp on 2-D arrays: the SAME functions run
under Pallas on TPU and as a plain vmapped XLA program on CPU
(``use_pallas=False``), which is how the parity tests pin them against
the flax model.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

H, W = 160, 720
L = H * W                      # 115200
SLACK1, LS1, NS1 = 1536, 11520, 10       # level 1 strips (16 rows)
XS1 = LS1 + 2 * SLACK1                   # 14592
LPAD1 = L + 2 * SLACK1                   # 118272

H2, W2 = 80, 360
L2 = H2 * W2                   # 28800
SLACK2, LS2, NS2 = 384, 5760, 5          # level 2 strips (16 rows)
XS2 = LS2 + 2 * SLACK2                   # 6528
LPAD2 = L2 + 2 * SLACK2                  # 29568

H3, W3 = 40, 180
L3 = H3 * W3                   # 7200
PADL3, PADR3 = 256, 352
LPAD3 = PADL3 + L3 + PADR3               # 7808 = 61*128

H4, W4 = 20, 90
L4 = H4 * W4                   # 1800
LPAD4 = 1920                             # 15*128


def fold_weights(variables: Dict, eps: float = 1e-5) -> Dict[str, jnp.ndarray]:
    """Fold eval-mode BatchNorm into conv weights and pack them planar.

    Returns f32 matrices — the caller casts them to the compute dtype
    (biases ride as the last column, consumed by a ones row in the
    im2col):
      w1 [16, 10]    conv1  (9 taps * 1 ch + bias)
      w2 [32, 145]   conv2  (9 * 16 + bias)
      w3 [64, 289]   conv3
      w4c0 [128, 193], w4c1/w4c2 [128, 192]   conv4 dh-chunks
      wd1 [256, 129], wd2 [128, 65], wd3 [64, 33]  deconvs (phase-major)
      wh4 [4, 65]    head + per-p3 channel sum as one block dot
    """
    p = variables["params"]
    s = variables["batch_stats"]

    def bn(prefix, name="bn"):
        g = p[prefix][name]["scale"]
        b = p[prefix][name]["bias"]
        m = s[prefix][name]["mean"]
        v = s[prefix][name]["var"]
        k = g / jnp.sqrt(v + eps)
        return k, b - m * k

    def conv(prefix):
        k = p[prefix]["conv"]["kernel"]          # [3, 3, Cin, Cout]
        bias = p[prefix]["conv"].get("bias", 0.0)
        sc, sb = bn(prefix)
        kk = k * sc[None, None, None, :]
        bb = bias * sc + sb
        cout = k.shape[-1]
        # rows = Cout, cols = tap-major (t*Cin + c), tap t=(dh+1)*3+(dw+1)
        wm = jnp.transpose(kk, (3, 0, 1, 2)).reshape(cout, -1)
        return jnp.concatenate([wm, bb[:, None]], axis=1)

    def deconv(prefix, bnname):
        k = p[prefix]["kernel"]                  # [2, 2, Cin, Cout]
        bias = p[prefix]["bias"]
        # decoder BNs are top-level flax modules (models/tiny_cnn.py)
        g = p[bnname]["scale"]
        b = p[bnname]["bias"]
        m = s[bnname]["mean"]
        v = s[bnname]["var"]
        sc = g / jnp.sqrt(v + eps)
        sb = b - m * sc
        kk = k * sc[None, None, None, :]
        bb = bias * sc + sb
        cin, cout = k.shape[2], k.shape[3]
        # rows phase-major: row = (a*2+b)*Cout + o, cols = Cin (+ bias)
        wm = jnp.transpose(kk, (0, 1, 3, 2)).reshape(4 * cout, cin)
        bcol = jnp.tile(bb, 4)[:, None]
        return jnp.concatenate([wm, bcol], axis=1)

    w4 = conv("enc4")                            # [128, 577]
    out = {
        "w1": conv("enc1"),
        "w2": conv("enc2"),
        "w3": conv("enc3"),
        # conv4 K-chunks: dh = -1 taps (+ bias), dh = 0, dh = +1
        "w4c0": jnp.concatenate([w4[:, 0:192], w4[:, 576:577]], axis=1),
        "w4c1": w4[:, 192:384],
        "w4c2": w4[:, 384:576],
        "wd1": deconv("dec1", "dbn1"),
        "wd2": deconv("dec2", "dbn2"),
        "wd3": deconv("dec3", "dbn3"),
    }
    hk = p["head"]["kernel"][0, 0, :, 0]         # [16]
    hb = p["head"]["bias"][0]
    # head + per-p3 channel sum as one [4, 65] dot: row p3 holds w[c]
    # at col p3*16+c, bias in the ones column.
    wh = jnp.kron(jnp.eye(4, dtype=hk.dtype), hk[None, :])    # [4, 64]
    out["wh4"] = jnp.concatenate(
        [wh, jnp.full((4, 1), hb, wh.dtype)], axis=1
    )
    return {k: v.astype(jnp.float32) for k, v in out.items()}


# ----------------------------------------------------------- helpers

def _rot(x: jnp.ndarray, sh: int) -> jnp.ndarray:
    """out[:, p] = x[:, (p + sh) mod n] -- lane rotation via concat."""
    if sh == 0:
        return x
    return jnp.concatenate([x[:, sh:], x[:, :sh]], axis=1)


def _wmask(rows: int, n: int, woff: int, wlvl: int, dw: int, dtype):
    """1.0 where the tap (.., w+dw) stays inside [0, wlvl) for output
    position p with w(p) = (p - woff) mod wlvl; else 0.0."""
    i = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    w = (i + (wlvl - woff % wlvl)) % wlvl
    if dw < 0:
        return (w >= -dw).astype(dtype)
    return (w < wlvl - dw).astype(dtype)


def _im2col(x: jnp.ndarray, woff: int, wlvl: int, taps=None,
            with_ones: bool = True) -> jnp.ndarray:
    """Stack lane-rotated copies of x [C, n] for the 3x3 taps (+ ones
    row). Rotation wrap artifacts only corrupt positions within
    (wlvl + 1) of the array edges -- callers size their slack so the
    written interior never reads them."""
    rows, n = x.shape
    # the two w-edge masks depend only on dw -- compute once, reuse
    # across all dh taps
    masks = {
        -1: _wmask(rows, n, woff, wlvl, -1, x.dtype),
        1: _wmask(rows, n, woff, wlvl, 1, x.dtype),
    }
    parts = []
    for dh in (-1, 0, 1):
        if taps is not None and dh not in taps:
            continue
        # one row rotation per dh, shared by its three dw taps
        # (rotations measured ~free on this chip — bench_rot_probe —
        # so this sharing is structural, not a perf lever)
        base = _rot(x, dh * wlvl)
        for dw in (-1, 0, 1):
            t = _rot(base, dw)
            if dw != 0:
                t = t * masks[dw]
            parts.append(t)
    if with_ones:
        parts.append(jnp.ones((1, n), x.dtype))
    return jnp.concatenate(parts, axis=0)


def _dot(w, x):
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ----------------------------------------------------------- kernel 1

def k1_body(xs: jnp.ndarray, w1, w2, s) -> jnp.ndarray:
    """conv1+conv2 for strip s. xs [1, XS1] bf16: the strip slice (with
    SLACK1 halo each side) of the zero-padded flat scan. Returns the
    strip's conv2 output [32, LS1] bf16. (The strip slice happens at
    the REF level in the kernel -- Pallas TPU has no dynamic_slice
    lowering for values.)"""
    dt = xs.dtype
    ic1 = _im2col(xs, SLACK1, W)                     # [10, XS1]
    a1 = jnp.maximum(_dot(w1, ic1), 0.0)             # [16, XS1] f32
    # conv zero-padding: a1 must be 0 OUTSIDE the true image (x there is
    # padding zeros, but conv1's folded bias makes relu(b') != 0).
    i = jax.lax.broadcasted_iota(jnp.int32, (16, XS1), 1)
    f = i + (s * LS1 - SLACK1)                       # true flat position
    a1 = jnp.where((f >= 0) & (f < L), a1, 0.0).astype(dt)
    X2 = _im2col(a1, SLACK1, W)                      # [145, XS1]
    y2 = jnp.maximum(_dot(w2, X2), 0.0)              # [32, XS1] f32
    return y2[:, SLACK1:SLACK1 + LS1].astype(dt)


def _k1_kernel(x_ref, w1_ref, w2_ref, o_ref):
    s = pl.program_id(1)
    off = pl.multiple_of(s * LS1, 128)
    xs = x_ref[0, :, pl.ds(off, XS1)]
    o_ref[0] = k1_body(xs, w1_ref[...], w2_ref[...], s)


# ----------------------------------------------------------- kernel 2

def k2_body(xs: jnp.ndarray, w3) -> jnp.ndarray:
    """conv3 for one strip. xs [32, XS2] bf16 (strip + halo) ->
    [64, LS2] bf16."""
    dt = xs.dtype
    X = _im2col(xs, SLACK2, W2)                      # [289, XS2]
    y = jnp.maximum(_dot(w3, X), 0.0)
    return y[:, SLACK2:SLACK2 + LS2].astype(dt)


def _k2_kernel(p_ref, w3_ref, o_ref):
    s = pl.program_id(1)
    off = pl.multiple_of(s * LS2, 128)
    o_ref[0] = k2_body(p_ref[0, :, pl.ds(off, XS2)], w3_ref[...])


# ----------------------------------------------------------- kernel 3

def k3_body(ppad: jnp.ndarray, w4c0, w4c1, w4c2) -> jnp.ndarray:
    """conv4, whole 40x180 level. ppad [64, LPAD3] bf16 ->
    [128, LPAD3] bf16 (junk outside the interior; XLA slices)."""
    dt = ppad.dtype
    y = _dot(w4c0, _im2col(ppad, PADL3, W3, taps=(-1,)))
    y = y + _dot(w4c1, _im2col(ppad, PADL3, W3, taps=(0,), with_ones=False))
    y = y + _dot(w4c2, _im2col(ppad, PADL3, W3, taps=(1,), with_ones=False))
    return jnp.maximum(y, 0.0).astype(dt)


def _k3_kernel(p_ref, w0_ref, wa_ref, wb_ref, o_ref):
    o_ref[0] = k3_body(p_ref[0], w0_ref[...], wa_ref[...], wb_ref[...])


# ----------------------------------------------------------- kernel 4

def k4_body(p4: jnp.ndarray, wd1, wd2, wd3, wh4) -> jnp.ndarray:
    """Decoder: 3 phase-decomposed k2s2 deconvs + head. p4 [128, LPAD4]
    bf16 -> logits [4, 16*LPAD4] bf16 with rows = p3 and column blocks
    ordered (p2, p1, pos). Each deconv is ONE matmul: the per-phase row
    blocks are lane-concatenated so the shared weight applies to every
    phase at once (separate small dots cost ~0.7 us each of fixed
    MXU-op overhead). The head is one [4, 65] block-structured dot that
    also performs the 16-row channel sums and carries the bias."""
    dt = p4.dtype

    def aug(x):
        return jnp.concatenate(
            [x, jnp.ones((1, x.shape[1]), x.dtype)], axis=0
        )

    y1 = jnp.maximum(_dot(wd1, aug(p4)), 0.0).astype(dt)    # [256, n]
    y1c = jnp.concatenate(
        [y1[p * 64:(p + 1) * 64] for p in range(4)], axis=1
    )                                                       # [64, 4n] (col blk p1)
    y2 = jnp.maximum(_dot(wd2, aug(y1c)), 0.0).astype(dt)   # [128, 4n]
    y2c = jnp.concatenate(
        [y2[p * 32:(p + 1) * 32] for p in range(4)], axis=1
    )                                                       # [32, 16n] (col blk p2,p1)
    y3 = jnp.maximum(_dot(wd3, aug(y2c)), 0.0).astype(dt)   # [64, 16n]
    return _dot(wh4, aug(y3)).astype(dt)                    # [4, 16n]


def _k4_kernel(p_ref, wd1_ref, wd2_ref, wd3_ref, wh4_ref, o_ref):
    o_ref[0] = k4_body(
        p_ref[0], wd1_ref[...], wd2_ref[...], wd3_ref[...], wh4_ref[...]
    )


# ----------------------------------------------------------- glue

def _pool(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """2x2 max pool on [B, C, h*w] flat -> [B, C, h*w/4] flat."""
    B, C, _ = x.shape
    x = x.reshape(B, C, h // 2, 2, w // 2, 2)
    return jnp.max(x, axis=(3, 5)).reshape(B, C, (h // 2) * (w // 2))


def _wspec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, s=0, _nd=nd: (0,) * nd)


def tiny_cnn_pallas_forward(
    variables: Dict,
    x: jnp.ndarray,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """TinyCNN eval-mode logits via the fused planar kernels.

    x: [B, H, W] or [B, H, W, 1] normalized descriptor (f32).
    Returns logits [B, H, W, 1] f32. ``use_pallas=False`` (default off
    TPU) runs the identical bodies as plain XLA for parity tests.
    """
    if x.ndim == 4:
        x = x[..., 0]
    B = x.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    wts = {k: v.astype(dtype) for k, v in fold_weights(variables).items()}

    xf = x.reshape(B, 1, L).astype(dtype)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (SLACK1, SLACK1)))

    if use_pallas or interpret:
        a2 = pl.pallas_call(
            _k1_kernel,
            out_shape=jax.ShapeDtypeStruct((B, 32, L), dtype),
            grid=(B, NS1),
            in_specs=[
                pl.BlockSpec((1, 1, LPAD1), lambda b, s: (b, 0, 0)),
                _wspec((16, 10)),
                _wspec((32, 145)),
            ],
            out_specs=pl.BlockSpec((1, 32, LS1), lambda b, s: (b, 0, s)),
            interpret=interpret,
        )(xf, wts["w1"], wts["w2"])
    else:
        a2 = jax.vmap(
            lambda xp: jnp.concatenate(
                [
                    k1_body(
                        jax.lax.dynamic_slice(xp, (0, s * LS1), (1, XS1)),
                        wts["w1"], wts["w2"], s,
                    )
                    for s in range(NS1)
                ],
                axis=1,
            )
        )(xf)

    p2 = _pool(a2, H, W)
    p2 = jnp.pad(p2, ((0, 0), (0, 0), (SLACK2, SLACK2)))

    if use_pallas or interpret:
        a3 = pl.pallas_call(
            _k2_kernel,
            out_shape=jax.ShapeDtypeStruct((B, 64, L2), dtype),
            grid=(B, NS2),
            in_specs=[
                pl.BlockSpec((1, 32, LPAD2), lambda b, s: (b, 0, 0)),
                _wspec((64, 289)),
            ],
            out_specs=pl.BlockSpec((1, 64, LS2), lambda b, s: (b, 0, s)),
            interpret=interpret,
        )(p2, wts["w3"])
    else:
        a3 = jax.vmap(
            lambda pp: jnp.concatenate(
                [
                    k2_body(
                        jax.lax.dynamic_slice(pp, (0, s * LS2), (32, XS2)),
                        wts["w3"],
                    )
                    for s in range(NS2)
                ],
                axis=1,
            )
        )(p2)

    p3 = _pool(a3, H2, W2)
    p3 = jnp.pad(p3, ((0, 0), (0, 0), (PADL3, PADR3)))

    if use_pallas or interpret:
        a4p = pl.pallas_call(
            _k3_kernel,
            out_shape=jax.ShapeDtypeStruct((B, 128, LPAD3), dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 64, LPAD3), lambda b: (b, 0, 0)),
                _wspec((128, 193)),
                _wspec((128, 192)),
                _wspec((128, 192)),
            ],
            out_specs=pl.BlockSpec((1, 128, LPAD3), lambda b: (b, 0, 0)),
            interpret=interpret,
        )(p3, wts["w4c0"], wts["w4c1"], wts["w4c2"])
    else:
        a4p = jax.vmap(
            lambda pp: k3_body(pp, wts["w4c0"], wts["w4c1"], wts["w4c2"])
        )(p3)

    a4 = a4p[:, :, PADL3:PADL3 + L3]
    p4 = _pool(a4, H3, W3)
    p4 = jnp.pad(p4, ((0, 0), (0, 0), (0, LPAD4 - L4)))

    if use_pallas or interpret:
        lg = pl.pallas_call(
            _k4_kernel,
            out_shape=jax.ShapeDtypeStruct((B, 4, 16 * LPAD4), dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 128, LPAD4), lambda b: (b, 0, 0)),
                _wspec((256, 129)),
                _wspec((128, 65)),
                _wspec((64, 33)),
                _wspec((4, 65)),
            ],
            out_specs=pl.BlockSpec((1, 4, 16 * LPAD4), lambda b: (b, 0, 0)),
            interpret=interpret,
        )(p4, wts["wd1"], wts["wd2"], wts["wd3"], wts["wh4"])
    else:
        lg = jax.vmap(
            lambda pp: k4_body(
                pp, wts["wd1"], wts["wd2"], wts["wd3"], wts["wh4"]
            )
        )(p4)

    # depth-to-space: rows are p3, columns (p2, p1, pos); pk = ak*2+bk;
    # h = i*8 + a1*4 + a2*2 + a3, w = j*8 + b1*4 + b2*2 + b3.
    lg = lg.reshape(B, 2, 2, 4, 4, LPAD4)[:, :, :, :, :, :L4]
    lg = lg.reshape(B, 2, 2, 2, 2, 2, 2, H4, W4)
    #         axes: (B, a3, b3, a2, b2, a1, b1, i, j)
    lg = jnp.transpose(lg, (0, 7, 5, 3, 1, 8, 6, 4, 2))
    return lg.reshape(B, H, W).astype(jnp.float32)[..., None]
