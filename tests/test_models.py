"""Model parity: flax TinyCNN/TinyUNet/ScanContextUNet vs PyTorch.

The strictest gate (SURVEY §7 step 4): the shipped ``tinycnn_best.pth``
weights imported into the flax TinyCNN must reproduce the torch logits
on all four golden descriptors to <= 1e-4 (f32), including the absolute
fixture stats measured during the survey. For TinyUNet/ScanContextUNet
(no shipped weights) the same check runs against freshly-initialized
torch models whose state_dicts are converted on the fly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.models.layers import normalize_clip, normalize_minmax
from distropointclouds_tpu.models.tiny_cnn import TinyCNN
from distropointclouds_tpu.models.tiny_unet import TinyUNet
from distropointclouds_tpu.models.sc_unet import ScanContextUNet
from distropointclouds_tpu.models import torch_import

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


# --- torch reference models (independent re-declarations of the
# architectures in tiny_sc_ped.py:134-154, train_sc_ped.py:217-285,
# tiny_sc_pred_v2.py:104-234, used only to generate parity targets) ---


def build_torch_tinycnn():
    enc = tnn.Sequential(
        tnn.Conv2d(1, 16, 3, padding=1), tnn.BatchNorm2d(16), tnn.ReLU(),
        tnn.Conv2d(16, 32, 3, padding=1), tnn.BatchNorm2d(32), tnn.ReLU(),
        tnn.MaxPool2d(2),
        tnn.Conv2d(32, 64, 3, padding=1), tnn.BatchNorm2d(64), tnn.ReLU(),
        tnn.MaxPool2d(2),
        tnn.Conv2d(64, 128, 3, padding=1), tnn.BatchNorm2d(128), tnn.ReLU(),
        tnn.MaxPool2d(2),
    )
    dec = tnn.Sequential(
        tnn.ConvTranspose2d(128, 64, 2, stride=2), tnn.BatchNorm2d(64), tnn.ReLU(),
        tnn.ConvTranspose2d(64, 32, 2, stride=2), tnn.BatchNorm2d(32), tnn.ReLU(),
        tnn.ConvTranspose2d(32, 16, 2, stride=2), tnn.BatchNorm2d(16), tnn.ReLU(),
        tnn.Conv2d(16, 1, 1),
    )

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.enc, self.dec = enc, dec

        def forward(self, x):
            return self.dec(self.enc(x))

    return M()


@pytest.fixture(scope="module")
def shipped_variables(reference_available):
    return torch_import.load_tiny_cnn()


@pytest.fixture(scope="module")
def shipped_torch_model(reference_available):
    m = build_torch_tinycnn()
    sd = torch.load(
        torch_import.REFERENCE_TINYCNN_PTH, map_location="cpu", weights_only=True
    )
    m.load_state_dict(sd)
    m.eval()
    return m


@pytest.mark.parametrize("scan_id", fixtures.GOLDEN_IDS)
def test_tinycnn_shipped_logit_parity(
    reference_available, shipped_variables, shipped_torch_model, scan_id
):
    sc = fixtures.golden_descriptor(scan_id).astype(np.float32)
    x = np.asarray(normalize_minmax(jnp.asarray(sc)))  # tiny_sc_ped.to_tensor01

    with torch.no_grad():
        ref = shipped_torch_model(torch.from_numpy(x)[None, None])[0, 0].numpy()

    got = TinyCNN().apply(shipped_variables, jnp.asarray(x)[None, ..., None])
    got = np.asarray(got)[0, ..., 0]

    assert np.abs(got - ref).max() < 1e-4
    # Survey fixture stats (BASELINE / SURVEY §6) as an independent anchor.
    stats = {
        "000840": (-4.392004, -2.813092, -4.036580),
        "002073": (-4.392970, -2.804196, -4.026216),
        "002095": (-4.391878, -2.814161, -4.021190),
        "002160": (-4.395623, -2.782486, -4.023592),
    }[scan_id]
    assert got.min() == pytest.approx(stats[0], abs=2e-4)
    assert got.max() == pytest.approx(stats[1], abs=2e-4)
    assert got.mean() == pytest.approx(stats[2], abs=2e-4)
    # Sanity: shipped checkpoint detects nothing (max sigmoid ~ 0.059).
    assert 1.0 / (1.0 + np.exp(-got.max())) < 0.08


def test_tinycnn_param_count(shipped_variables):
    import jax

    n = sum(
        np.prod(p.shape) for p in jax.tree.leaves(shipped_variables["params"])
    )
    n_stats = sum(
        np.prod(p.shape) for p in jax.tree.leaves(shipped_variables["batch_stats"])
    )
    # torch: 140,993 trainable params + 704 BN running stats
    # (num_batches_tracked counters have no flax equivalent).
    assert int(n) == 140993
    assert int(n_stats) == 704


def build_torch_tinyunet(out_mask=0):
    class ConvBNAct(tnn.Module):
        def __init__(self, ci, co):
            super().__init__()
            self.conv = tnn.Conv2d(ci, co, 3, 1, 1, bias=False)
            self.bn = tnn.BatchNorm2d(co)
            self.act = tnn.ReLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class DC(tnn.Module):
        def __init__(self, ci, co):
            super().__init__()
            self.net = tnn.Sequential(ConvBNAct(ci, co), ConvBNAct(co, co))

        def forward(self, x):
            return self.net(x)

    class Down(tnn.Module):
        def __init__(self, ci, co):
            super().__init__()
            self.pool = tnn.MaxPool2d(2)
            self.conv = DC(ci, co)

        def forward(self, x):
            return self.conv(self.pool(x))

    class Up(tnn.Module):
        def __init__(self, ci, co):
            super().__init__()
            self.up = tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
            self.conv = DC(ci, co)

        def forward(self, x, skip):
            x = self.up(x)
            dh = skip.size(2) - x.size(2)
            dw = skip.size(3) - x.size(3)
            x = F.pad(x, (0, dw, 0, dh))
            return self.conv(torch.cat([skip, x], dim=1))

    class M(tnn.Module):
        def __init__(self, base=32):
            super().__init__()
            self.inc = DC(1, base)
            self.d1 = Down(base, base * 2)
            self.d2 = Down(base * 2, base * 4)
            self.d3 = Down(base * 4, base * 8)
            self.u2 = Up(base * 8 + base * 4, base * 4)
            self.u1 = Up(base * 4 + base * 2, base * 2)
            self.u0 = Up(base * 2 + base, base)
            self.head_heat = tnn.Conv2d(base, 1, 1)
            self.out_mask = out_mask
            if out_mask:
                self.head_mask = tnn.Conv2d(base, out_mask, 1)

        def forward(self, x):
            x1 = self.inc(x)
            x2 = self.d1(x1)
            x3 = self.d2(x2)
            x4 = self.d3(x3)
            y = self.u2(x4, x3)
            y = self.u1(y, x2)
            y = self.u0(y, x1)
            if self.out_mask:
                return self.head_heat(y), self.head_mask(y)
            return self.head_heat(y)

    return M()


def test_tinyunet_logit_parity(reference_available, tmp_path):
    torch.manual_seed(0)
    m = build_torch_tinyunet()
    m.eval()
    ckpt = tmp_path / "tinyunet.pt"
    torch.save({"model": m.state_dict(), "epoch": 1, "metrics": {}}, ckpt)

    sc = fixtures.golden_descriptor("000840").astype(np.float32)
    x = np.asarray(normalize_clip(jnp.asarray(sc), 3.0))
    with torch.no_grad():
        ref = m(torch.from_numpy(x)[None, None])[0, 0].numpy()

    variables = torch_import.load_tiny_unet(str(ckpt))
    got = TinyUNet().apply(variables, jnp.asarray(x)[None, ..., None])
    got = np.asarray(got)[0, ..., 0]
    assert np.abs(got - ref).max() < 1e-4


def build_torch_scunet():
    class PolarConv2d(tnn.Module):
        def __init__(self, ci, co, k=3):
            super().__init__()
            self.pad = k // 2
            self.conv = tnn.Conv2d(ci, co, k, 1, padding=0)

        def forward(self, x):
            x = F.pad(x, (self.pad, self.pad, 0, 0), mode="circular")
            x = F.pad(x, (0, 0, self.pad, self.pad))
            return self.conv(x)

    def blk(ci, co):
        return tnn.Sequential(
            PolarConv2d(ci, co), tnn.BatchNorm2d(co), tnn.ReLU(),
            PolarConv2d(co, co), tnn.BatchNorm2d(co), tnn.ReLU(),
        )

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.enc1 = blk(1, 32)
            self.enc2 = blk(32, 64)
            self.enc3 = blk(64, 128)
            self.enc4 = blk(128, 256)
            self.bottleneck = blk(256, 512)
            self.pool = tnn.MaxPool2d(2)
            self.upconv4 = tnn.ConvTranspose2d(512, 256, 2, stride=2)
            self.dec4 = blk(512, 256)
            self.upconv3 = tnn.ConvTranspose2d(256, 128, 2, stride=2)
            self.dec3 = blk(256, 128)
            self.upconv2 = tnn.ConvTranspose2d(128, 64, 2, stride=2)
            self.dec2 = blk(128, 64)
            self.upconv1 = tnn.ConvTranspose2d(64, 32, 2, stride=2)
            self.dec1 = blk(64, 32)

            class MSO(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.small_obj_head = tnn.Conv2d(32, 1, 3, padding=1)
                    self.medium_obj_head = tnn.Conv2d(32, 1, 5, padding=2)
                    self.large_obj_head = tnn.Conv2d(32, 1, 7, padding=3)

                def forward(self, x):
                    small = self.small_obj_head(x)
                    medium = self.medium_obj_head(x)
                    large = self.large_obj_head(x)
                    h = x.shape[-2]
                    near = torch.zeros((1, 1, h, 1))
                    near[:, :, : min(60, h)] = 1.0
                    near[:, :, min(60, h) : min(90, h)] = 0.5
                    far = torch.zeros((1, 1, h, 1))
                    far[:, :, min(90, h) :] = 1.0
                    far[:, :, min(60, h) : min(90, h)] = 0.5
                    return large * near + small * far + 0.3 * medium

            self.final = MSO()

        def forward(self, x):
            e1 = self.enc1(x)
            e2 = self.enc2(self.pool(e1))
            e3 = self.enc3(self.pool(e2))
            e4 = self.enc4(self.pool(e3))
            bn = self.bottleneck(self.pool(e4))
            d4 = self.dec4(torch.cat([self.upconv4(bn), e4], dim=1))
            d3 = self.dec3(torch.cat([self.upconv3(d4), e3], dim=1))
            d2 = self.dec2(torch.cat([self.upconv2(d3), e2], dim=1))
            d1 = self.dec1(torch.cat([self.upconv1(d2), e1], dim=1))
            return self.final(d1)

    return M()


def test_scunet_logit_parity(reference_available, tmp_path):
    torch.manual_seed(1)
    m = build_torch_scunet()
    m.eval()
    ckpt = tmp_path / "scunet.pt"
    torch.save({"model": m.state_dict()}, ckpt)

    sc = fixtures.golden_descriptor("002160").astype(np.float32)
    x = np.asarray(normalize_minmax(jnp.asarray(sc)))
    with torch.no_grad():
        ref = m(torch.from_numpy(x)[None, None])[0, 0].numpy()

    variables = torch_import.load_sc_unet(str(ckpt))
    got = ScanContextUNet().apply(variables, jnp.asarray(x)[None, ..., None])
    got = np.asarray(got)[0, ..., 0]
    assert np.abs(got - ref).max() < 2e-4


def test_train_mode_batchnorm_updates():
    """Train-mode forward must update batch_stats (mutable collection)."""
    import jax

    model = TinyCNN()
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, train=True)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, 32, 32, 1)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_normalize_functions():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    mm = np.asarray(normalize_minmax(x))
    assert mm.min() == pytest.approx(0.0) and mm.max() == pytest.approx(1.0)
    cl = np.asarray(normalize_clip(x * 10, 3.0))
    assert cl.min() >= -1.0 and cl.max() <= 1.0
    # constant input passes through (tiny_sc_ped.py:58-59)
    const = jnp.full((4, 8), 2.5)
    np.testing.assert_array_equal(np.asarray(normalize_minmax(const)), 2.5)


def test_sc_unet_sector_sharded_forward_matches():
    """ScanContextUNet's circular polar padding (tiny_sc_pred_v2.py:
    113-117) must survive GSPMD sector-axis sharding: forward on a
    (1, 'sector'=4) mesh == unsharded forward (XLA inserts the
    collective-permute halo exchanges for the wrap pad)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from distropointclouds_tpu.core.config import MeshConfig
    from distropointclouds_tpu.models.sc_unet import ScanContextUNet
    from distropointclouds_tpu.parallel.mesh import make_mesh

    model = ScanContextUNet()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 96, 1)).astype(np.float32)
    )
    variables = model.init(jax.random.key(0), x, train=False)
    ref = model.apply(variables, x, train=False)

    mesh = make_mesh(MeshConfig(data=1, sector=4), jax.devices()[:4])
    xsh = NamedSharding(mesh, P(None, None, "sector", None))
    repl = NamedSharding(mesh, P())
    fwd = jax.jit(
        lambda v, a: model.apply(v, a, train=False),
        in_shardings=(repl, xsh),
        out_shardings=repl,
    )
    out = fwd(jax.device_put(variables, repl), jax.device_put(x, xsh))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
