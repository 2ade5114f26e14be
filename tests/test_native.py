"""Native IO runtime: scan decode parity, threaded loader ordering and
end-of-stream, voxel downsample vs numpy/jnp, fallback equivalence."""

import os

import numpy as np
import pytest

from distropointclouds_tpu.io import native


@pytest.fixture(scope="module")
def bin_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    rng = np.random.default_rng(0)
    paths = []
    sizes = [1000, 5000, 123, 9000, 42]
    for i, n in enumerate(sizes):
        pts = rng.uniform(-10, 10, size=(n, 4)).astype(np.float32)
        p = d / f"{i:06d}.bin"
        pts.tofile(p)
        paths.append(str(p))
    return paths, sizes


def test_native_library_builds():
    assert native.native_available(), "libdpc_io.so should build"


def test_load_scan_parity(bin_files):
    paths, sizes = bin_files
    for p, n in zip(paths, sizes):
        buf, count = native.load_scan_padded(p, 16384)
        ref = np.fromfile(p, dtype=np.float32).reshape(-1, 4)
        assert count == n
        np.testing.assert_array_equal(buf[:n], ref)
        assert (buf[n:] == 0).all()


def test_load_scan_truncation(bin_files):
    paths, sizes = bin_files
    buf, count = native.load_scan_padded(paths[3], 1000)  # file has 9000
    assert count == 1000
    ref = np.fromfile(paths[3], dtype=np.float32).reshape(-1, 4)
    np.testing.assert_array_equal(buf, ref[:1000])


def test_load_scan_missing():
    with pytest.raises(FileNotFoundError):
        native.load_scan_padded("/nonexistent/file.bin", 128)


def test_loader_order_and_eos(bin_files):
    paths, sizes = bin_files
    loader = native.NativeScanLoader(paths, max_points=16384, batch=2, depth=2)
    seen = []
    for data, counts, n in loader:
        for i in range(n):
            seen.append(int(counts[i]))
            ref = np.fromfile(
                paths[len(seen) - 1], dtype=np.float32
            ).reshape(-1, 4)
            np.testing.assert_array_equal(data[i, : counts[i]], ref[:16384])
    loader.close()
    assert seen == sizes  # order preserved, all files delivered once


def test_loader_loop_mode(bin_files):
    paths, sizes = bin_files
    loader = native.NativeScanLoader(
        paths[:2], max_points=8192, batch=2, loop=True
    )
    it = iter(loader)
    for _ in range(5):  # would stop after 1 batch without loop
        data, counts, n = next(it)
        assert n == 2
    loader.close()


def test_voxel_downsample_host_matches_numpy(rng):
    pts = rng.uniform(-5, 5, size=(3000, 3)).astype(np.float32)
    got = native.voxel_downsample_host(pts, 0.5)
    # independent brute force
    mn = pts.min(axis=0)
    keys = np.floor((pts - mn) / 0.5).astype(np.int64)
    uniq = {}
    for k, p in zip(map(tuple, keys), pts):
        uniq.setdefault(k, []).append(p)
    expected = sorted(
        tuple(np.round(np.mean(v, axis=0), 4)) for v in uniq.values()
    )
    got_sorted = sorted(tuple(np.round(p, 4)) for p in got)
    assert len(got_sorted) == len(expected)
    np.testing.assert_allclose(
        np.asarray(got_sorted), np.asarray(expected), atol=1e-3
    )


@pytest.mark.parametrize("scan_id", ["000840", "002073", "002095", "002160"])
def test_host_descriptor_bit_exact(reference_available, scan_id):
    """The C++ scatter-max descriptor is bit-exact against every golden
    fixture (it reproduces the float32 libm semantics of the original
    generator exactly)."""
    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.io.native import scan_context_host

    cfg = ScanContextConfig.golden_v2()
    grid = scan_context_host(fixtures.golden_scan(scan_id), cfg)
    np.testing.assert_array_equal(grid, fixtures.golden_descriptor(scan_id))


def test_host_descriptor_profiles(rng):
    """Host vs device descriptor agreement on random clouds for the
    drop-policy and offset profiles too."""
    import jax.numpy as jnp

    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.io.native import scan_context_host
    from distropointclouds_tpu.ops.scan_context import scan_context_sorted

    n = 4096
    xyz = rng.uniform(-60, 60, size=(n, 4)).astype(np.float32)
    xyz[:, 2] = rng.uniform(-3, 4, size=n)
    for cfg in [
        ScanContextConfig.golden_v2(),
        ScanContextConfig.ros_node(),
        ScanContextConfig.scaner_v1(),
    ]:
        # profiles with voxel downsample: compare the raw binning only
        host = scan_context_host(xyz, cfg)
        dev = np.asarray(
            scan_context_sorted(
                jnp.asarray(xyz[:, :3]), jnp.ones(n, dtype=bool), cfg
            )
        )
        bad = (host != dev).sum()
        assert bad <= 5, f"{cfg}: {bad} mismatching cells"


def test_loader_descriptor_mode(reference_available):
    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.io.native import NativeScanLoader

    cfg = ScanContextConfig.golden_v2()
    paths = [
        os.path.join(fixtures.test_data_dir(), f"{s}.bin")
        for s in fixtures.GOLDEN_IDS
    ]
    loader = NativeScanLoader(
        paths, cfg.max_points, batch=4, descriptor_config=cfg
    )
    grids, counts, n = next(iter(loader))
    loader.close()
    assert n == 4 and grids.shape == (4, 160, 720)
    for i, sid in enumerate(fixtures.GOLDEN_IDS):
        np.testing.assert_array_equal(
            grids[i], fixtures.golden_descriptor(sid)
        )


def test_loader_numpy_fallback(reference_available, monkeypatch):
    """With the shared library unavailable, the loader's numpy fallback
    must deliver identical batches (points and descriptor modes)."""
    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.io import fixtures

    monkeypatch.setattr(native, "_load_library", lambda *a, **k: None)
    cfg = ScanContextConfig.golden_v2()
    paths = [os.path.join(fixtures.test_data_dir(), "000840.bin")]
    loader = native.NativeScanLoader(paths, cfg.max_points, batch=1)
    data, counts, n = next(iter(loader))
    assert n == 1 and counts[0] == 117104

    loader2 = native.NativeScanLoader(
        paths, cfg.max_points, batch=1, descriptor_config=cfg
    )
    grids, counts2, _ = next(iter(loader2))
    assert (grids[0] != fixtures.golden_descriptor("000840")).sum() <= 10


def test_pallas_nms_fallback_parity(rng):
    """The backend-dispatching NMS (separable path on CPU) matches the
    reference reduce_window implementation."""
    import jax.numpy as jnp

    from distropointclouds_tpu.ops.pallas_kernels import peak_nms_mask_fast
    from distropointclouds_tpu.ops.postprocess import peak_nms_mask

    heat = jnp.asarray(rng.uniform(size=(3, 160, 720)).astype(np.float32))
    a = np.asarray(peak_nms_mask(heat, 7, 0.4))
    b = np.asarray(peak_nms_mask_fast(heat, 7, 0.4))
    np.testing.assert_array_equal(a, b)


def test_native_loader_feeds_pipeline(bin_files, reference_available):
    """Native loader -> PointBatch -> descriptor == direct path."""
    import jax.numpy as jnp

    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.core.types import PointBatch
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.ops.scan_context import scan_context

    cfg = ScanContextConfig.golden_v2()
    bin_path = os.path.join(fixtures.test_data_dir(), "000840.bin")
    loader = native.NativeScanLoader([bin_path], max_points=cfg.max_points,
                                     batch=1)
    data, counts, n = next(iter(loader))
    loader.close()
    pb = PointBatch(
        xyzi=jnp.asarray(data[0]), count=jnp.asarray(counts[0], jnp.int32)
    )
    grid = np.asarray(scan_context(pb, cfg))
    golden = fixtures.golden_descriptor("000840")
    assert (grid != golden).sum() <= 10


def test_loader_enable_sc_create_gap(reference_available):
    """Regression for a producer/enable_sc data race: the producer thread
    must not start filling batches until the first next() call, so the
    create -> enable_sc -> (delay) -> iterate ordering always yields
    correct descriptor grids (previously the producer could observe a
    torn ScParams and corrupt the heap)."""
    import time

    from distropointclouds_tpu.core.config import ScanContextConfig
    from distropointclouds_tpu.io import fixtures
    from distropointclouds_tpu.io.native import NativeScanLoader

    cfg = ScanContextConfig.golden_v2()
    paths = [
        os.path.join(fixtures.test_data_dir(), f"{s}.bin")
        for s in fixtures.GOLDEN_IDS
    ]
    for _ in range(3):
        loader = NativeScanLoader(
            paths, cfg.max_points, batch=2, descriptor_config=cfg
        )
        time.sleep(0.05)  # widen the old race window before first next()
        grids, counts, n = next(iter(loader))
        loader.close()
        assert n == 2
        np.testing.assert_array_equal(
            grids[0], fixtures.golden_descriptor(fixtures.GOLDEN_IDS[0])
        )
        np.testing.assert_array_equal(
            grids[1], fixtures.golden_descriptor(fixtures.GOLDEN_IDS[1])
        )
