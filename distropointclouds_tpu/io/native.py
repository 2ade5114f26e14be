"""ctypes bindings for the native IO runtime (``native/dpc_io.cpp``).

Provides the C++ fast path for the host input pipeline — threaded
prefetching scan decode and hash-grid voxel downsample — with graceful
numpy fallbacks when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdpc_io.so")


def _load_library(build_if_missing: bool = True):
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SO_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.dpc_load_scan.restype = ctypes.c_int64
    lib.dpc_load_scan.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.dpc_voxel_downsample.restype = ctypes.c_int64
    lib.dpc_voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.dpc_loader_create.restype = ctypes.c_void_p
    lib.dpc_loader_create.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.dpc_loader_num_batches.restype = ctypes.c_int64
    lib.dpc_loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.dpc_loader_next.restype = ctypes.c_int64
    lib.dpc_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dpc_loader_destroy.restype = None
    lib.dpc_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


class _ScParams(ctypes.Structure):
    _fields_ = [
        ("num_ring", ctypes.c_int32),
        ("num_sector", ctypes.c_int32),
        ("max_length", ctypes.c_float),
        ("edge_drop", ctypes.c_int32),
        ("full_height_range", ctypes.c_int32),
        ("height_offset", ctypes.c_float),
        ("zero_substitution", ctypes.c_int32),
    ]


def _sc_params(cfg) -> _ScParams:
    from ..core.config import EdgePolicy

    return _ScParams(
        num_ring=cfg.num_ring,
        num_sector=cfg.num_sector,
        max_length=cfg.max_length,
        edge_drop=int(cfg.edge_policy == EdgePolicy.DROP),
        full_height_range=int(cfg.use_full_height_range),
        height_offset=cfg.height_offset,
        zero_substitution=int(cfg.zero_substitution),
    )


def _bind_sc(lib):
    if hasattr(lib, "_sc_bound"):
        return
    lib.dpc_scan_context.restype = ctypes.c_int32
    lib.dpc_scan_context.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(_ScParams),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dpc_loader_enable_sc.restype = None
    lib.dpc_loader_enable_sc.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_ScParams)
    ]
    lib.dpc_loader_next_sc.restype = ctypes.c_int64
    lib.dpc_loader_next_sc.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib._sc_bound = True


def scan_context_host(points: np.ndarray, cfg) -> np.ndarray:
    """C++ scatter-max descriptor (exact golden-v2 float32 semantics;
    parity-tested against the golden fixtures). ``points``: (N, >=3)."""
    lib = _load_library()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/")
    _bind_sc(lib)
    pts = np.ascontiguousarray(points, dtype=np.float32)
    stride = pts.shape[1]
    grid = np.empty((cfg.num_ring, cfg.num_sector), np.float32)
    p = _sc_params(cfg)
    lib.dpc_scan_context(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pts),
        stride,
        ctypes.byref(p),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return grid


def native_available() -> bool:
    return _load_library() is not None


def load_scan_padded(path: str, max_points: int) -> Tuple[np.ndarray, int]:
    """Decode one .bin into a zero-padded (max_points, 4) f32 buffer.
    Native fast path; numpy fallback matches exactly."""
    lib = _load_library()
    buf = np.zeros((max_points, 4), np.float32)
    if lib is not None:
        n = lib.dpc_load_scan(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points,
        )
        if n < 0:
            raise FileNotFoundError(path)
        return buf, int(n)
    scan = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    n = min(len(scan), max_points)
    buf[:n] = scan[:n]
    return buf, n


def voxel_downsample_host(points: np.ndarray, voxel: float) -> np.ndarray:
    """Hash-grid centroid downsample on the host (Open3D semantics).
    Native fast path; pure-numpy fallback."""
    points = np.ascontiguousarray(points[:, :3], dtype=np.float32)
    lib = _load_library()
    if lib is not None and len(points):
        out = np.empty_like(points)
        n = lib.dpc_voxel_downsample(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(points),
            ctypes.c_float(voxel),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(points),
        )
        return out[:n].copy()
    if not len(points):
        return points
    mn = points.min(axis=0)
    keys = np.floor((points - mn) / voxel).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    sums = np.zeros((len(uniq), 3), np.float64)
    np.add.at(sums, inv, points.astype(np.float64))
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    return (sums / counts[:, None]).astype(np.float32)


class NativeScanLoader:
    """Threaded prefetching batch loader over a list of .bin paths.

    Yields (data [batch, max_points, 4] f32, counts [batch] i64,
    n_live). The C++ producer decodes batch i+1..i+depth while the TPU
    consumes batch i — the native equivalent of torch DataLoader workers
    (train_sc_ped.py:494-499).
    """

    def __init__(
        self,
        paths: Sequence[str],
        max_points: int = 131072,
        batch: int = 16,
        depth: int = 2,
        threads: int = 4,
        loop: bool = False,
        descriptor_config=None,
    ):
        self.paths = list(paths)
        self.max_points = max_points
        self.batch = batch
        self._lib = _load_library()
        self._handle = None
        self._loop = loop
        self._depth = depth
        self._threads = threads
        self.descriptor_config = descriptor_config
        if self._lib is not None:
            joined = "\n".join(self.paths).encode()
            self._handle = self._lib.dpc_loader_create(
                joined, max_points, batch, depth, threads, int(loop)
            )
            if descriptor_config is not None:
                _bind_sc(self._lib)
                self._sc_params = _sc_params(descriptor_config)
                self._lib.dpc_loader_enable_sc(
                    self._handle, ctypes.byref(self._sc_params)
                )

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        """Yields (data, counts, n_live). In descriptor mode (a
        ScanContextConfig passed at construction), ``data`` is the
        [batch, R, S] grid batch computed by the C++ workers; otherwise
        the [batch, max_points, 4] padded points."""
        dc = self.descriptor_config
        if self._handle is not None:
            while True:
                counts = np.empty((self.batch,), np.int64)
                if dc is not None:
                    grids = np.empty(
                        (self.batch, dc.num_ring, dc.num_sector), np.float32
                    )
                    n = self._lib.dpc_loader_next_sc(
                        self._handle,
                        None,
                        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                        grids.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    )
                    if n < 0:
                        return
                    yield grids, counts, int(n)
                    continue
                data = np.empty((self.batch, self.max_points, 4), np.float32)
                n = self._lib.dpc_loader_next(
                    self._handle,
                    data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
                if n < 0:
                    return
                yield data, counts, int(n)
        else:  # numpy fallback, same batching semantics
            from ..core.types import PointBatch
            from ..ops.scan_context import scan_context

            while True:
                for start in range(0, len(self.paths), self.batch):
                    sel = self.paths[start : start + self.batch]
                    data = np.zeros(
                        (self.batch, self.max_points, 4), np.float32
                    )
                    counts = np.zeros((self.batch,), np.int64)
                    for i, p in enumerate(sel):
                        data[i], counts[i] = load_scan_padded(
                            p, self.max_points
                        )
                    if dc is not None:
                        import jax.numpy as jnp

                        pb = PointBatch(
                            xyzi=jnp.asarray(data),
                            count=jnp.asarray(counts, jnp.int32),
                        )
                        grids = np.asarray(scan_context(pb, dc))
                        yield grids, counts, len(sel)
                    else:
                        yield data, counts, len(sel)
                if not self._loop:
                    return

    def close(self) -> None:
        if self._handle is not None:
            self._lib.dpc_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
