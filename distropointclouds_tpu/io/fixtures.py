"""Loaders for the reference's golden fixtures (``test_data/``).

The reference has no formal test suite; its de-facto regression assets
are the paired ``.bin`` / ``sc_*.npy`` / ``pedestrians_*.json`` files in
``test_data/`` (SURVEY §4.1). This module centralizes access so the new
framework's parity tests all read the same files.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

DEFAULT_REFERENCE_ROOT = "/root/reference"

GOLDEN_IDS = ["000840", "002073", "002095", "002160"]


def reference_root() -> str:
    return os.environ.get("DPC_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)


def test_data_dir() -> str:
    return os.path.join(reference_root(), "test_data")


def sample_data_dir() -> str:
    return os.path.join(reference_root(), "sample_data")


def has_fixtures() -> bool:
    return os.path.isdir(test_data_dir())


def golden_scan(scan_id: str) -> np.ndarray:
    """(N, 4) raw scan from test_data."""
    return np.fromfile(
        os.path.join(test_data_dir(), f"{scan_id}.bin"), dtype=np.float32
    ).reshape(-1, 4)


def golden_descriptor(scan_id: str) -> np.ndarray:
    """(160, 720) float32 golden scan-context grid."""
    return np.load(os.path.join(test_data_dir(), f"sc_{scan_id}.npy"))


def golden_pedestrians(scan_id: str) -> List[Dict]:
    """Parsed pedestrians_*.json (with the reference's duplicate-entry
    quirk intact; see SURVEY §2.3)."""
    path = os.path.join(test_data_dir(), f"pedestrians_{scan_id}.json")
    with open(path) as f:
        return json.load(f)


def golden_centers(scan_id: str) -> List[tuple]:
    """GT (ring, sector) centers as used by train_sc_ped.py:441-450."""
    return [
        (int(p["center_ring_idx"]), int(p["center_sector_idx"]))
        for p in golden_pedestrians(scan_id)
    ]
