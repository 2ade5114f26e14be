"""Label-math parity: covered cells, center indices, heatmaps, weights.

Gate (SURVEY §4.2): re-deriving covered_cells from each JSON record's own
(x, y, l, w, yaw) must reproduce the stored lists exactly (verified
16/16 for pedestrians_002160.json during the survey), and the center
index formula must match the stored center_*_idx fields.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from distropointclouds_tpu.core.config import ScanContextConfig
from distropointclouds_tpu.io import fixtures
from distropointclouds_tpu.labels.covered_cells import (
    center_indices,
    combined_mask,
    covered_cells_list,
    covered_cells_mask,
    mask_from_cell_rows,
)
from distropointclouds_tpu.labels.heatmap import (
    adaptive_weight_map,
    center_heatmap,
    gaussian2d,
)
from distropointclouds_tpu.labels.pedestrians import pedestrians_to_padded_arrays

CFG = ScanContextConfig.golden_v2()


@pytest.mark.parametrize("scan_id", fixtures.GOLDEN_IDS)
def test_covered_cells_json_parity(reference_available, scan_id):
    peds = fixtures.golden_pedestrians(scan_id)
    assert peds, "fixture should contain pedestrians"
    for ped in peds:
        expected = np.asarray(ped["covered_cells"], dtype=np.int64).reshape(-1, 2)
        got = covered_cells_list(
            ped["x"], ped["y"], ped["l"], ped["w"], ped["yaw"], CFG
        )
        np.testing.assert_array_equal(got, expected), ped


@pytest.mark.parametrize("scan_id", fixtures.GOLDEN_IDS)
def test_center_indices_json_parity(reference_available, scan_id):
    for ped in fixtures.golden_pedestrians(scan_id):
        ring, sector = center_indices(
            jnp.float32(ped["x"]), jnp.float32(ped["y"]), CFG
        )
        assert int(ring) == ped["center_ring_idx"]
        assert int(sector) == ped["center_sector_idx"]
        # distance/angle fields
        assert np.isclose(np.hypot(ped["x"], ped["y"]), ped["distance"])


@pytest.mark.parametrize("scan_id", fixtures.GOLDEN_IDS)
def test_full_record_parity_source_a(reference_available, scan_id):
    """Rebuild each source-(a) JSON record from its own raw fields via the
    label factory: every field must be exactly equal except `angle`,
    which may differ by <= 1 float32 ulp (libm-dependent arctan2f; see
    pedestrians.py docstring)."""
    from distropointclouds_tpu.labels.pedestrians import (
        pedestrians_from_label_array,
    )

    peds = fixtures.golden_pedestrians(scan_id)
    labels = np.array(
        [
            [p["class"], p["x"], p["y"], p["z"], p["h"], p["w"], p["l"], p["yaw"]]
            for p in peds
        ],
        dtype=np.float32,
    )
    recs = pedestrians_from_label_array(labels, CFG)
    half = len(peds) // 2
    assert len(recs) == len(peds)
    for rec, p in zip(recs[:half], peds[:half]):
        for k in [
            "class", "x", "y", "z", "h", "w", "l", "yaw",
            "center_ring_idx", "center_sector_idx", "covered_cells",
            "distance",
        ]:
            assert rec[k] == p[k], (scan_id, k)
        # Chained f32 arctan2 -> degrees can land 1 ulp off per op; the
        # pre-modulo value's ulp can be 2x the post-modulo one.
        ulp = np.spacing(np.float32(p["angle"]))
        assert abs(rec["angle"] - p["angle"]) <= 2 * ulp, (scan_id, "angle")


def test_jnp_mask_matches_list(reference_available):
    """The on-device f32 mask must agree with the host f64 list path."""
    for ped in fixtures.golden_pedestrians("002160"):
        m = np.asarray(
            covered_cells_mask(
                jnp.float32(ped["x"]),
                jnp.float32(ped["y"]),
                jnp.float32(ped["l"]),
                jnp.float32(ped["w"]),
                jnp.float32(ped["yaw"]),
                CFG,
            )
        )
        expected = mask_from_cell_rows(np.asarray(ped["covered_cells"]), CFG)
        # f32 vs f64 boundary flips are measure-zero on real data.
        np.testing.assert_array_equal(m.astype(np.uint8), expected)


def test_combined_mask_equals_union(reference_available):
    peds = fixtures.golden_pedestrians("000840")
    packed = pedestrians_to_padded_arrays(peds, capacity=32)
    got = np.asarray(combined_mask(jnp.asarray(packed["boxes"]), CFG))
    expected = np.zeros(CFG.grid_shape, bool)
    for ped in peds:
        expected |= mask_from_cell_rows(np.asarray(ped["covered_cells"]), CFG).astype(
            bool
        )
    np.testing.assert_array_equal(got, expected)


def test_padded_invalid_rows_cover_nothing():
    packed = pedestrians_to_padded_arrays([], capacity=8)
    got = np.asarray(combined_mask(jnp.asarray(packed["boxes"]), CFG))
    assert not got.any()


def test_gaussian_heatmap_matches_numpy():
    """Numpy model of train_sc_ped.py:74-79,166-173."""
    R, S = CFG.grid_shape
    centers = np.array([[10, 700], [10, 5], [150, 300]], np.float32)
    valid = np.array([True, True, True])
    got = np.asarray(center_heatmap(jnp.asarray(centers), jnp.asarray(valid), CFG, 1.8))

    rr = np.arange(R)[:, None]
    ss = np.arange(S)[None, :]
    expected = np.zeros((R, S), np.float32)
    for r, s in centers:
        d2 = (rr - r) ** 2 + (ss - s) ** 2
        expected = np.maximum(expected, np.exp(-0.5 * d2 / 1.8**2))
    np.testing.assert_allclose(got, expected, atol=1e-6)
    # No wrap: the sector-700 pedestrian must not bleed into sector 0.
    assert got[10, 0] == pytest.approx(np.exp(-0.5 * 25 / 1.8**2), abs=1e-6)


def test_heatmap_invalid_centers_ignored():
    centers = np.array([[10, 10], [50, 50]], np.float32)
    valid = np.array([True, False])
    got = np.asarray(center_heatmap(jnp.asarray(centers), jnp.asarray(valid), CFG))
    assert got[50, 50] < 1e-3
    assert got[10, 10] == pytest.approx(1.0)


def test_adaptive_weight_map_formula(reference_available):
    """tiny_sc_pred_v2.py:60-85 semantics on real fixture data."""
    peds = fixtures.golden_pedestrians("002073")
    P = 16
    masks = np.zeros((P, *CFG.grid_shape), bool)
    num_cells = np.zeros(P, np.int32)
    distance = np.zeros(P, np.float32)
    valid = np.zeros(P, bool)
    for i, ped in enumerate(peds[:P]):
        masks[i] = mask_from_cell_rows(np.asarray(ped["covered_cells"]), CFG).astype(
            bool
        )
        num_cells[i] = len(ped["covered_cells"])
        distance[i] = ped["distance"]
        valid[i] = True
    got = np.asarray(
        adaptive_weight_map(
            jnp.asarray(masks),
            jnp.asarray(num_cells),
            jnp.asarray(distance),
            jnp.asarray(valid),
        )
    )
    expected = np.ones(CFG.grid_shape, np.float32)
    for i, ped in enumerate(peds[:P]):
        n = num_cells[i]
        if n > 0:
            pw = min(min(100.0 / n, 5.0) * (1.0 + (distance[i] / 20.0) ** 2), 10.0)
        else:
            pw = 1.0
        sel = masks[i]
        expected[sel] = np.maximum(expected[sel], pw)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_mask_wrap_semantics():
    cells = np.array([[5, 725], [-2, 3], [200, 10]])
    m_wrap = mask_from_cell_rows(cells, CFG, wrap=True)
    assert m_wrap[5, 5] == 1  # 725 mod 720
    assert m_wrap[0, 3] == 1  # ring clipped to 0
    assert m_wrap[159, 10] == 1  # ring clipped to 159
    m_drop = mask_from_cell_rows(cells, CFG, wrap=False)
    assert m_drop.sum() == 0


def test_device_f32_targets_vs_stored_json_masks(reference_available):
    """The jitted training path rebuilds covered-cells masks on-device in
    float32 from (x, y, l, w, yaw); the reference trains on masks OR-ed
    from the float64-derived JSON rows (tiny_sc_ped.py:62-73). Bound the
    f32/f64 boundary-cell discrepancy on every golden fixture."""
    import jax.numpy as jnp

    from distropointclouds_tpu.train.data import build_targets, load_scan_context_dir
    from distropointclouds_tpu.core.config import TrainConfig

    data = load_scan_context_dir(fixtures.test_data_dir())
    cfg = TrainConfig(model="tiny_cnn", normalize="minmax", roll_aug=False)
    batch = {
        k: jnp.asarray(getattr(data, k))
        for k in ("sc", "centers", "boxes", "distance", "num_cells", "ped_valid")
    }
    out = build_targets(batch, cfg)
    device_masks = np.asarray(out["target"])[..., 0] > 0.5

    max_diff = 0
    for i, scan_id in enumerate(data.ids):
        peds = fixtures.golden_pedestrians(f"{scan_id:06d}")
        ref_mask = np.zeros(CFG.grid_shape, np.uint8)
        for ped in peds:
            ref_mask |= mask_from_cell_rows(np.asarray(ped["covered_cells"]), CFG)
        diff = int((device_masks[i] != (ref_mask > 0)).sum())
        max_diff = max(max_diff, diff)
        # f32 vs f64 rotation/trig can flip only cells whose centers sit
        # within float32 eps of the box edge — a handful per scan.
        assert diff <= 8, f"scan {scan_id}: {diff} differing cells"
    # Not vacuous: at least the masks must be non-empty and mostly agree.
    assert device_masks.sum() > 0
