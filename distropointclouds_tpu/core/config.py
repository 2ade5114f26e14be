"""Unified, frozen configuration tree for the whole framework.

The reference scatters configuration over five uncoordinated mechanisms
(class statics in `scaner_version2.py:28-47`, `CFG` classes in
`tiny_sc_ped.py:20-35` / `train_sc_ped.py:41-63`, argparse+EasyDict in
`config/train_config.py`, a dict literal in `tiny_sc_pred_v2.py:417-424`,
and ROS parameters in `scan_context_node.py:196-207`) with *conflicting*
defaults (max_length 20 vs 80, downsampling on vs off, full-height-range
on vs off).

Here everything is a frozen (hashable) dataclass so configs can be passed
as `jax.jit` static arguments, and the reference's conflicting defaults
are captured as named *profiles*:

- ``golden_v2``  — `scaner_version2.py:28-47,64-115`: the semantics that
  produced the golden `test_data/sc_*.npy` fixtures. max_length=20,
  full-height-range, zero-substitution, clamp edge policy, no downsample.
- ``ros_node``   — `scan_context_node.py:102-157,196-207`: max_length=80,
  hard range rejection (drop), floor+clip indexing, 0.20 m voxel
  downsample before binning.
- ``scaner_v1``  — `distro_model/data_process/scaner.py:20-37`:
  max_length=80, +2.0 height offset instead of full range, downsampling
  always on.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class EdgePolicy(enum.Enum):
    """How points beyond ``max_length`` are treated.

    CLAMP: out-of-range points land in the outermost ring
      (`scaner_version2.py:93` uses ``min(r // gap_ring, num_ring-1)``).
    DROP: out-of-range points are discarded
      (`scan_context_node.py:134-137` filters ``r <= max_length``).
    """

    CLAMP = "clamp"
    DROP = "drop"


@dataclasses.dataclass(frozen=True)
class ScanContextConfig:
    """Parameters of the polar ring x sector max-height descriptor.

    Mirrors the parameter surface of `scaner_version2.py:28-47` and the
    12 ROS parameters of `scan_context_node.py:196-207`.
    """

    num_ring: int = 160
    num_sector: int = 720
    max_length: float = 20.0
    edge_policy: EdgePolicy = EdgePolicy.CLAMP
    # Height processing (scaner_version2.py:36-37,77-82)
    use_full_height_range: bool = True
    height_offset: float = 2.0  # used only when use_full_height_range=False
    # x==0 -> 0.001 substitution applied before polar conversion
    # (scaner_version2.py:85-86); the ROS node variant does NOT do this.
    zero_substitution: bool = True
    # Voxel downsample size in meters; 0 disables
    # (scan_context_node.py:93-100, scaner.py:108-134).
    voxel_size: float = 0.0
    # Fixed-size point buffer: TPU programs need static shapes. Scans are
    # padded/truncated to this many points (max observed in the bundled
    # KITTI scans is 125,601; see SURVEY §7 step 1).
    max_points: int = 131072
    # OPT-IN decimation: bin only every Nth point (1 = all points, the
    # default for every parity profile). Halving the points halves the
    # sorting-network size (2^16: 136 stages on half the data) — the
    # strongest non-parity throughput lever; accuracy cost measured in
    # docs/PERF.md (max-height cells can only LOWER when points drop).
    point_stride: int = 1

    @property
    def gap_ring(self) -> float:
        return self.max_length / self.num_ring

    @property
    def gap_sector(self) -> float:
        return 360.0 / self.num_sector

    @property
    def grid_shape(self) -> Tuple[int, int]:
        return (self.num_ring, self.num_sector)

    # ---- reference profiles -------------------------------------------------

    @staticmethod
    def golden_v2() -> "ScanContextConfig":
        """Semantics of the golden fixtures (scaner_version2.py)."""
        return ScanContextConfig()

    @staticmethod
    def ros_node() -> "ScanContextConfig":
        """Semantics of the live ROS node (scan_context_node.py)."""
        return ScanContextConfig(
            max_length=80.0,
            edge_policy=EdgePolicy.DROP,
            zero_substitution=False,
            voxel_size=0.20,
        )

    @staticmethod
    def scaner_v1() -> "ScanContextConfig":
        """Semantics of the legacy generator (distro_model/.../scaner.py)."""
        return ScanContextConfig(
            max_length=80.0,
            edge_policy=EdgePolicy.CLAMP,
            use_full_height_range=False,
            height_offset=2.0,
            zero_substitution=True,
            voxel_size=0.20,
        )

    @staticmethod
    def fast(stride: int = 1) -> "ScanContextConfig":
        """OPT-IN half-resolution grid (80 x 360, same 20 m range): each
        coarse cell is the union of a 2x2 block of golden cells, so its
        max-height equals maxpool2x2 of the golden descriptor exactly
        (bin edges align: gap_ring 0.25 = 2 * 0.125, gap_sector
        1.0 = 2 * 0.5). NON-PARITY by construction — for throughput-
        critical serving; the golden_v2 default is untouched.
        ``stride`` > 1 additionally decimates the input points (see
        point_stride)."""
        return ScanContextConfig(num_ring=80, num_sector=360,
                                 point_stride=stride)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Post-processing / detection parameters.

    Collects the thresholds of all three reference inference paths:
    - TinyCNN components: thr=0.5, min 20 px (`tiny_sc_ped.py:196-234`)
    - TinyUNet peaks: NMS k=7, thr=0.35 eval / 0.4 default, topk=200
      (`train_sc_ped.py:291-309,436`)
    - ScanContextUNet ring-banded thresholds 0.5/0.4/0.3 for rings
      <60 / 60-120 / >=120 (`tiny_sc_pred_v2.py:697-700`).
    """

    mask_threshold: float = 0.5
    min_component_pixels: int = 20
    # Max connected components returned per scan by the pipeline's
    # components/banded post-processing (scipy.ndimage.label in the
    # reference has no cap; a static capacity is the TPU-shape analog —
    # components beyond it are dropped by root-score top-k).
    component_capacity: int = 64
    peak_nms_kernel: int = 7
    peak_threshold: float = 0.4
    peak_topk: int = 200
    # (The greedy wrap-aware center-matching tolerances — dr<=3 rings,
    # ds<=6 sectors, train_sc_ped.py:312-340 — are evaluation-side
    # knobs and live as arguments of train.metrics.match_centers, not
    # here: matching never runs inside the jitted pipeline.)
    # Ring-banded thresholds (tiny_sc_pred_v2.py:339-349,697-700)
    band_edges: Tuple[int, ...] = (60, 120)
    band_thresholds: Tuple[float, ...] = (0.5, 0.4, 0.3)
    # Connected-components: max label-propagation sweeps on device
    # (convergence = component diameter in sweeps; sweeps are cheap)
    cc_max_iters: int = 1024


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """TPU device-mesh layout.

    The reference's entire distributed footprint is a never-enabled
    `DistributedSampler` flag (`kitti_dataloader.py:41-42`,
    `train_config.py:88`). Here data parallelism is first-class: batch is
    sharded over the ``data`` axis, and the descriptor grid / model
    activations may additionally be sharded over the ``sector`` axis
    (the polar analog of sequence parallelism, SURVEY §2.4).
    """

    data: int = 1
    sector: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "sector")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters, superset of the three reference trainers.

    Defaults follow trainer B (`train_sc_ped.py:41-63`), the only trainer
    with a CLI. Trainer A's values (`tiny_sc_ped.py:20-35`) and trainer
    C's (`tiny_sc_pred_v2.py:417-424,483-499`) are available via the
    factory methods.
    """

    model: str = "tiny_unet"  # tiny_cnn | tiny_unet | sc_unet
    height: int = 160
    width: int = 720
    batch_size: int = 16
    epochs: int = 30
    lr: float = 2e-3
    weight_decay: float = 1e-4
    seed: int = 1337
    # Normalization mode: "clip" (clip +-clip_abs_z then /clip_abs_z,
    # train_sc_ped.py:160) or "minmax" ([min,max]->[0,1],
    # tiny_sc_ped.py:54-60, tiny_sc_pred_v2.py:46-50).
    normalize: str = "clip"
    clip_abs_z: float = 3.0
    # Heatmap target (train_sc_ped.py:45,166-173)
    heat_sigma: float = 1.8
    # Losses
    focal_alpha: float = 0.75
    focal_gamma: float = 2.0
    pos_weight: float = 2.0       # trainer A BCE pos_weight
    use_dice: bool = False
    hm_loss_w: float = 1.0
    mask_loss_w: float = 0.0
    # Augmentation
    roll_aug: bool = True
    roll_max: int = 0             # 0 = full-width roll (trainer B), else +-roll_max
    ring_jitter: int = 0
    mask_dropout: float = 0.0     # trainer A aug_dropout_prob
    # Splits
    val_split: float = 0.15
    test_split: float = 0.10
    # Optimizer schedule (trainer C: cosine warm restarts T0=10 Tmult=2)
    scheduler: str = "none"       # none | cosine_restarts
    scheduler_t0: int = 10
    scheduler_t_mult: int = 2
    encoder_lr_scale: float = 1.0  # trainer C: encoder lr x0.5
    grad_clip: float = 0.0         # trainer C: 1.0
    early_stop_patience: int = 0   # trainer C: 10
    # Precision: params/accum always f32; compute dtype for the model
    compute_dtype: str = "float32"  # or "bfloat16"
    # Keep the materialized dataset resident in HBM and gather batches
    # on-device (ScanContextArrays.to_device): an epoch then ships only
    # index arrays instead of re-uploading every sample (~0.44 MB each).
    # Single-device fit() only (ignored under a mesh, where batches are
    # placed per-shard); costs 0.44 MB HBM per sample.
    device_cache: bool = False
    # (The duplicate-pedestrian quirk — SURVEY §2.3 register #2 — is a
    # dataset-generation decision: `cli build-dataset --dedupe` /
    # labels.pedestrians.pedestrians_in_scan_context(dedupe=...). The
    # trainers consume whatever JSONs the dataset carries.)
    ckpt_dir: str = "checkpoints"

    @staticmethod
    def trainer_a() -> "TrainConfig":
        """tiny_sc_ped.py:20-35 (TinyCNN segmentation)."""
        return TrainConfig(
            model="tiny_cnn",
            batch_size=8,
            epochs=30,
            lr=1e-3,
            weight_decay=0.0,
            normalize="minmax",
            pos_weight=2.0,
            use_dice=True,
            roll_max=32,
            mask_dropout=0.05,
            val_split=0.2,
            test_split=0.0,
        )

    @staticmethod
    def trainer_b() -> "TrainConfig":
        """train_sc_ped.py:41-63 (TinyUNet heatmap)."""
        return TrainConfig()

    @staticmethod
    def trainer_c() -> "TrainConfig":
        """tiny_sc_pred_v2.py:417-424,483-499 (ScanContextUNet)."""
        return TrainConfig(
            model="sc_unet",
            batch_size=16,
            epochs=50,
            lr=1e-3,
            weight_decay=1e-4,
            normalize="minmax",
            focal_alpha=0.25,
            focal_gamma=2.0,
            scheduler="cosine_restarts",
            encoder_lr_scale=0.5,
            grad_clip=1.0,
            early_stop_patience=10,
            val_split=0.15,
            test_split=0.15,
        )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end scan -> descriptor -> detection pipeline configuration."""

    scan_context: ScanContextConfig = ScanContextConfig()
    detector: DetectorConfig = DetectorConfig()
    normalize: str = "minmax"
    # CNN-stage numerics. Two independent knobs, both trace-time:
    #
    # compute_dtype: activation/compute dtype of the CNN
    # ("bfloat16" | "float32"). Params stay f32 either way. On TPU the
    # MXU truncates f32 conv inputs to bf16 at default precision
    # anyway, so f32 activations add HBM traffic without adding
    # accuracy: an f32 epilogue (bias/BN) blocks XLA's bf16
    # propagation and nearly doubles forward time (measured TinyCNN
    # B=96: f32 272 us/scan |dlogit| 2.6e-2 vs torch; bf16 160 us,
    # 3.0e-2 — scripts/bench_cnn_fold2.py / docs/PERF.md). bf16 is the
    # deployment default, the analog of the reference's CUDA AMP
    # autocast (train_sc_ped.py:365-386).
    #
    # matmul_precision: lax precision for convs/einsums (None = backend
    # default). With compute_dtype="float32" and
    # matmul_precision="float32" the pipeline reproduces torch logits
    # to 1.4e-6 on device at 428 us/scan — the exact-parity mode
    # (PipelineConfig.exact()).
    compute_dtype: str = "bfloat16"
    matmul_precision: Optional[str] = None
    # CNN implementation for the tiny_cnn model: "flax" (XLA convs, the
    # deployed default) or "pallas" (the fused VMEM planar kernels,
    # ops/cnn_pallas.py — parity-correct but measured SLOWER than XLA
    # on this chip because TinyCNN's weight matrices are too small to
    # fill the MXU either way; kept as an experimental backend, see
    # docs/PERF.md "Fused Pallas CNN").
    cnn_impl: str = "flax"
    # Descriptor implementation: "auto" (parity bitonic kernel on TPU,
    # sort_route elsewhere) or an explicit impl name accepted by
    # ops.scan_context.scan_context — including the opt-in non-parity
    # "bitonic_packed" fast backend.
    descriptor_impl: str = "auto"

    @classmethod
    def exact(cls, **kw) -> "PipelineConfig":
        """On-device 1e-4 logit-parity mode (measured 1.4e-6)."""
        return cls(compute_dtype="float32", matmul_precision="float32", **kw)

    @classmethod
    def fast(cls, stride: int = 1, **kw) -> "PipelineConfig":
        """OPT-IN non-parity throughput mode (the sanctioned fast
        profile, CLAUDE.md): half-resolution 80x360 grid whose cells are
        exactly maxpool2x2 of the golden grid, the packed single-key
        bitonic descriptor (z quantized to ~0.5 mm at this grid, and
        CLIPPED to +-16 m — out-of-range heights saturate, so the
        error bound only holds for |z| <= 16 m; see
        ops.bitonic.Z_QUANT_RANGE), and bf16 CNN activations. Accuracy
        deltas are measured and documented in docs/PERF.md; every
        parity gate stays on the default profile."""
        kw.setdefault("scan_context", ScanContextConfig.fast(stride))
        kw.setdefault("descriptor_impl", "bitonic_packed")
        return cls(**kw)
