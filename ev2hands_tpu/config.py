"""Single typed configuration tree for the whole framework.

Replaces the reference's three config mechanisms (constants module
``src/settings.py``, argparse->env-var re-export in ``arg_parser.py:15-16``,
and architecture-changing raw env vars ``ERPC``/``MHLNES`` read inside
``TEHNet.py:122,148``) with one explicit, hashable dataclass tree that can be
passed through ``jax.jit`` as a static argument.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    """Event-camera sensor geometry (reference: ``src/settings.py:21-23``)."""

    width: int = 346   # DAVIS346
    height: int = 260
    lnes_window_ms: float = 5.0

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class EsimConfig:
    """Event-simulator thresholds (reference: ``src/settings.py:10-12,19-20``)."""

    positive_threshold: float = 0.4
    negative_threshold: float = 0.4
    # Per-pixel dead time between emitted events (esim_torch's
    # ``refractory_period_ns``; the reference constructs it with 0,
    # ``color_event_simulator.py:197-200``). Implemented in
    # ``ops/esim.esim_step`` as an exact stride filter over the evenly-spaced
    # crossings; 0 is a static no-op.
    refractory_period_ns: int = 0
    simulator_fps: int = 1000
    interpolation_fps: int = 30
    # Static bound on events emitted per pixel per frame pair.  The reference's
    # numba kernel hard-caps at 25 (``color_event_simulator.py:34``); we make
    # it an explicit, compile-time constant.
    max_events_per_pixel: int = 25


@dataclasses.dataclass(frozen=True)
class ManoConfig:
    """MANO hand-model hyperparameters (reference: ``src/settings.py:38``,
    ``src/Ev2Hands/model/utils.py:21``)."""

    model_path: str = "data/models"
    n_pose_comps: int = 6        # PCA pose components fed to the network
    n_shape_params: int = 10
    flat_hand_mean: bool = False
    n_vertices: int = 778
    n_faces: int = 1538
    n_joints: int = 21           # 16 MANO joints + 5 fingertips


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """TEHNet architecture (reference: ``src/Ev2Hands/model/TEHNet.py:115-166``).

    ``erpc`` / ``mhlnes`` were hidden env-var switches in the reference that
    changed the input channel count and the meaning of the third coordinate;
    here they are explicit hyperparameters.
    """

    num_classes: int = 4           # bg / left / right / noise
    n_points: int = 2048           # events per window (``erpc.py:170``)
    erpc: bool = True              # 5-channel ERPC input (x, y, t_avg, #pos, #neg)
    mhlnes: bool = False           # replace t coordinate with mean polarity
    # FPS start selection: the reference draws a random start index
    # (``pointnet2_utils.py:75``); deterministic start makes runs reproducible.
    fps_deterministic: bool = False
    # One FPS draw for BOTH regressor heads during random-FPS training.
    # The reference keeps independent per-head draws (``TEHNet.py:194-195``);
    # with a shared draw the heads' sa1 sampling + ball-query + sqrdist work
    # becomes one XLA-CSE'd computation (the eval path already shares it —
    # see TEHNet's ``reg_fps_idx``). A documented training-semantics
    # deviation like ``bf16_train``: both are unbiased FPS samplings, but
    # the heads lose their independent centroid draws. Measured A/B
    # (scripts/ab_shared_fps.py, full train step, 2 interleaved reps):
    # B=8 independent 114.8/113.9 w/s vs shared 114.4/115.6 (wash);
    # B=16 independent 105.8/106.7 vs shared 107.9/108.0 — recovers the
    # deterministic-FPS rate (107.9/108.1) exactly. The head machinery at
    # S=128 is ~1-2% of the step; default off for reference parity.
    shared_head_fps: bool = False
    # Neighborhood grouping backend for the set-abstraction blocks:
    # 'dense' (gather/sort-free masked pairs; eval numerics identical to
    # 'gather') or 'gather' (the reference's top_k + gather formulation
    # everywhere). Training defaults to 'gather' for BatchNorm-stat parity;
    # see dense_train below for the dense TRAINING formulation.
    grouping: str = "dense"
    # Per-layer grouping overrides (None -> fall back to ``grouping``).
    # The formulations' eval numerics are identical, but their speed is not:
    # the dense/sparse path streams whole point tiles per centroid while the
    # gather path touches exactly the K selected slots. On-TPU full-pipeline
    # A/B (scripts/ab_eval_grouping.py, B=32 N=2048, two interleaved reps):
    # all-dense 380.4/383.9 w/s; sa1 via one-hot gather 282.5/280.3;
    # sa1+regressors 276.2/276.3; everything gather 258.3/256.2 (nowide
    # 255.9/255.6). The dense/sparse production config wins every mix —
    # overrides stay None; kept for experimentation.
    grouping_sa1: Optional[str] = None
    grouping_sa2: Optional[str] = None
    grouping_regressor: Optional[str] = None
    # Centroids per chunk in the dense grouping paths (memory/program-size
    # knob: pair tensors are [B, dense_chunk, N, C]; smaller chunks cap
    # memory, bigger chunks shrink the unrolled program/compile time).
    dense_chunk: int = 64
    # Same knob for the MANO-regressor heads' sa1 (their pair tensors are
    # [B, chunk, n_points, 128+] — wider, so a smaller default).
    regressor_dense_chunk: int = 32
    # Use the dense formulation in TRAINING too, with multiplicity-weighted
    # BatchNorm batch statistics that reproduce the gather path's stats
    # exactly (backfill duplicates included; tested to f64-exactness incl.
    # gradients — see layers.SetAbstractionMsg._dense_train_scale).
    # STATUS (TPU v5e, B=8, N=2048, honest key-perturbed timing): LOSES
    # single-chip — fwd 85 ms / full step 511 ms vs the gather path's
    # 43.5 / 71.5 ms. The dense backward needs either >16 GB of pair
    # residuals (the un-remat'd variant OOMs at 17.7 GB) or jax.checkpoint
    # recompute of the chunked sweeps, and the recomputed chunk dots are
    # per-dot-issue-bound. Default off; the formulation is PRODUCTION for
    # event-sharded training (event_parallel + dense_train), where the
    # gather path has no cross-shard analogue and stats psum over shards.
    dense_train: bool = False
    # Shard the event dimension N over a mesh 'event' axis in the dense eval
    # path (SURVEY §5's context-parallel analogue for event clouds). Takes
    # effect when a Mesh is passed as ``TEHNet(cfg, event_mesh=...)``;
    # lets N scale past a single chip's quadratic-pair budget.
    event_parallel: bool = False
    # Use the fused Pallas grouping kernel for the dense-path scales where
    # it measured faster than XLA (TEHNet sa1 scales 2-3 on v5e: ~1.2x);
    # TPU inference only, exact on-device numerics vs the XLA dense path.
    pallas_grouping: bool = True
    # Point-tile size of the block-sparse grouping kernel (points per
    # pl.when-guarded tile; larger tiles -> fewer, bigger MXU dots but a
    # coarser activity skip). The chain is per-dot-issue-bound on v5e, so
    # nb=256 beat nb=128, but the benefit saturates at ~2048-row dots:
    # TPU sweep at N=2048 B=16 (scripts/ab_n4096.py --nb): 128 -> 333.1,
    # 256 -> 380.5, 512 -> 379.2 windows/s. 256 keeps the finer skip
    # granularity at equal speed (and a larger sb would grow the dots the
    # same way 512 does, so sb=8 stays too).
    pallas_nb: int = 256
    # Replace the gather-mode neighbor materialization (the TRAIN path's
    # single largest op: index_points of [B, S, sum(K)] rows, measured
    # ~18 ns/row on v5e — lane gathers, not bandwidth) with the block-sparse
    # one-hot MXU gather kernel (ops/pallas_gather.py): ball queries run in
    # Morton-permuted column space via query_ball_point_permuted (selection
    # semantics bitwise-unchanged), and each centroid's K slots are gathered
    # with one bf16 MXU dot per ACTIVE point tile (f32-exact via the
    # hi|mid|lo channel stack). Narrow-channel scales (3*(D+3) <= 128 lanes:
    # TEHNet sa1 + both regressor sa1s) ride one contiguous stack; sa2's
    # 323-channel source is covered too when pallas_gather_wide is set. TPU
    # only; forward is bitwise-equal to index_points (tested in interpret
    # mode AND on-chip), backward keeps XLA's scatter-add.
    # STATUS (TPU v5e, full train step B=8 N=2048, interleaved honest A/B,
    # scripts/ab_pallas_gather.py): LOSES end-to-end — off 115.3/118.3 w/s
    # vs on 108.3/106.9 (narrow-only 103.5/103.2; +pallas bwd 103.5/102.2).
    # The Morton permutation of the source rows (two full-N lane gathers +
    # their scatter transpose in the backward) and the permuted-space
    # selection cost more than the one-hot dots save. Default OFF; kept as
    # a tested exploration.
    pallas_gather: bool = False
    # Sort-free ball-query selection on the gather (training) path: the
    # j-th selected neighbor index is recovered from the inclusive
    # in-radius rank (cumsum of the radius mask) as a count, replacing the
    # O(N log^2 N) bitonic top_k with an O(N*K) VPU compare-reduce — the
    # same cumsum-rank machinery the dense eval path's selection mask
    # already uses. Output indices are bitwise-identical to the top_k
    # formulation (asserted on-device at production shapes). Op-level A/B
    # (scripts/ab_rank_select.py, TPU v5e, B=8 N=2048 S=512, 3 sa1 scales):
    # rank 6.84 ms vs top_k 8.73 ms over the fps+sqrdists base (-22%);
    # stacking the scales' reduces measured WORSE (12.4 ms, Kmax padding).
    # Step-level verdict (scripts/ab_rank_step.py, full jitted train step,
    # interleaved reps): B=16 WINS 112.8/114.1 vs 108.0/109.4 w/s (+4.4%);
    # B=8 a wash (114.8/115.1 vs 115.4/114.8), bf16 B=8 a wash within the
    # historical spread. Identical outputs + wins-or-neutral everywhere ->
    # default ON (the first op-level win here to survive the step;
    # pallas_gather and the custom index_points VJP both did not).
    rank_ball_query: bool = True
    # Point-tile size of the one-hot gather kernel (smaller tiles -> tighter
    # activity skip; each tile costs one [K, nb] @ [nb, 3C] MXU pass).
    pallas_gather_nb: int = 128
    # Backward of the one-hot gather: False = XLA's scatter-add (the lowering
    # XLA itself picks for gather gradients, measured fine in the train
    # step), True = the transposed one-hot kernel (oh^T @ g3 per active
    # tile, same float math up to summation order). Measured SLOWER than
    # XLA's scatter-add in the full step (102.2-103.5 vs 106.9-108.3 w/s
    # with pallas_gather on) — consistent with the earlier sort-based-VJP
    # negative result: don't replace XLA's gather transpose.
    pallas_gather_bwd: bool = False
    # Extend the one-hot gather to wide-channel sources — sa2's [B, 512,
    # 320(+3)] rows, where each hi|mid|lo term pads to a 128-lane segment
    # (seg=384) so the in-kernel slices stay lane-aligned. sa2's XLA gather
    # moves 192 rows x 323 ch per centroid; the kernel streams ~2 of 4 point
    # tiles as one [192, 128] @ [128, 1152] bf16 dot each. Only consulted
    # when pallas_gather is on. Step-level A/B: wide beats narrow-only
    # (108.3/106.9 vs 103.5/103.2 w/s) — sa2's XLA gather is the worse
    # fallback — but the whole pallas_gather family still loses to
    # index_points end-to-end (see pallas_gather above).
    pallas_gather_wide: bool = True
    # Gather-mode (train-path) first-conv u/v split: apply each scale's
    # conv0 per POINT before the neighbor gather and reconstruct the pair
    # activation as u_n - v_s + b (the same linearity the dense eval path
    # exploits). Motivated by the measured TPU gather cost law
    # (scripts/gather_scaling.py): cost is per ROW and invariant to row
    # BYTES (7.4 ms for the production row count at 8 and at 128 channels
    # alike), so gathering the wider conv0 outputs is free while the
    # per-pair conv0 dots and the grouped concat/subtract drop out of
    # forward and backward. BN still normalizes the same selected-neighbor
    # multiset; values match the reference's grouped-conv formulation up to
    # float rounding (documented deviation; exact in exact arithmetic).
    # MEASURED: LOSES the full train step decisively (scripts/ab_uv_gather.py,
    # two interleaved reps each: B=8 84.8/84.5 on vs 118.6/116.5 off w/s;
    # B=16 83.3/82.9 vs 109.0/108.2; with bf16_train 99.0/98.7 vs ~140 off).
    # The gather row count is unchanged, so nothing is saved there, and the
    # u_n - v_s + b reconstruction materializes full [*, K, C_out] grouped
    # activations for EVERY scale's conv0 in f32 residuals — the backward
    # pays broadcast-subtract transposes that cost more than the per-pair
    # conv0 dots ever did (dots ride the MXU; the reconstruct is VPU +
    # bandwidth). Default OFF; kept as a tested negative result.
    uv_split_gather: bool = False
    # Run ALL of a layer's MSG scales in ONE block-sparse kernel pass
    # (block-diagonal stacked weights, union tile activity): the chain is
    # per-dot-issue-bound and per-scale passes pay dots ~ SUM of activity
    # fractions while one fused pass pays ~ the UNION (~ the largest
    # scale's, radii being nested). MEASURED NEUTRAL-TO-SLIGHTLY-SLOWER
    # end-to-end on TPU v5e despite a 9% standalone-forward win on
    # synthetic gaussian clouds (honest pipeline A/B, two interleaved
    # runs each: N=2048 B=32 383.0/380.1 off vs 375.7/380.8 on w/s;
    # N=4096 B=16 218 off vs 216 on): on real ERPC-clustered points the
    # nested radii make the union activity ~ the sum already, and the
    # stacked C1t-wide dots cost what the saved issues buy back. Default
    # OFF; kept as a tested exploration (exactness vs the per-scale
    # kernel pinned by test_fused_scales_kernel_matches_per_scale_interpret).
    pallas_fused_msg: bool = False
    # Mixed-precision TRAINING (TPU-idiomatic, default off = reference-f32
    # parity). The fat Dense/Conv chains — set-abstraction grouped convs,
    # feature propagation, query convs, classifier trunk — compute in
    # bfloat16 (flax ``dtype=bfloat16``). NOTE the MXU already runs f32
    # matmuls as bf16 passes at JAX's default precision, so the win here is
    # bandwidth, not FLOPs: activations stored/streamed at half the HBM
    # bytes on the [B, S, K, C] grouped tensors (fwd residuals AND their
    # backward re-reads), and half the VPU elementwise work between dots.
    # Parameters, optimizer state, BatchNorm
    # statistics (flax's dtype promotion keeps the normalization/stat math
    # in f32 because params are f32), the output heads (classifier logits,
    # regressor fc), MANO, and losses all stay float32. Eval traces are
    # bitwise-unchanged (the cast only applies when train=True). This is a
    # deliberate deviation from the reference's f32-only training
    # (``train.py:22-151`` has no AMP); opt-in.
    # MEASURED (TPU v5e, full train step, interleaved honest A/B,
    # scripts/ab_bf16.py): B=8 117.8/118.3 -> 140.5/137.0 w/s (+18%);
    # B=16 109.1/109.3 -> 129.3/129.6 (+18.5%). Training-quality tests in
    # tests/test_bf16.py (single-layer grad cosine + multi-step loss
    # decrease). Default stays False for reference-f32 numerics parity;
    # bench.py publishes both train lines.
    bf16_train: bool = False
    # Mixed-precision INFERENCE (the bf16_train analogue for the eval path;
    # default off = reference-f32 eval numerics). The dense-formulation
    # Dense/BatchNorm chains — the non-Pallas set-abstraction scales (sa2,
    # both regressor sa1s), sa3, feature propagation, the classifier trunk
    # and the query convs — compute AND normalize in bfloat16 (flax
    # ``dtype=bfloat16`` on Dense and eval-mode BatchNorm), halving the HBM
    # bytes of the [B, chunk, N, C] pair intermediates between MXU dots.
    # Selection stays exact-f32 (FPS, sqrdists, ball-query masks, 3-NN
    # distances), so neighbor/centroid INDICES are identical to f32 eval;
    # the sa1 sparse Pallas kernel already runs bf16 MXU dots on folded f32
    # weights and is unchanged. Output heads (classifier_conv_1, regressor
    # fc stack), MANO and metrics stay f32. MEASURED (TPU v5e, full
    # inference pipeline, interleaved honest A/B, scripts/ab_bf16_eval.py,
    # artifacts/ab_bf16_eval.json): a WASH — B=16 off 392.5/402.2 vs on
    # 401.2/396.6 w/s (within the historical spread), B=32 off 383.4/383.7
    # vs on 385.1/385.6 (+0.45%, consistent but tiny). The eval pipeline is
    # issue-bound in the sparse sa1 kernel and the dense chains' dots, not
    # activation-bandwidth-bound, so halving activation bytes buys ~nothing
    # (unlike training, where bf16 residual bytes won +18%). Default stays
    # f32 (exact reference eval numerics at equal speed); accuracy cost if
    # enabled is ~4e-3 absolute on regressed params, gate in
    # artifacts/learn_curve.json (bf16_eval_gate).
    bf16_eval: bool = False
    # Run the two MANO regressor heads as one h-stacked pass in the dense
    # eval path (shared FPS/selection, folded BN, batched matmuls) — exact
    # eval numerics (tested). MEASURED SLOWER on TPU v5e than the two plain
    # dots XLA emits for the separate heads (280 vs 315 windows/s full
    # pipeline at B=32): the h-batched dot_general tiles worse than two
    # unbatched ones, and XLA already CSEs the shared FPS/distance work.
    # Kept as an option; default off. See model/fused_regressor.py.
    fused_regressors: bool = False
    dropout_classifier: float = 0.3
    dropout_query: float = 0.1
    dropout_regressor: float = 0.3

    @property
    def in_channels(self) -> int:
        return 5 if self.erpc else 4


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference: ``src/Ev2Hands/losses.py:153-240``)."""

    collision_weight: float = 1e2
    collision_sigma: float = 0.5
    collision_max_pairs: int = 128      # static max colliding pairs per sample
    ce_class_weights: Tuple[float, ...] = (1.0, 30.0, 30.0, 10.0)
    ce_ignore_index: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop hyperparameters (reference: ``train.py:23-33``,
    ``finetune.py:25-36``)."""

    batch_size: int = 8
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    max_iter: int = 800_000
    save_iter: int = 10_000
    msg_iter: int = 50
    max_eval_iters: int = 8192
    eval_batch_size: int = 32
    seed: int = 0
    checkpoint_path: str = ""
    data_root: str = "data/Ev2Hands-S"
    # Data-parallel mesh axis size; 1 = single chip.
    data_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Main rendering camera: 30 degree y-FOV perspective projection at the
    sensor aspect ratio (reference: ``src/settings.py:42-43``)."""

    yfov_deg: float = 30.0
    znear: float = 0.05
    zfar: Optional[float] = None

    def projection_matrix(self, width: int, height: int):
        """Matches ``pyrender.PerspectiveCamera.get_projection_matrix``."""
        import numpy as np

        aspect = width / height
        yfov = math.radians(self.yfov_deg)
        t = 1.0 / math.tan(yfov / 2.0)
        p = np.zeros((4, 4), dtype=np.float64)
        p[0, 0] = t / aspect
        p[1, 1] = t
        p[3, 2] = -1.0
        if self.zfar is None:
            p[2, 2] = -1.0
            p[2, 3] = -2.0 * self.znear
        else:
            n, f = self.znear, self.zfar
            p[2, 2] = (f + n) / (n - f)
            p[2, 3] = (2 * f * n) / (n - f)
        return p


@dataclasses.dataclass(frozen=True)
class DatagenConfig:
    """Scene dressing for the synthetic generator.

    The reference renders textured hands with forearm meshes
    (``twohands.py:56-90``), per-frame randomized point lights and a
    per-sequence random background image composited behind the hands
    (``HandSimulator/utils.py:255-384``). ``realistic_scene`` enables the
    TPU-native equivalents (Gouraud vertex colors, procedural forearms,
    device-side point lights, procedural background tiles)."""

    realistic_scene: bool = True
    add_forearms: bool = True
    n_lights: int = 5            # generate_train_lights builds 5 (utils.py:286-311)
    ambient: float = 0.1         # pyrender scene ambient (utils.py:323)
    background_cells: int = 8    # low-frequency noise grid for the background


@dataclasses.dataclass(frozen=True)
class Config:
    sensor: SensorConfig = SensorConfig()
    esim: EsimConfig = EsimConfig()
    mano: ManoConfig = ManoConfig()
    model: ModelConfig = ModelConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    camera: CameraConfig = CameraConfig()
    datagen: DatagenConfig = DatagenConfig()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = Config()

SEGMENTATION_COLOR = {"left": (0, 1, 0), "right": (0, 0, 1)}
HAND_COLOR = (198 / 255, 134 / 255, 66 / 255)
