"""Typed nested config system (SURVEY.md component R6, §5.6).

Dataclass tree with dotted CLI overrides (``--train.lr=2e-4``) and YAML-ish
(JSON) load/dump. Every ablation in the reference's method space — LCC
on/off (/root/reference/README.md:7), DCDP fusion on/off, n_scales, source
frames — is a config knob so the eval harness can reproduce the figures'
ablation style.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple


@dataclass
class DataConfig:
    """Dataset / input pipeline (components D1–D5)."""

    data_root: str = ""
    dataset: str = "synthetic"  # synthetic | frames | video
    height: int = 256
    width: int = 320
    frame_offsets: Tuple[int, ...] = (-1, 1)  # source frames relative to target
    batch_size: int = 12
    loader: str = "numpy"  # numpy | grain (checkpointable iterator state) |
    #   device (corpus pinned to HBM as uint8, batches assembled on device —
    #   fastest; requires a single shared K across sequences)
    num_workers: int = 4
    shuffle_buffer: int = 512
    augment: bool = True
    # Color jitter ranges (Monodepth2 protocol: loss on clean frames).
    brightness: float = 0.2
    contrast: float = 0.2
    saturation: float = 0.2
    hue: float = 0.05
    hflip: bool = True


@dataclass
class ModelConfig:
    """DepthNet / PoseNet / DCDP fusion (components M1–M5)."""

    num_layers: int = 18  # ResNet depth for the encoder: 18 | 34
    n_scales: int = 4  # disparity output scales
    # Colon-scale depth range (meters); colonoscopy working distance is cm.
    min_depth: float = 0.01
    max_depth: float = 1.0
    pose_rotation_scale: float = 0.01  # family-standard axis-angle scaling
    pose_translation_scale: float = 0.01
    dcdp_fusion: bool = True  # DCDP coupling (README.md:7); off = plain PoseNet
    batched_snippet: bool = True  # one (B·F) depth pass + one (B·S) pose
    #   pass per snippet instead of per-frame/per-pair calls (identical
    #   math — GroupNorm is per-sample; ~30% faster step). False = the
    #   reference per-frame loop (diagnostic/fallback).
    fusion_channels: int = 64
    norm: str = "group"  # encoder normalization: group (TPU-native, no
    #   batch-stat sync over the DP mesh) | none (BN-folded conv bias — the
    #   torch family-checkpoint import target, colvo.runtime.torch_import)
    # Compute dtype for conv stacks; params stay float32.
    dtype: str = "bfloat16"
    remat: bool = False  # rematerialize conv blocks (flax nn.remat on every
    #   encoder BasicBlock + decoder ConvBlock): the backward pass recomputes
    #   block activations instead of reading them from HBM. The step is
    #   bandwidth-bound at ~8.5% MFU (README perf table) — recompute FLOPs
    #   are free, activation bytes are not. Exact math (remat is not an
    #   approximation; grad parity pinned in tests/test_models.py), param
    #   tree unchanged (checkpoint-compatible). Off by default pending
    #   on-chip measurement.


@dataclass
class LossConfig:
    """Loss suite (components L1–L6)."""

    ssim_alpha: float = 0.85  # α·(1−SSIM)/2 + (1−α)·L1
    smoothness_weight: float = 1e-3
    geometric_weight: float = 0.1  # DCDP cross-frame consistency (L5)
    geo_ramp_steps: int = 0  # linearly ramp the geo term's weight from 0
    #   over the first N steps (basin-robustness lever, VERDICT r4 next
    #   #4: the geo gradient on random-init depth is the loudest early
    #   signal and a candidate driver of the mediocre basin); 0 = off.
    #   Ramps only the loss-term weight — the DCDP occlusion coupling
    #   (err * g_weight) stays structural from step 0.
    lcc: bool = True  # light-consistent calibration (L1, README.md:7)
    lcc_mode: str = "affine"  # affine | gain | off | global |
    #   global+affine | global+gain — global* modes prepend a per-frame
    #   global affine (auto-exposure prior; losses/photometric.py)
    lcc_window: int = 15  # low-frequency local window for the gain field
    lcc_identity: bool = False  # ALSO apply LCC to the identity
    #   (unwarped) source before the automask's identity error. The
    #   automask compares warped-vs-target error (LCC-calibrated) against
    #   unwarped-vs-target error (raw): under per-frame exposure jitter
    #   the raw identity error carries the full gain mismatch, so the
    #   identity side systematically loses and the automask degrades to
    #   keep-everything — one measured channel by which jittered training
    #   damages depth even with global LCC on (docs/EXPJIT_MECHANISM.md).
    #   Calibrating both sides restores the comparison; ≈ no-op on clean
    #   data (estimated gain ≈ 1). Off by default pending the 3-seed cell.
    fused_kernel: bool = False  # K1: warp+LCC+SSIM+L1 as ONE Pallas kernel
    #   on TPU (colvo.kernels.fused_loss — no materialized warped frames);
    #   False, non-TPU backends, or unsupported combos (lcc_mode="gain",
    #   ssim_alpha=0) use the composed sampler + XLA stats path. Identical
    #   math either way (parity pinned in tests/test_kernels.py).
    batched_photo: bool = False  # group all n_scales x n_sources full-res
    #   warp+LCC+SSIM+L1 evaluations (shape-identical under the Monodepth2
    #   upsample-to-full-res protocol) into ONE grouped sampler launch
    #   (kernels.bilinear_sample_fast_grouped — source planes re-read via
    #   the kernel's index_map, no tiled copies) + ONE vmapped stats
    #   pipeline (target broadcast fused, never materialized). Identical
    #   math (tests/test_losses.py) — and STILL measured slower on-chip,
    #   twice: round 2's tile-staging version 110.1 vs 90.3 ms/step
    #   (~220 MB of staging HBM traffic), round 5's zero-staging grouped
    #   version 95.0 vs 82.3. With staging eliminated the residual is
    #   scheduling: the 8 per-pair fusion islands interleave sampler
    #   launches with stats fusions, while the grouped form serializes one
    #   96-plane launch against one giant stats fusion. Kept as a
    #   documented negative result; the grouped kernel itself is live
    #   infrastructure (parity-pinned in tests/test_kernels.py).
    automask: bool = True  # identity-reprojection automasking (L3)
    min_reprojection: bool = True  # per-pixel min over source frames (L3)
    photo_native: bool = False  # evaluate the photometric term at each
    #   scale's NATIVE grid (SfMLearner protocol: downsampled frames,
    #   scale-local projection) instead of the Monodepth2 upsample-to-
    #   full-res protocol. Cuts the warp+LCC+SSIM byte traffic ~3×
    #   (1 + 1/4 + 1/16 + 1/64 vs 4 full-res evaluations) — the step is
    #   bandwidth-bound (VERDICT r2 next #1). Measured: −7 ms/step but
    #   +13.5% Abs-Rel (0.0646 vs 0.0569±0.0014, 4000-step quality cell,
    #   runs/ablate dcdp1_lcc1_pnative) — the full-res protocol's extra
    #   bytes buy real depth accuracy, so OFF stays the default.
    compute_dtype: str = ""  # photometric-plane storage/compute dtype:
    #   "" (float32, default) | "bfloat16". Casts the warped
    #   frame + comparison target right AFTER the bilinear gather (the
    #   Pallas sampler is f32 — Mosaic 32-bit lane constraint) so every
    #   downstream photometric plane — LCC window stats, SSIM moments,
    #   err maps, identity/automask stacks and their saved VJP residuals —
    #   moves half the HBM bytes. Geometry (depth/pose/projection/geo
    #   consistency) and the final loss reductions stay float32.
    #   MEASURED NEGATIVE on-chip and kept as the record: 340.3 ms/step vs
    #   92.1 baseline (serial-chain protocol, round 4) — every f32<->bf16
    #   boundary at full-res inserts convert+relayout copies (bf16 packs
    #   (16,128) vs f32 (8,128) tiles) and splits the fusion islands, and
    #   the round-4 profiler trace shows the loss's XLA stat planes were
    #   only ~18 ms of the step anyway (custom-call Pallas kernels are 46,
    #   model convs 29). The byte-diet intuition was measured wrong TWICE
    #   here (photo_remat +7.4 ms, this 3.7x) — on this toolchain the f32
    #   planes fuse better than anything that halves them. float16 is
    #   rejected outright: measured NaN gradients through the SSIM
    #   backward (VJP squares the ~1e-3 denominator past f16 range); bf16
    #   keeps f32's exponent. CPU-measured fidelity had been fine (loss
    #   rel-err 0.25%, pose-grad cosine 0.978 — tests/test_losses.py), so
    #   the knob stays as a tested, honest negative result.
    photo_remat: bool = False  # recompute the LCC/SSIM window statistics
    #   in the backward pass (jax.checkpoint around the stats pipeline)
    #   instead of materializing ~a dozen full-res stat planes for the
    #   VJP. Trades VPU recompute (free at 8.5% MFU) for HBM bytes. The
    #   warp itself stays OUTSIDE the remat scope so the Pallas sampler
    #   never re-runs. Off by default pending on-chip measurement.
    # Geometric-consistency evaluation protocol (L5). Defaults are the
    # TPU-fast path; flip both for the family's full-res/full-grad protocol
    # (kept as the semantics contract and exercised in tests).
    geo_full_res: bool = False  # False: evaluate L5 at each scale's native
    #   resolution (4–64× less warp work at scales 1–3; the constraint is
    #   scale-local — overfit trajectories match the full-res protocol to
    #   <1% while cutting the gather+scatter cost ~3×)
    geo_res_cap: int = 0  # max geo-grid height (native-scale protocol):
    #   grids taller than this are 2x mean-pooled until they fit; 0 = no
    #   cap (default). Round 1 defaulted to 64 because the XLA depth-warp
    #   gather + scatter-add backward dominated the step (216 of 299 ms
    #   at 256x320); the Pallas full-grad sampler (kernels/scatter.py)
    #   makes the honest uncapped protocol affordable, and the benchmark
    #   A/B was decisive FOR uncapped: 4000 steps on the synthetic colon
    #   corpus, held-out eval — abs_rel 0.065 vs 0.363, a1 0.92 vs 0.32,
    #   rpe_rot 0.27 vs 1.42 deg (runs/ablate/ABLATION.md). The cap was
    #   starving the geo term of high-frequency signal and quietly
    #   changing the trained objective (VERDICT r1 weak #3).
    #   128 (round 4, 3-seed cell, −5.6 ms/step = 86.5 vs 92.1): same 2/3
    #   strong-basin rate as uncapped with marginally better good seeds
    #   (abs_rel 0.047/0.054 vs 0.056/0.058), but its bad seed fell to
    #   0.52 — below the uncapped bad basin (0.35). Supported perf knob;
    #   default stays uncapped until the tail is understood
    #   (docs/ABLATION.md finding 7). Cap units are grid HEIGHT, i.e.
    #   resolution-relative — these numbers are for the 256x320 config.
    geo_grad: str = "both"  # gradient protocol for the sampled depth:
    #   both — gradients flow through both the projected z and the sampled
    #     source depth (family/SC-Depth semantics; XLA gather + scatter-add
    #     backward on TPU). The only protocol that trains on the overfit
    #     fixture — keep it unless experimenting.
    #   sym — EXPERIMENTAL: evaluate the constraint in both warp
    #     directions, each sampling the other frame's depth under
    #     stop-gradient, so both warps use the Pallas coords-grad sampler
    #     (no scatter backward, ~25 ms/step cheaper). Measured NEGATIVE on
    #     the overfit fixture (loss 0.135→0.133 in 20 steps vs 0.135→0.100
    #     for "both") — like one-sided stop-grad, the constraint appears
    #     to need true gradient through the sampled side.
    scatter_audit: bool = False  # emit aux metric geo/scatter_overflow:
    #   offset classes the Pallas scatter backward would DROP for this
    #   step's depth warps (kernels/scatter.py::scatter_cap_overflow).
    #   0 for any physical warp; nonzero means the V_CAP/H_CAP exactness
    #   contract was violated and source-depth gradients were truncated.
    #   Debug-mode observability (ADVICE r2 medium); off by default —
    #   costs a few small reductions per geo warp.
    # Depth<->pose gauge coupling (round-4 finding, docs/SCALE_DECOUPLING.md):
    # on ~1/8 of seed-runs the pose head's translation gauge collapses
    # ~100-200x below the depth gauge — rotation and median-scaled depth
    # stay perfect, but polyp localization (the reference's clinical
    # deliverable, /root/reference/README.md:9 — the ONE metric coupling
    # the two gauges) blows up 30-50x. t→0 is a near-flat direction of the
    # objective: the warp degrades to rotation-only, geo-consistency stays
    # satisfied (projected z ≈ sampled depth at ≈identity flow), and
    # automask eats the photometric residual. The fix is a RANGE prior on
    # the gauge-invariant ratio r = mean||t|| / mean(depth): a squared
    # log-hinge outside [gauge_lo, gauge_hi]. Measured on the round-4
    # trained runs (scripts/gauge_probe.py): 5 healthy runs across
    # clean/expjit/DCDP-on/off cells cluster at r ∈ [0.058, 0.106]; the
    # three collapsed runs sit at r ∈ [0.0004, 0.0007] — two orders of
    # magnitude below. The default band gives the healthy cluster ≥10x
    # headroom on each side — a domain prior in the same spirit as
    # min_depth/max_depth ("the camera moves a non-negligible fraction of
    # the scene depth per frame"), zero value AND gradient everywhere
    # inside the band. Re-trained validation: docs/GAUGE.md.
    # Band width matters — measured: a first validation pass at
    # [0.005, 1.0] stopped the catastrophic 100x collapse but let the
    # expjit_lccG seed-7 run drift to r ≈ 0.008-0.017 (4-7x decoupled,
    # polyp-e 2.6 vs the ≤0.3 target) INSIDE the band (runs/gauge,
    # docs/GAUGE.md). Healthy runs' training-time r fluctuates within
    # [0.04, 0.12], so the production band is [0.03, 0.3]: ~1.5-2x margin
    # around every healthy trajectory, zero room for a 4x+ collapse.
    gauge_weight: float = 1.0  # 0 disables; the hinge is exactly zero for
    #   any in-band model, so the weight only matters during escape
    gauge_lo: float = 0.03  # lower r bound (collapse detector)
    gauge_hi: float = 0.3  # upper r bound (runaway-translation guard)
    geo_stopgrad: bool = False  # True: stop-gradient the warped source
    #   depth (pseudo-label consistency) — enables the Pallas
    #   no-source-grad sampler on TPU instead of XLA gather + scatter-add
    #   backward. OFF by default: measured on the overfit smoke, detaching
    #   the sampled depth stalls training (loss ratio 1.14 vs 0.25 over 15
    #   steps) — both sides of the consistency residual need gradient


@dataclass
class TrainConfig:
    """Optimization schedule (components R1–R2)."""

    lr: float = 1e-4
    lr_decay_epochs: int = 15  # step decay ×0.1 after this epoch (family std)
    warmup_steps: int = 0  # linear LR warmup from 0 (basin-robustness
    #   lever, VERDICT r4 next #4); 0 = off (the family protocol)
    lr_decay_factor: float = 0.1
    epochs: int = 20
    seed: int = 42
    grad_clip: float = 10.0
    weight_decay: float = 0.0
    log_every: int = 50
    eval_every_epochs: int = 1
    ckpt_every_steps: int = 1000
    ckpt_dir: str = "checkpoints"
    ckpt_keep: int = 3
    max_bad_steps: int = 10  # NaN-loss abort guard (SURVEY.md §5.3)
    adam_mu_dtype: str = ""  # storage dtype for Adam's first moment
    #   ("bfloat16" halves its HBM read+write per step; "" = float32).
    #   The second moment stays float32 — its dynamic range carries the
    #   effective per-param LR and bf16's 8 mantissa bits visibly perturb
    #   sqrt(nu). mu is a smoothed gradient; bf16 noise there is dominated
    #   by minibatch noise (standard large-scale practice).
    dispatch_ahead_windows: int = 2  # bound async dispatch to N log_every
    #   windows past executed work (runtime/loop.py): one tunnel round
    #   trip per window when healthy; back-pressure + a dispatch-side
    #   NaN hard stop when the device crawls or the model diverges
    profile_steps: str = ""  # "a:b" window for jax.profiler (SURVEY.md §5.1)
    deterministic: bool = False  # pin matmul precision to 'highest' and
    #   replay-stable PRNG streams (SURVEY.md §5.2); TPU execution is
    #   otherwise deterministic given fixed seeds
    debug_nans: bool = False  # jax_debug_nans: raise at the op that first
    #   produces a NaN instead of tripping the max_bad_steps guard later
    # Basin detect-and-restart (VERDICT r4 next #4). The mediocre basin
    # has a crisp in-training signature: loss/geometric stuck >0.015 from
    # ~step 1000 while every strong-basin run is <=0.009 by then
    # (runs/ablate/dcdp1_lcc1* curves, docs/ABLATION.md). When
    # restart_threshold > 0, the loop blocking-fetches restart_metric ONCE
    # per attempt at the first logged step >= restart_check_step; above
    # threshold => discard the attempt, reinit params+opt with
    # seed + 1000*attempt, reset the step clock. At most restart_max
    # restarts; the final allowed attempt always runs to completion.
    # Costs one scalar fetch when healthy, restart_check_step wasted
    # steps per escape when not. 0 disables (the family protocol).
    restart_metric: str = "loss/geometric"
    restart_threshold: float = 0.0
    restart_check_step: int = 1500
    restart_max: int = 2


@dataclass
class MeshConfig:
    """Device mesh / parallelism (component R3, SURVEY.md §2.8: DP over ICI)."""

    data_parallel: int = -1  # -1 = all local devices
    axis_name: str = "data"


@dataclass
class EvalConfig:
    """Evaluation protocol (components E1–E3)."""

    depth_cap: float = 1.0  # clamp predictions/GT (family: 80 m on KITTI)
    median_scaling: bool = True  # per-image median alignment (scale-ambiguous)
    ate_alignment: str = "sim3"  # sim3 (Umeyama w/ scale) | se3


@dataclass
class ColvoConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    # ------------------------------------------------------------- serde

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=list)

    @classmethod
    def load(cls, path: str) -> "ColvoConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_dict(cls, d: dict) -> "ColvoConfig":
        cfg = cls()
        for section, values in d.items():
            sub = getattr(cfg, section)
            for k, v in values.items():
                if not hasattr(sub, k):
                    raise KeyError(f"unknown config key {section}.{k}")
                if isinstance(getattr(sub, k), tuple):
                    v = tuple(v)
                setattr(sub, k, v)
        return cfg

    def apply_overrides(self, overrides: Sequence[str]) -> "ColvoConfig":
        """Apply dotted CLI overrides like ``train.lr=2e-4``.

        Values parse as JSON when possible, else raw string.
        """
        for ov in overrides:
            ov = ov.lstrip("-")
            key, _, raw = ov.partition("=")
            if not raw:
                raise ValueError(f"override must be key=value: {ov!r}")
            section_name, _, leaf = key.partition(".")
            section = getattr(self, section_name)
            if not hasattr(section, leaf):
                raise KeyError(f"unknown config key {key}")
            try:
                val: Any = json.loads(raw)
            except json.JSONDecodeError:
                val = raw
            if isinstance(getattr(section, leaf), tuple) and isinstance(val, list):
                val = tuple(val)
            setattr(section, leaf, val)
        return self
