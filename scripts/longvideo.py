"""Long-video VO proof at the reference's flagship scale (SURVEY.md §5.7).

The reference's central trajectory claim is full-colon scale: "less drift
or jitter compared to other methods" (README.md:21) over loopy multi-loop
colon paths (imgs/trajectorypredictions.png) and full-intestine
reconstruction (README.md:29). The streaming executor was BUILT for this
(O(chunk) device memory, f64 chaining, periodic rotation renorm —
vo/stream.py, vo/driver.py) but round 2 never demonstrated it past 48
frames. This script streams a multi-thousand-frame rendered colonoscopy
through the production VO path on one chip and records:

  * ATE / RPE drift vs sequence length (prefix evaluation), for the
    rotation-renorm A/B (renorm_every=50 vs 0 — chained from the SAME
    relative poses, so the A/B costs zero chip time);
  * end-to-end throughput (render excluded — it is benchmark apparatus,
    not the VO path; wall fps of the streaming phase reported);
  * host RSS sampled through the run + device HBM stats when the
    platform exposes them (memory must be FLAT: O(chunk), not O(N)).

Two ARMS cover both regimes of the reference's claims (README.md:7,21):

  * ``clean``  — the renderer's headlight falloff only (geometrically
    consistent between frames);
  * ``expjit`` — per-frame auto-exposure gain U(1-j, 1+j) on every
    streamed frame: the brightness-variation regime LCC exists for,
    driven with the global-LCC-trained weights (runs/ablate lccG cell).

Each arm writes ``docs/longvideo_<arm>.json``; the markdown + drift
figure are re-rendered from every arm JSON present, so arms can be run
(and re-run) independently.

Usage: python scripts/longvideo.py [n_frames] [weights] [out_dir]
                                   [--arm=clean] [--expjit=0.0]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np

RENORM_KEYS = ["frames", "ate", "rpe_trans", "rpe_rot_deg",
               "rpe_trans_5", "rpe_rot_deg_5"]


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


def _arm_path(out_dir: str, arm: str) -> str:
    # round-3 legacy name for the clean arm (docs/longvideo.json)
    return os.path.join(
        out_dir, "longvideo.json" if arm == "clean" else f"longvideo_{arm}.json"
    )


def run_arm(n_frames: int, weights: str, out_dir: str, arm: str,
            exp_jitter: float) -> dict:
    import jax  # noqa: F401  (device init before model load)

    from colvo.config import ColvoConfig
    from colvo.data.synthetic import default_intrinsics, make_trajectory, render_frame
    from colvo.evaluation.pose import evaluate_pose
    from colvo.pipelines import make_runner
    from colvo.vo.driver import chain_relative_poses
    from colvo.vo.stream import StreamingVO

    cfg = ColvoConfig()
    h, w = cfg.data.height, cfg.data.width
    k = default_intrinsics(h, w)
    # Same camera-motion model as the training corpus (step/wobble match
    # data/synthetic.py render_sequence defaults), unseen seed.
    gt_poses = make_trajectory(n_frames, step=0.004, wobble=0.3, seed=2026)

    cache = f"/tmp/longvideo_{n_frames}_{h}x{w}_j{exp_jitter}.npz"
    t0 = time.time()
    if os.path.exists(cache):
        frames_u8 = np.load(cache)["frames"]
        render_s = 0.0
        print(f"loaded cached render {cache}", flush=True)
    else:
        print(f"rendering {n_frames} frames {h}x{w} jitter={exp_jitter} ...",
              flush=True)
        # per-frame exposure gain: same protocol as the training corpus
        # (render_sequence — independent U(1-j, 1+j), clipped: bright
        # walls saturate the way real sensors do)
        gain_rng = np.random.default_rng(2026 + 77)
        frames_u8 = np.zeros((n_frames, h, w, 3), dtype=np.uint8)
        for i in range(n_frames):
            f, _ = render_frame(gt_poses[i], k, h, w, radius=0.03)
            if exp_jitter:
                f = np.clip(
                    f * (1.0 + gain_rng.uniform(-exp_jitter, exp_jitter)),
                    0.0, 1.0,
                )
            frames_u8[i] = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        render_s = time.time() - t0
        np.savez(cache, frames=frames_u8)
        print(f"rendered in {render_s:.0f}s", flush=True)

    runner = make_runner(cfg, weights)
    sv = StreamingVO(runner, chunk_size=32, depth_dtype="uint8")

    # warm the compiled stream fns on a tiny prefix (compile excluded
    # from the throughput number; steady-state is what a clinic runs)
    sv.run(list(frames_u8[:40]), keep_depths=False)

    # Host-RSS-only sampling: a per-second device memory_stats() RPC
    # through the tunneled platform serializes against the execution
    # stream and poisons the throughput measurement (first attempt: 3.7
    # "fps" with the RPC sampler vs healthy rates without). Device-side
    # O(chunk) residency is a property of the executor (bounded in-flight
    # wire buffers, vo/stream.py), asserted here via flat host RSS.
    rss_trace = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            rss_trace.append(_rss_mb())
            stop.wait(1.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    # keep_depths=False: the wire still carries every depth map (identical
    # executor cost) but the host retains O(chunk) — the long-run mode
    _, rel6 = sv.run(iter(frames_u8), keep_depths=False)
    stream_s = time.time() - t0
    stop.set()
    th.join()
    fps = n_frames / stream_s

    gt64 = gt_poses.astype(np.float64)
    prefixes = [p for p in (250, 500, 1000, 1500, 2000, 2500, 3000, 4000, 5000)
                if p <= n_frames] or [n_frames]  # tiny smoke runs still report
    curves = {}
    for renorm in (50, 0):
        poses = chain_relative_poses(rel6, renorm_every=renorm)
        rows = []
        for p in prefixes:
            m = evaluate_pose(poses[:p], gt64[:p])
            rows.append({"frames": p, **{k_: round(v, 6) for k_, v in m.items()}})
        curves[f"renorm{renorm}"] = rows

    rec = {
        "arm": arm,
        "exp_jitter": exp_jitter,
        "n_frames": n_frames,
        "weights": weights,
        "stream_s": round(stream_s, 1),
        "fps": round(fps, 1),
        "render_s": round(render_s, 1),
        "rss_mb_min": round(min(rss_trace), 1) if rss_trace else None,
        "rss_mb_max": round(max(rss_trace), 1) if rss_trace else None,
        "curves": curves,
    }
    with open(_arm_path(out_dir, arm), "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def render_report(out_dir: str) -> None:
    """Re-render docs/LONGVIDEO.md + drift figure from every arm JSON."""
    arms = []
    for arm in ("clean", "expjit"):
        p = _arm_path(out_dir, arm)
        if os.path.exists(p):
            with open(p) as f:
                rec = json.load(f)
            rec.setdefault("arm", arm)
            rec.setdefault("exp_jitter", 0.0)
            arms.append(rec)
    if not arms:
        return

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.4))
    styles = {"clean": "-o", "expjit": "--s"}
    for rec in arms:
        rows = rec["curves"]["renorm50"]
        xs = [r["frames"] for r in rows]
        label = rec["arm"]
        ax1.plot(xs, [r["ate"] for r in rows], styles.get(label, "-"),
                 label=label, ms=3)
        ax2.plot(xs, [r["rpe_rot_deg"] for r in rows], styles.get(label, "-"),
                 label=label, ms=3)
    ax1.set_xlabel("sequence length (frames)")
    ax1.set_ylabel("ATE (m, sim3-aligned)")
    ax2.set_xlabel("sequence length (frames)")
    ax2.set_ylabel("RPE rot (deg/frame)")
    ax1.legend(); ax2.legend()
    ax1.set_title("trajectory drift vs length")
    ax2.set_title("local rotation error vs length")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "longvideo_drift.png"), dpi=110)

    lines = [
        "# Long-video VO at reference scale",
        "",
        "Multi-thousand-frame rendered colonoscopy (256x320, unseen "
        "trajectory seed 2026, same motion model as training), streamed "
        "through the production chunked VO executor on ONE TPU v5 lite "
        "chip (uint8 wire). Drift is evaluated on trajectory PREFIXES — "
        "ATE re-aligns (Umeyama sim3) per prefix; RPE is local error.",
        "",
        "Arms: **clean** (headlight falloff only — geometrically "
        "consistent between frames) and **expjit** (independent per-frame "
        "exposure gain U(0.65, 1.35) on every streamed frame — the "
        "brightness-variation regime of the reference's LCC claim, "
        "README.md:7, driven with global-LCC-trained weights).",
        "",
    ]
    for rec in arms:
        lines += [
            f"## {rec['arm']} arm "
            f"({rec['n_frames']} frames, exp_jitter={rec['exp_jitter']})",
            "",
            f"* weights: `{rec['weights']}`",
            f"* throughput: **{rec['fps']:.1f} fps** end-to-end streaming "
            f"({rec['stream_s']:.0f} s; compile excluded, wire + chain "
            "included)",
            f"* host RSS over the run: {rec['rss_mb_min']} – "
            f"{rec['rss_mb_max']} MB",
            "",
            "| " + " | ".join(RENORM_KEYS) + " |",
            "|" + "---|" * len(RENORM_KEYS),
        ]
        for r in rec["curves"]["renorm50"]:
            lines.append(
                "| " + " | ".join(str(r[k_]) for k_ in RENORM_KEYS) + " |")
        # Rotation-renorm A/B: both chains start from the SAME per-pair
        # relative poses, so any separation is purely the SO(3)
        # projection. Reported as the max |delta| over prefixes instead
        # of a duplicate table (VERDICT r3 weak #4: a measured null was
        # presented as 14 rows of data).
        deltas = []
        for ra, rb in zip(rec["curves"]["renorm50"], rec["curves"]["renorm0"]):
            deltas += [abs(ra[k_] - rb[k_]) for k_ in RENORM_KEYS[1:]]
        lines += [
            "",
            f"Renorm A/B (`renorm_every=50` vs `0`, same relative poses): "
            f"max |Δ| over all prefixes and metrics = {max(deltas):.2e} — "
            "the SO(3) projection is a numerical no-op at this scale.",
            "",
        ]
    lines += ["![drift](longvideo_drift.png)", ""]
    with open(os.path.join(out_dir, "LONGVIDEO.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    # Valueless flags (bare `--cpu`) normalize to "1" — dict() over
    # 1-element splits raises before the membership test (ADVICE r4).
    flags = dict((a.lstrip("-").split("=", 1) + ["1"])[:2]
                 for a in sys.argv[1:] if a.startswith("--"))
    n_frames = int(pos[0]) if len(pos) > 0 else 3000
    weights = pos[1] if len(pos) > 1 else "runs/ablate/dcdp1_lcc1/weights.npz"
    out_dir = pos[2] if len(pos) > 2 else "docs"
    arm = flags.get("arm", "clean")
    exp_jitter = float(flags.get("expjit", "0.35" if arm == "expjit" else "0"))
    if "cpu" in flags:  # smoke runs while the chip is busy (JAX_PLATFORMS
        import jax      # env is force-prepended with axon on this host)
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(out_dir, exist_ok=True)

    rec = run_arm(n_frames, weights, out_dir, arm, exp_jitter)
    render_report(out_dir)
    print(json.dumps({k_: v for k_, v in rec.items() if k_ != "curves"}),
          flush=True)
    print(f"wrote {out_dir}/LONGVIDEO.md")


if __name__ == "__main__":
    main()
