"""Capture a profiler trace of the train step and print per-op attribution.

The roofline attribution (bench_decompose.py) works from XLA cost analysis
— bytes the program SHOULD move. This captures what the hardware actually
DID: N train steps under ``jax.profiler.trace`` and the xplane converted
to per-HLO-op self-time via tensorboard_plugin_profile (no UI needed), so
scheduling gaps, unfused transposes, and layout copies that cost analysis
cannot see show up by name (VERDICT r3 next #6: "a trace-backed proof of
the true byte floor").

Usage: python scripts/profile_train.py [steps] [--<config overrides>]
Writes the raw trace under /tmp/colvo_trace and prints the top-30 ops.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
# tensorboard_plugin_profile ships pre-generated protos older than the
# installed protobuf runtime; the pure-Python parser accepts them (slower,
# fine for a one-shot conversion). Must be set before any protobuf import.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def run_trace(steps: int, overrides, trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from colvo.config import ColvoConfig
    from colvo.data import SnippetDataset, batch_iterator, render_sequence
    from colvo.runtime import init_state, make_optimizer, make_train_step

    cfg = ColvoConfig()
    if overrides:
        cfg.apply_overrides(overrides)
    model, state = init_state(cfg, jax.random.key(0))
    tx = make_optimizer(cfg)
    step_fn = make_train_step(model, tx, cfg)
    seq = render_sequence(n_frames=16, height=cfg.data.height,
                          width=cfg.data.width, seed=0)
    ds = SnippetDataset([seq.frames], [seq.k], cfg.data.frame_offsets)
    batch = jax.tree.map(jnp.asarray,
                         next(batch_iterator(ds, cfg.data, seed=0)))

    # warm/compile outside the trace window
    state, m = step_fn(state, batch)
    float(m["loss/total"])

    with jax.profiler.trace(trace_dir):
        last = None
        for _ in range(steps):
            state, m = step_fn(state, batch)
            last = m["loss/total"]
        float(last)  # one fetch pins completion inside the window


def parse_trace(trace_dir: str, steps: int, top: int = 30) -> None:
    """Aggregate per-op device time straight from the newest xplane.pb.

    TF 2.21 dropped the xspace→tools converter that tensorboard's profile
    plugin used, so read the proto directly: XSpace → XPlane (one per
    device) → XLine ("XLA Ops" = one XEvent per HLO op execution; leaf
    level, so summing durations by op name IS self time) with op category
    carried in the event's stats.
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        name = plane.name
        if not ("TPU" in name or "device" in name.lower()
                or name.startswith("/host:CPU")):
            continue
        emeta = plane.event_metadata
        smeta = plane.stat_metadata
        per_op, per_cat, per_line = {}, {}, {}
        for line in plane.lines:
            lname = line.name or f"line{line.id}"
            ldur = 0
            use = ("xla ops" in lname.lower()) or ("xla op" in lname.lower())
            for ev in line.events:
                dur = ev.duration_ps / 1e12  # → seconds
                ldur += dur
                if not use:
                    continue
                md = emeta.get(ev.metadata_id)
                op = (md.display_name or md.name) if md else "?"
                cat = "?"
                for st in ev.stats:
                    sm = smeta.get(st.metadata_id)
                    if sm and sm.name in ("hlo_category", "equation"):
                        cat = st.str_value or cat
                if cat == "?" and md:
                    for st in md.stats:
                        sm = smeta.get(st.metadata_id)
                        if sm and sm.name == "hlo_category":
                            cat = st.str_value or cat
                per_op[op] = per_op.get(op, 0.0) + dur
                per_cat[cat] = per_cat.get(cat, 0.0) + dur
            per_line[lname] = ldur
        if not per_line:
            continue
        print(f"\n===== plane: {name} =====")
        for lname, t in sorted(per_line.items(), key=lambda kv: -kv[1])[:6]:
            print(f"  line {lname}: {t*1e3:.1f} ms total")
        if per_op:
            total = sum(per_op.values())
            print(f"\n  == XLA Ops: per-category time ({steps} steps, "
                  f"{total*1e3:.1f} ms => {total/steps*1e3:.2f} ms/step) ==")
            for cat, t in sorted(per_cat.items(), key=lambda kv: -kv[1]):
                print(f"  {t/steps*1e3:9.3f} ms/step  {100*t/total:5.1f}%  {cat}")
            print(f"\n  == top {top} ops ==")
            for op, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {t/steps*1e3:9.3f} ms/step  {100*t/total:5.1f}%  "
                      f"{op[:90]}")


def main():
    argv = list(sys.argv[1:])
    steps = int(argv.pop(0)) if argv and not argv[0].startswith("--") else 10
    trace_dir = "/tmp/colvo_trace"
    os.makedirs(trace_dir, exist_ok=True)
    if "--cpu" in argv:  # smoke runs while the chip is busy
        argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    if "--parse-only" in argv:
        argv.remove("--parse-only")
    else:
        run_trace(steps, argv, trace_dir)
    parse_trace(trace_dir, steps)


if __name__ == "__main__":
    main()
