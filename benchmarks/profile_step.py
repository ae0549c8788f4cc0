"""Device-trace attribution for a train/eval step on the real chip.

Traces ~10 steps with jax.profiler (which works through the axon tunnel;
CLAUDE.md), then aggregates the Chrome-trace device-track events by op
name — the tool behind the round-2/3 "where does the step time go"
tables in BENCHMARKS.md.

    python benchmarks/profile_step.py --variant fused [--batch 1024]
    python benchmarks/profile_step.py --variant baseline --top 25

Prints one JSON line per aggregated op {name, total_ms, per_step_ms,
calls} sorted by time, plus a {device_ms_per_step, wall_ms_per_step}
summary.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_device_events(trace_dir: str, steps: int, top: int) -> dict:
    """Aggregate the device (TPU) tracks of the profiler's trace.json.gz.

    The device pid carries an "XLA Modules" thread (one parent span per
    executed program) AND "XLA Ops" threads (the per-op child spans nested
    inside those parents). Summing all device events double-counts parent
    + children (~2x); `device_ms_per_step` therefore comes from the
    Modules track alone, while the per-op rows come from the Ops tracks.
    """
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device tracks: pids whose process_name metadata mentions the chip
    device_pids = set()
    module_tids = set()  # (pid, tid) of "XLA Modules" threads
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name:
                device_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name":
            if ev.get("args", {}).get("name", "") == "XLA Modules":
                module_tids.add((ev["pid"], ev.get("tid")))
    by_name: dict[str, list[float]] = defaultdict(list)
    module_ms = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur_ms = ev.get("dur", 0) / 1e3  # us -> ms
        if (ev["pid"], ev.get("tid")) in module_tids:
            module_ms += dur_ms
        elif not ev["name"].isdigit():  # skip step-marker overlay spans
            by_name[ev["name"]].append(dur_ms)
    rows = sorted(
        ({"name": k, "total_ms": round(sum(v), 3),
          "per_step_ms": round(sum(v) / steps, 4), "calls": len(v)}
         for k, v in by_name.items()),
        key=lambda r: -r["total_ms"])
    if not module_tids:  # older trace layout: fall back to the op sum
        module_ms = sum(sum(v) for v in by_name.values())
    return {"rows": rows[:top],
            "device_ms_per_step": round(module_ms / steps, 3)}


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from samplenet_tpu.models.pointnet_cls import PointNetClassifier
    from samplenet_tpu.train.classification import (
        SampleNetConfig,
        create_samplenet_state,
        make_samplenet_train_step,
    )
    from samplenet_tpu.train.state import clone_state
    from samplenet_tpu.utils.profiling import force_sync, trace

    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="fused",
                   choices=["baseline", "fused", "fused-exact", "bcn",
                            "remat", "progressive", "eval"])
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--m", type=int, default=32)
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--trace-dir", default=None)
    args = p.parse_args()
    b, n, m = args.batch, args.num_points, args.m

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 24, b))
    key = jax.random.PRNGKey(3)

    if args.variant == "eval":
        # the bench.py headline program: SampleNet eval forward + on-device
        # hard matching at [B, 1024 -> m] — traced for the device-time bound
        # that the pipelined-dispatch headline must not exceed (VERDICT r4
        # weak #1: the r3 1.69 ms/batch attribution predates the r4
        # emit_xyz FPS and sort-free unique reworks)
        from samplenet_tpu.models import SampleNet

        net = SampleNet(num_out_points=m, bottleneck_size=128, group_size=7)
        variables = net.init(jax.random.PRNGKey(0), x[:2], training=False)
        fwd = jax.jit(lambda v, xx: net.apply(v, xx, training=False)[1])
        for _ in range(3):
            out = fwd(variables, x)
        force_sync(out)
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_step_")
        t0 = time.perf_counter()
        with trace(trace_dir):
            for _ in range(args.steps):
                out = fwd(variables, x)
            force_sync(out)
        wall_ms = (time.perf_counter() - t0) * 1e3 / args.steps
        agg = aggregate_device_events(trace_dir, args.steps, args.top)
        for row in agg["rows"]:
            print(json.dumps(row), flush=True)
        print(json.dumps({
            "variant": "eval", "batch": b, "m": m,
            "device_ms_per_step": agg["device_ms_per_step"],
            "wall_ms_per_step": round(wall_ms, 3),
            "clouds_per_sec_device_bound": round(
                b / (agg["device_ms_per_step"] / 1e3), 1),
            "trace_dir": trace_dir,
        }), flush=True)
        return

    if args.variant == "progressive":
        # config 3: the ordered-infer step (4 output trees at m=1024, B=32
        # published shape) — the slowest published surface (VERDICT r3 #5)
        import optax

        from samplenet_tpu.models import SampleNet
        from samplenet_tpu.train.progressive import make_progressive_infer_step
        from samplenet_tpu.train.state import TrainState

        prog = SampleNet(num_out_points=m, bottleneck_size=128,
                         group_size=7, sigma_mode="tf")
        pv = prog.init(jax.random.PRNGKey(4), x[:2], training=False)
        pstate = TrainState.create(params=pv["params"],
                                   batch_stats=pv["batch_stats"],
                                   tx=optax.identity())
        infer = make_progressive_infer_step(prog, m)
        for _ in range(3):
            outs = infer(pstate, x)
        force_sync(outs[3].sum())
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_step_")
        t0 = time.perf_counter()
        with trace(trace_dir):
            for _ in range(args.steps):
                outs = infer(pstate, x)
            force_sync(outs[3].sum())
        wall_ms = (time.perf_counter() - t0) * 1e3 / args.steps
        agg = aggregate_device_events(trace_dir, args.steps, args.top)
        for row in agg["rows"]:
            print(json.dumps(row), flush=True)
        print(json.dumps({
            "variant": "progressive",
            "device_ms_per_step": agg["device_ms_per_step"],
            "wall_ms_per_step": round(wall_ms, 3),
            "trace_dir": trace_dir,
        }), flush=True)
        return

    opts = {"fused": {"fused_train": True},
            "fused-exact": {"fused_train": True, "fused_mode": "exact"},
            "bcn": {"conv_layout": "bcn"},
            "remat": {"remat": True}, "baseline": {}}[args.variant]

    classifier = PointNetClassifier(num_classes=24)
    c_vars = classifier.init(jax.random.PRNGKey(1), jnp.zeros((2, 64, 3)),
                             training=False)
    scfg = SampleNetConfig(num_out_points=m, batch_size=b, **opts)
    sampler, state = create_samplenet_state(scfg, n, jax.random.PRNGKey(2))
    step = make_samplenet_train_step(sampler, classifier, c_vars, scfg,
                                     augment_data=True)

    state = clone_state(state)
    for _ in range(3):  # compile + warm
        state, mm = step(state, x, y, key)
    force_sync(mm["loss"])

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_step_")
    t0 = time.perf_counter()
    with trace(trace_dir):
        for _ in range(args.steps):
            state, mm = step(state, x, y, key)
        force_sync(mm["loss"])
    wall_ms = (time.perf_counter() - t0) * 1e3 / args.steps

    agg = aggregate_device_events(trace_dir, args.steps, args.top)
    for row in agg["rows"]:
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "variant": args.variant,
        "device_ms_per_step": agg["device_ms_per_step"],
        "wall_ms_per_step": round(wall_ms, 3),
        "trace_dir": trace_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
