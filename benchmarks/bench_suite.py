"""Benchmark suite over the five BASELINE.json configs. One JSON line each.

    python benchmarks/bench_suite.py [--quick]

Timing methodology as in bench.py: scalar-pull syncs (block_until_ready is a
no-op through the TPU tunnel), pipelined dispatch between syncs.
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pipeline_time(fn, args_list, iters: int) -> float:
    """Seconds per call, pipelined with one trailing sync."""
    import jax.numpy as jnp

    def sync(o):
        while isinstance(o, (tuple, list)):
            o = o[0]
        return float(jnp.sum(o))

    sync(fn(*args_list[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from samplenet_tpu.models import SampleNet
    from samplenet_tpu.models.autoencoder import PointNetAE
    from samplenet_tpu.models.pcrnet import PCRNet
    from samplenet_tpu.train.classification import (
        SampleNetConfig, create_samplenet_state, make_samplenet_train_step)
    from samplenet_tpu.models.pointnet_cls import PointNetClassifier
    from samplenet_tpu.train.progressive import make_progressive_infer_step
    from samplenet_tpu.train.registration import (
        RegistrationConfig, make_eval_step, create_pcrnet_state)
    from samplenet_tpu.train.reconstruction import (
        AEConfig, create_ae_state, make_ae_train_step)
    from samplenet_tpu.train.state import TrainState
    import optax

    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    # deep pipelines: ~33 ms tunnel round-trip amortises over iters
    iters = 24 if args.quick else 64
    rng = np.random.RandomState(0)
    device = str(jax.devices()[0])

    def report(config: str, metric: str, value: float, unit: str) -> None:
        print(json.dumps({"config": config, "metric": metric,
                          "value": round(value, 2), "unit": unit,
                          "device": device}), flush=True)

    # ---- config 1: SampleNet forward 1024->64, k=7, B=32 (reference CPU cfg)
    b = 32
    xs = [jnp.asarray(rng.randn(b, 1024, 3), jnp.float32) for _ in range(4)]
    net = SampleNet(num_out_points=64, bottleneck_size=128, group_size=7)
    v = net.init(jax.random.PRNGKey(0), xs[0][:2], training=False)
    fwd = jax.jit(lambda v, x: net.apply(v, x, training=False)[1])
    dt = pipeline_time(lambda x: fwd(v, x), [(x,) for x in xs], iters)
    report("1:samplenet_fwd_1024to64_b32", "eval fwd + matching",
           b / dt, "clouds/sec")

    # ---- config 2: classification SampleNet train + eval throughput at each m
    classifier = PointNetClassifier(num_classes=10)
    c_vars = classifier.init(jax.random.PRNGKey(1),
                             jnp.zeros((2, 64, 3)), training=False)
    ys = jnp.asarray(rng.randint(0, 10, b))
    for m in (8, 16, 32, 64):
        scfg = SampleNetConfig(num_out_points=m, batch_size=b)
        sampler, state = create_samplenet_state(scfg, 1024, jax.random.PRNGKey(2))
        step = make_samplenet_train_step(sampler, classifier, c_vars, scfg,
                                         augment_data=True)
        # train steps donate the state: thread it like a real training loop
        holder = {"st": state}

        def cls_call(x, stp=step, holder=holder):
            holder["st"], metrics = stp(holder["st"], x, ys,
                                        jax.random.PRNGKey(3))
            return metrics["loss"]

        dt = pipeline_time(cls_call, [(x,) for x in xs], iters)
        report(f"2:cls_samplenet_train_m{m}", "train step", b / dt,
               "clouds/sec")

    # ---- config 3: progressive ordered inference (1024 outputs, all ratios)
    prog = SampleNet(num_out_points=1024, bottleneck_size=128, group_size=7,
                     sigma_mode="tf")
    pv = prog.init(jax.random.PRNGKey(4), xs[0][:2], training=False)
    pstate = TrainState.create(params=pv["params"],
                               batch_stats=pv["batch_stats"],
                               tx=optax.identity())
    infer = make_progressive_infer_step(prog, 1024)
    dt = pipeline_time(lambda x: infer(pstate, x)[3], [(x,) for x in xs],
                       max(iters // 3, 8))
    report("3:progressive_infer_1024", "ordered infer (4 outputs)",
           b / dt, "clouds/sec")

    # ---- config 4: AE reconstruction train step (chamfer), 2048 pts, B=50
    acfg = AEConfig(num_points=2048, batch_size=50, n_sample_points=2048)
    ae, astate = create_ae_state(acfg, jax.random.PRNGKey(5))
    ae_step = make_ae_train_step(ae, acfg)
    aes = [jnp.asarray(rng.randn(50, 2048, 3), jnp.float32) for _ in range(2)]
    ae_holder = {"st": astate}

    def ae_call(x):
        ae_holder["st"], loss = ae_step(ae_holder["st"], x)
        return loss

    dt = pipeline_time(ae_call, [(x,) for x in aes], max(iters // 3, 4))
    report("4:ae_train_2048_b50", "train step (chamfer)", 50 / dt,
           "clouds/sec")

    # ---- config 5: registration eval (dual-cloud sampling + PCRNet + errors)
    rcfg = RegistrationConfig(num_points=1024, num_out_points=64,
                              batch_size=b)
    pcrnet, pcr_state = create_pcrnet_state(rcfg, jax.random.PRNGKey(6))
    pcr_vars = {"params": pcr_state.params}
    rsampler = SampleNet(num_out_points=64, bottleneck_size=128, group_size=8)
    rv = rsampler.init(jax.random.PRNGKey(7), xs[0][:2], training=False)
    eval_step = make_eval_step(rsampler, pcrnet, pcr_vars, rcfg)
    twists = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]), (b, 1))
    dt = pipeline_time(
        lambda x0, x1: eval_step(rv, x0, x1, twists)[0],
        [(xs[i], xs[(i + 1) % 4]) for i in range(4)], max(iters // 3, 4))
    report("5:registration_eval_dual64", "dual-sample + register + metrics",
           b / dt, "pairs/sec")


if __name__ == "__main__":
    main()
