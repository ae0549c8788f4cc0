"""Benchmark suite over the five BASELINE.json configs. One JSON line each.

Timing methodology in benchmarks/measure.py: scalar-pull syncs
(block_until_ready is a no-op through the TPU tunnel), adaptive pipelined
dispatch between syncs — pipeline depth doubles until run-to-run spread is
<5%, so published numbers carry no tunnel jitter. The classification train
step additionally reports single-chip MFU (XLA cost-analysis FLOPs over
measured step time, against the chip's bf16 peak).

    python benchmarks/bench_suite.py [--quick] [--big]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# TPU v5e (v5 lite) peak: ~197 TFLOP/s bf16 / ~98 TFLOP/s fp32 on the MXU.
V5E_PEAK_BF16 = 197e12


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from measure import pipelined_rate
    from samplenet_tpu.models import SampleNet
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
    p.add_argument("--quick", action="store_true",
                   help="lower starting pipeline depth (still converges "
                        "to <5% spread)")
    p.add_argument("--big", action="store_true",
                   help="also run the large-batch configs (B=1024 "
                        "progressive shape)")
    args = p.parse_args()
    min_iters = 16 if args.quick else 48
    rng = np.random.RandomState(0)
    device = str(jax.devices()[0])

    def step_flops(jfn, *fargs):
        """XLA cost-analysis FLOPs of one call (None if unavailable)."""
        try:
            return jfn.lower(*fargs).compile().cost_analysis()["flops"]
        except Exception:
            return None

    def report(config: str, metric: str, res: dict, unit: str,
               flops=None, **extra):
        # MFU = cost-analysis FLOPs over the measured (pipelined) call
        # time vs the v5e bf16 peak — at B>=1024 the pipelined call time
        # is device time to within a few %; B=32 rows are dispatch-bound
        # (device-trace ms reported separately in BENCHMARKS.md).
        if flops is not None:
            extra["step_gflops"] = round(flops / 1e9, 2)
            extra["mfu_vs_bf16_peak"] = round(
                flops / res["sec_per_call"] / V5E_PEAK_BF16, 4)
        print(json.dumps({"config": config, "metric": metric,
                          "value": round(res["rate"], 2), "unit": unit,
                          "spread": res["spread"], "iters": res["iters"],
                          "device": device, **extra}), flush=True)

    # ---- config 1: SampleNet forward 1024->64, k=7, B=32 (reference CPU cfg)
    b = 32
    xs = [jnp.asarray(rng.randn(b, 1024, 3), jnp.float32) for _ in range(4)]
    net = SampleNet(num_out_points=64, bottleneck_size=128, group_size=7)
    v = net.init(jax.random.PRNGKey(0), xs[0][:2], training=False)
    fwd = jax.jit(lambda v, x: net.apply(v, x, training=False)[1])
    res = pipelined_rate(lambda x: fwd(v, x), [(x,) for x in xs], b,
                         min_iters=min_iters)
    report("1:samplenet_fwd_1024to64_b32", "eval fwd + matching", res,
           "clouds/sec", flops=step_flops(fwd, v, xs[0]))

    # ---- config 2: classification SampleNet train throughput at each m
    classifier = PointNetClassifier(num_classes=24)
    c_vars = classifier.init(jax.random.PRNGKey(1),
                             jnp.zeros((2, 64, 3)), training=False)
    ys = jnp.asarray(rng.randint(0, 24, b))
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

        flops = step_flops(step, holder["st"], xs[0], ys,
                           jax.random.PRNGKey(3))
        res = pipelined_rate(cls_call, [(x,) for x in xs], b,
                             min_iters=min_iters)
        report(f"2:cls_samplenet_train_m{m}", "train step", res,
               "clouds/sec", flops=flops)

    # ---- config 2b: the training-throughput headline shape (B=1024, m=32)
    if args.big:
        bb = 1024
        bxs = [jnp.asarray(rng.randn(bb, 1024, 3), jnp.float32)
               for _ in range(2)]
        bys = jnp.asarray(rng.randint(0, 24, bb))
        scfg = SampleNetConfig(num_out_points=32, batch_size=bb)
        sampler, bstate = create_samplenet_state(scfg, 1024,
                                                 jax.random.PRNGKey(9))
        bstep = make_samplenet_train_step(sampler, classifier, c_vars, scfg,
                                          augment_data=True)
        bholder = {"st": bstate}

        def big_call(x):
            bholder["st"], metrics = bstep(bholder["st"], x, bys,
                                           jax.random.PRNGKey(3))
            return metrics["loss"]

        flops = step_flops(bstep, bholder["st"], bxs[0], bys,
                           jax.random.PRNGKey(3))
        res = pipelined_rate(big_call, [(x,) for x in bxs], bb,
                             min_iters=max(min_iters // 3, 8))
        report("2b:cls_samplenet_train_m32_b1024", "train step", res,
               "clouds/sec", flops=flops)

        # ---- config 2c/2d/2e: the train-chain variants at the same shape —
        # ghost-BN (block stats, fastest), exact-BN (the r4 TPU default —
        # 2b above measures it implicitly via fused_train=None auto), and
        # the plain XLA chain (the r2/r3 default, kept for cross-round
        # continuity)
        for tag, fopts in (("2c:cls_samplenet_train_m32_b1024_fused_ghost",
                            {"fused_train": True}),
                           ("2d:cls_samplenet_train_m32_b1024_fused_exact",
                            {"fused_train": True, "fused_mode": "exact"}),
                           ("2e:cls_samplenet_train_m32_b1024_xla_chain",
                            {"fused_train": False})):
            fcfg = SampleNetConfig(num_out_points=32, batch_size=bb, **fopts)
            fsampler, fstate = create_samplenet_state(fcfg, 1024,
                                                      jax.random.PRNGKey(9))
            fstep = make_samplenet_train_step(fsampler, classifier, c_vars,
                                              fcfg, augment_data=True)
            fholder = {"st": fstate}

            def fused_call(x, stp=fstep, holder=fholder):
                holder["st"], metrics = stp(holder["st"], x, bys,
                                            jax.random.PRNGKey(3))
                return metrics["loss"]

            fflops = step_flops(fstep, fholder["st"], bxs[0], bys,
                                jax.random.PRNGKey(3))
            res = pipelined_rate(fused_call, [(x,) for x in bxs], bb,
                                 min_iters=max(min_iters // 3, 8))
            report(tag, "train step (fused)", res, "clouds/sec",
                   flops=fflops)

    # ---- config 3: progressive ordered inference (1024 outputs, all ratios)
    prog = SampleNet(num_out_points=1024, bottleneck_size=128, group_size=7,
                     sigma_mode="tf")
    pv = prog.init(jax.random.PRNGKey(4), xs[0][:2], training=False)
    pstate = TrainState.create(params=pv["params"],
                               batch_stats=pv["batch_stats"],
                               tx=optax.identity())
    infer = make_progressive_infer_step(prog, 1024)
    res = pipelined_rate(lambda x: infer(pstate, x)[3], [(x,) for x in xs],
                         b, min_iters=max(min_iters // 3, 8))
    report("3:progressive_infer_1024", "ordered infer (4 outputs)", res,
           "clouds/sec", flops=step_flops(infer, pstate, xs[0]))

    if args.big:
        # progressive eval forward at the infer_samplenet_progressive shape
        # [B=1024, N=1024, m=1024] — exercises the sort-based unique +
        # compaction (no quadratic buffers).
        bx = [jnp.asarray(rng.randn(1024, 1024, 3), jnp.float32)
              for _ in range(2)]
        pf = jax.jit(lambda v, x: prog.apply(v, x, training=False)[1])
        res = pipelined_rate(lambda x: pf(pv, x), [(x,) for x in bx],
                             1024, min_iters=max(min_iters // 6, 4))
        report("3b:progressive_eval_fwd_b1024_m1024",
               "eval fwd + matching (1024->1024)", res, "clouds/sec",
               flops=step_flops(pf, pv, bx[0]))

    # ---- config 4: AE reconstruction train step (chamfer), 2048 pts, B=50
    acfg = AEConfig(num_points=2048, batch_size=50, n_sample_points=2048)
    ae, astate = create_ae_state(acfg, jax.random.PRNGKey(5))
    ae_step = make_ae_train_step(ae, acfg)
    aes = [jnp.asarray(rng.randn(50, 2048, 3), jnp.float32) for _ in range(2)]
    ae_holder = {"st": astate}

    def ae_call(x):
        ae_holder["st"], loss = ae_step(ae_holder["st"], x)
        return loss

    res = pipelined_rate(ae_call, [(x,) for x in aes], 50,
                         min_iters=max(min_iters // 3, 4))
    report("4:ae_train_2048_b50", "train step (chamfer)", res, "clouds/sec",
           flops=step_flops(ae_step, ae_holder["st"], aes[0]))

    # ---- config 4b: AE train step with the approx-EMD loss at the
    # reference AE shape (pointnet_ae.py:125-133) — feasible on one chip
    # because approx_match accumulates its match in the scan carry.
    ecfg = AEConfig(num_points=2048, batch_size=50, n_sample_points=2048,
                    loss="emd")
    eae, estate = create_ae_state(ecfg, jax.random.PRNGKey(8))
    emd_step = make_ae_train_step(eae, ecfg)
    emd_holder = {"st": estate}

    def emd_call(x):
        emd_holder["st"], loss = emd_step(emd_holder["st"], x)
        return loss

    res = pipelined_rate(emd_call, [(x,) for x in aes], 50,
                         min_iters=max(min_iters // 12, 2))
    report("4b:ae_train_emd_2048_b50", "train step (approx-EMD)", res,
           "clouds/sec", flops=step_flops(emd_step, emd_holder["st"], aes[0]))

    # ---- config 4b-fast: same step with bf16 match levels (--emd-fast;
    # ops.matching fast_math — <0.2% transport-cost error, measured r2)
    efcfg = AEConfig(num_points=2048, batch_size=50, n_sample_points=2048,
                     loss="emd", emd_fast=True)
    efae, efstate = create_ae_state(efcfg, jax.random.PRNGKey(8))
    emdf_step = make_ae_train_step(efae, efcfg)
    emdf_holder = {"st": efstate}

    def emdf_call(x):
        emdf_holder["st"], loss = emdf_step(emdf_holder["st"], x)
        return loss

    res = pipelined_rate(emdf_call, [(x,) for x in aes], 50,
                         min_iters=max(min_iters // 12, 2))
    report("4bf:ae_train_emd_fast_2048_b50", "train step (approx-EMD bf16)",
           res, "clouds/sec",
           flops=step_flops(emdf_step, emdf_holder["st"], aes[0]))

    # ---- config 4c: AE train step with the soft-assignment loss
    # (beyond-reference; one [50, 2048, 2048] matmul + dual softmax)
    scfg2 = AEConfig(num_points=2048, batch_size=50, n_sample_points=2048,
                     loss="softassign")
    sae, sstate = create_ae_state(scfg2, jax.random.PRNGKey(9))
    sa_step = make_ae_train_step(sae, scfg2)
    sa_holder = {"st": sstate}

    def sa_call(x):
        sa_holder["st"], loss = sa_step(sa_holder["st"], x)
        return loss

    res = pipelined_rate(sa_call, [(x,) for x in aes], 50,
                         min_iters=max(min_iters // 6, 2))
    report("4c:ae_train_softassign_2048_b50", "train step (soft-assignment)",
           res, "clouds/sec",
           flops=step_flops(sa_step, sa_holder["st"], aes[0]))

    # ---- config 5: registration eval (dual-cloud sampling + PCRNet + errors)
    rcfg = RegistrationConfig(num_points=1024, num_out_points=64,
                              batch_size=b)
    pcrnet, pcr_state = create_pcrnet_state(rcfg, jax.random.PRNGKey(6))
    pcr_vars = {"params": pcr_state.params}
    rsampler = SampleNet(num_out_points=64, bottleneck_size=128, group_size=8)
    rv = rsampler.init(jax.random.PRNGKey(7), xs[0][:2], training=False)
    eval_step = make_eval_step(rsampler, pcrnet, pcr_vars, rcfg)
    twists = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]), (b, 1))
    res = pipelined_rate(
        lambda x0, x1: eval_step(rv, x0, x1, twists)[0],
        [(xs[i], xs[(i + 1) % 4]) for i in range(4)],
        b, min_iters=max(min_iters // 3, 4))
    report("5:registration_eval_dual64", "dual-sample + register + metrics",
           res, "pairs/sec",
           flops=step_flops(eval_step, rv, xs[0], xs[1], twists))


if __name__ == "__main__":
    main()
