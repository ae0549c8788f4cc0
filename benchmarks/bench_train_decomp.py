"""Decompose the B=1024 classification SampleNet train step (the 2b bench
config) into its stages, each timed fwd+bwd where gradients flow in the real
step. Prints one JSON line per stage plus the full step, so the gap between
sum-of-stages and the fused step shows how much XLA fusion buys (or where
the time hides).

    python benchmarks/bench_train_decomp.py [--batch 1024] [--m 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from measure import pipelined_rate
    from samplenet_tpu.data import augment
    from samplenet_tpu.models import SampleNet
    from samplenet_tpu.models.pointnet_cls import PointNetClassifier
    from samplenet_tpu.train.classification import (
        SampleNetConfig, classification_loss, create_samplenet_state,
        make_samplenet_train_step)

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--m", type=int, default=32)
    p.add_argument("--num-points", type=int, default=1024)
    args = p.parse_args()
    b, n, m = args.batch, args.num_points, args.m

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(b, n, 3), jnp.float32) for _ in range(4)]
    ys = jnp.asarray(rng.randint(0, 24, b))
    key = jax.random.PRNGKey(3)

    scfg = SampleNetConfig(num_out_points=m, batch_size=b)
    sampler, state = create_samplenet_state(scfg, n, jax.random.PRNGKey(2))
    classifier = PointNetClassifier(num_classes=24)
    c_vars = classifier.init(jax.random.PRNGKey(1), jnp.zeros((2, 64, 3)),
                             training=False)
    params, bstats = state.params, state.batch_stats

    def report(stage, res):
        print(json.dumps({"stage": stage,
                          "ms_per_call": round(res["sec_per_call"] * 1e3, 3),
                          "spread": res["spread"], "iters": res["iters"]}),
              flush=True)

    def run(stage, fn, n_args=1):
        jfn = jax.jit(fn)
        arglists = [(x,) if n_args == 1 else (x, x) for x in xs]
        res = pipelined_rate(jfn, arglists, b, min_iters=24)
        report(stage, res)

    # 1. augmentation alone
    run("augment", lambda x: augment.augment_for_classification(key, x))

    # 2. sampler fwd (training path: simplification net + soft projection)
    run("sampler_fwd", lambda x: sampler.apply(
        {"params": params, "batch_stats": bstats}, x, training=True,
        mutable=["batch_stats"])[0][1])

    # 3. sampler fwd+bwd (grad wrt params of sum of projected points)
    def sampler_fb(x):
        def f(p):
            (simp, proj), _ = sampler.apply(
                {"params": p, "batch_stats": bstats}, x, training=True,
                mutable=["batch_stats"])
            return jnp.sum(proj)
        return jax.tree_util.tree_leaves(jax.grad(f)(params))[0]
    run("sampler_fwd_bwd", sampler_fb)

    # 4. classifier fwd+bwd THROUGH the m-point input (as in the real step:
    # classifier params frozen, grads flow through its input)
    qs = jnp.asarray(rng.randn(b, m, 3), jnp.float32)

    def cls_fb(x):
        def f(q):
            logits, _ = classifier.apply(c_vars, q, training=False)
            return classification_loss(logits, ys)
        return jax.grad(f)(qs + 0.0 * jnp.sum(x))
    run("classifier_fwd_bwd_m", cls_fb)

    # 5. simplification loss fwd+bwd (chamfer both directions + max term)
    simp_cloud = jnp.asarray(rng.randn(b, m, 3), jnp.float32)

    def simp_fb(x):
        def f(q):
            return sampler.apply(
                {"params": params, "batch_stats": bstats}, x, q, m,
                scfg.gamma, scfg.delta,
                method=SampleNet.get_simplification_loss)
        return jax.grad(f)(simp_cloud)
    run("simplification_loss_fwd_bwd", simp_fb)

    # 6. full train step (donated state threaded like a real loop)
    step = make_samplenet_train_step(sampler, classifier, c_vars, scfg,
                                     augment_data=True)
    holder = {"st": state}

    def full(x):
        holder["st"], metrics = step(holder["st"], x, ys, key)
        return metrics["loss"]
    res = pipelined_rate(full, [(x,) for x in xs], b, min_iters=24)
    report("full_train_step", res)


if __name__ == "__main__":
    main()
