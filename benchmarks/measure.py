"""Shared timing methodology for all benchmarks.

The TPU sits behind a tunnel with ~33 ms host round-trip latency and
`block_until_ready` does NOT synchronise through it, so a measurement is
(a) a real sync via scalar pull, and (b) a deep pipeline of dispatches
between syncs — device programs execute in enqueue order, so syncing the
last output bounds the whole pipeline.

`pipelined_rate` additionally makes the published numbers trustworthy: it
repeats trials and DOUBLES the pipeline depth until BOTH (a) the relative
spread across trials is under `target_spread` (default 5%) — so
tunnel-scheduling jitter cannot leak into tables (round-1 lesson: 24-deep
pipelines at B=32 showed ±30% run-to-run noise) — and (b) the rate gain
over the PREVIOUS depth is under 3% — so per-dispatch overhead is
amortised and the number no longer depends on the stopping depth
(round-4 lesson: the B=1024 headline moved 403k -> 526k purely on which
depth the spread rule happened to stop at).

The returned round is the CONVERGED-PLATEAU round itself — the first
depth that both passes the spread gate and gains <3% over the previous
depth — never the max over depths (round-5 fix: max-of-noisy-rounds is
an upward-biased statistic, and it once published a round that failed
the spread gate; the full depth curve is returned for auditing). If the
curve never converges within `max_rounds`, the deepest round is returned
with `converged: false` so callers can label it.

Tunnel noise is strictly ADDITIVE (a stall only ever lengthens a trial),
so the lower quantiles estimate device time: statistics are computed over
the fastest 3 of 5 trials, which keeps one stalled trial from forcing
another pipeline-doubling round (or from inflating the published number).
"""

from __future__ import annotations

import time


def _sync(out) -> float:
    import jax.numpy as jnp

    while isinstance(out, (tuple, list, dict)):
        if isinstance(out, dict):
            out = next(iter(out.values()))
        else:
            out = out[0]
    return float(jnp.sum(out))


def pipelined_rate(
    fn,
    args_list,
    items_per_call: int,
    *,
    min_iters: int = 32,
    trials: int = 5,
    keep: int = 3,
    target_spread: float = 0.05,
    max_rounds: int = 6,
) -> dict:
    """Measure items/sec for `fn(*args)` with adaptive pipeline depth.

    Returns {"rate": items/sec, "spread", "iters", "sec_per_call",
    "converged", "depth_curve"} for the converged-plateau round (see module
    docstring); rate/spread come from the `keep` fastest of `trials` trials
    (additive tunnel noise means the fast tail is the device-time estimate).
    """
    _sync(fn(*args_list[0]))  # compile + real sync
    iters = min_iters
    prev = None
    cur = None
    curve = []
    for _ in range(max_rounds):
        times = []
        for _t in range(trials):
            t0 = time.perf_counter()
            out = None
            for i in range(iters):
                out = fn(*args_list[i % len(args_list)])
            _sync(out)
            times.append((time.perf_counter() - t0) / iters)
        srt = sorted(times)
        fast = srt[:keep]
        median = fast[len(fast) // 2]
        full_median = srt[len(srt) // 2]
        spread = (fast[-1] - fast[0]) / median
        cur = {
            "rate": items_per_call / median,
            "spread": round(spread, 4),
            "iters": iters,
            "sec_per_call": median,
            # full-trial median alongside the fast-tail stat so numbers stay
            # comparable with round-1 tables (which used all trials); the
            # published rate remains the fast-3-of-5 median (additive noise)
            "rate_all_trials": items_per_call / full_median,
            "method": f"fast{keep}of{trials}",
        }
        curve.append({"iters": iters, "rate": round(cur["rate"], 1),
                      "spread": round(spread, 4)})
        cur["depth_curve"] = curve
        # Two stopping conditions, BOTH required (round-4 lesson: at small
        # per-call device times the rate keeps climbing with depth long
        # after the spread settles — the published B=1024 headline moved
        # 403k -> 526k purely on the harness's stopping depth):
        #   (a) spread < target: trials agree (tunnel jitter amortised);
        #   (b) rate within 3% of the PREVIOUS depth's rate: dispatch
        #       overhead amortised — deeper pipelining would measure the
        #       same thing. (Round-5 fix: comparing to a running max — and
        #       returning it — published an upward-biased, possibly
        #       spread-failing round; the converged round itself is the
        #       defensible statistic.)
        converged = prev is not None and cur["rate"] < prev["rate"] * 1.03
        cur["converged"] = bool(spread < target_spread and converged)
        if cur["converged"]:
            return cur
        prev = cur
        iters *= 2
    return cur
