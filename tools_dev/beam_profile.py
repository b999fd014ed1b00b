"""On-chip beam-kernel latency attribution (VERDICT r3 #7 analysis).

Times beam_search_pallas ALONE (no forward model) on random logits at the
bench shape (B=400, T=400, 5 classes) for beam widths 30/50, with the
extract-max top-k loop in place ("exact") and replaced by a pass-through
("stub", the kernel's static ``topk_mode`` jit arg). The stub run is the
empirical floor of the rest of the kernel (merge + phase-2 gathers +
traceback): if it already exceeds the 10 ms target, no top-k algorithm can
reach it.

ADVICE r4 #1: the round-4 version toggled a module global after the exact
run; jax.jit never saw the flip (not part of the cache key), so the stub
numbers were a stale re-run of the exact program and the round-4
"topk-share ~0 ms" attribution was a cache artifact. ``topk_mode`` is now
a static_argnames parameter, so each mode compiles its own program.

Timing discipline (CLAUDE.md): block_until_ready does not block on the
axon backend; every timing forces one host readback of a 1-element slice,
and per-iteration dispatch is amortized by timing N chained steps.

Usage: timeout 1200 python tools_dev/beam_profile.py [--widths 30,50]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def time_variant(width: int, mode: str, iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    from chiron_tpu.ops.pallas import beam as B

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(400, 400, 5).astype(np.float32))
    lens = jnp.full(400, 400, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chain(lg, n):
        # n sequential kernel runs inside ONE program; one scalar out so a
        # single readback forces the whole chain (the tunnel's ~27ms
        # readback latency is paid once, amortized over n). topk_mode is a
        # static arg of beam_search_pallas, so "exact" and "stub" compile
        # distinct programs (ADVICE r4 #1).
        def body(i, carry):
            d, l, s = B.beam_search_pallas(
                lg + carry * 1e-9, lens, beam_width=width, topk_mode=mode
            )
            return s.sum() + l.sum().astype(jnp.float32) + d[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    _ = float(run_chain(logits, 2))  # warm-up + compile
    # The tunnel adds large, occasionally-bimodal noise to wall time (r5:
    # a single base/double pair produced NEGATIVE slopes at width 50).
    # Take the median of several independent slope measurements, and also
    # report the min-based slope (min is robust when noise is one-sided
    # additive delay, the tunnel's failure mode).
    slopes = []
    bases, doubles = [], []
    for _rep in range(5):
        t0 = time.time()
        _ = float(run_chain(logits, iters))
        bases.append(time.time() - t0)
        t0 = time.time()
        _ = float(run_chain(logits, 2 * iters))
        doubles.append(time.time() - t0)
        slopes.append((doubles[-1] - bases[-1]) / iters)
    med = sorted(slopes)[len(slopes) // 2]
    lo = (min(doubles) - min(bases)) / iters
    return med, lo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--widths", default="30,50")
    p.add_argument("--modes", default="exact,stub",
                   help="comma list of topk modes to time (exact,stub,packed)")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    modes = args.modes.split(",")
    for w in [int(x) for x in args.widths.split(",")]:
        out = {}
        for mode in modes:
            med, lo = time_variant(w, mode, args.iters)
            out[mode] = med
            print(f"beam{w}/{mode}: {med * 1e3:.2f} ms "
                  f"(min-slope {lo * 1e3:.2f})", flush=True)
        if "exact" in out and "stub" in out:
            print(f"beam{w}: topk-share {(out['exact'] - out['stub']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
