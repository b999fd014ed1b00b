"""Forward-path FLOPs/sample + MFU for the bundled models (VERDICT r4 #9).

Counts forward FLOPs with XLA's own cost analysis (compiled on the CPU
backend — the HLO FLOP count is backend-independent for these graphs) and
combines them with the measured device throughput (BENCH_r*.json
device_samples_per_second metrics) against the chip's bf16/f32 peak, so the
utilization number in STATUS.md is a computed artifact instead of an
anecdote.

Usage: python tools_dev/mfu.py [--samples_per_s_fast N --samples_per_s_slow N]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
# v5e peak: 197 TFLOP/s bf16, ~98 TFLOP/s f32 (public spec)
PEAK_BF16 = 197e12
PEAK_F32 = 98.5e12


def flops_per_sample(model_dir: str, seg: int, batch: int = 32) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chiron_tpu import config as C
    from chiron_tpu.eval.pipeline import load_params
    from chiron_tpu.models import apply_model

    cfg = C.read_config(os.path.join(model_dir, "model.json"))
    params = load_params(model_dir, cfg)

    def fwd(x, lens):
        return apply_model(params, cfg, x, lens)

    x = jnp.zeros((batch, seg), jnp.float32)
    lens = jnp.full((batch,), seg, jnp.int32)
    lowered = jax.jit(fwd).lower(x, lens)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost["flops"]) / (batch * seg)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples_per_s_fast", type=float, default=None,
                   help="measured device samples/s for DNA_default (bench)")
    p.add_argument("--samples_per_s_slow", type=float, default=None,
                   help="measured device samples/s for DNA_slow (bench)")
    args = p.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")

    bench = {}
    for fn in sorted(os.listdir(REPO)):
        if fn.startswith("BENCH_r") and fn.endswith(".json"):
            with open(os.path.join(REPO, fn)) as f:
                bench = json.load(f)  # latest round wins
    parsed = bench.get("parsed", {}) if isinstance(bench, dict) else {}
    fast_sps = args.samples_per_s_fast or parsed.get(
        "device_samples_per_second_batch2000")
    slow_sps = args.samples_per_s_slow or parsed.get(
        "device_samples_per_second_slow_batch400")

    rows = []
    for name, seg, sps in (
        ("DNA_default", 400, fast_sps),
        ("DNA_slow", 2000, slow_sps),
        ("RNA_default", 2000, None),
    ):
        mdir = os.path.join(REPO, "chiron_tpu", "model", name)
        if not os.path.isdir(mdir):
            continue
        f = flops_per_sample(mdir, seg)
        row = {"model": name, "flops_per_sample": round(f)}
        if sps:
            eff = f * float(sps)
            row["device_samples_per_s"] = float(sps)
            row["effective_tflops"] = round(eff / 1e12, 1)
            row["mfu_vs_bf16_peak"] = round(eff / PEAK_BF16, 3)
            row["mfu_vs_f32_peak"] = round(eff / PEAK_F32, 3)
        rows.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
