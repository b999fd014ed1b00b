"""Standalone oracle-ceiling run for the three synthetic accuracy axes.

Computes exactly what `accuracy.py --oracle` attaches under each axis's
"oracle" key (same n_reads/n_bases/seed/pore/cfg), but WITHOUT touching the
TPU or re-basecalling — pure-CPU, so it can run in the background while the
TPU trains. The oracle is deterministic in those inputs, so the numbers are
identical to what a full `accuracy.py --oracle` pass would produce; the
driver merges them into ACCURACY.json with tools_dev/merge_oracle.py.

Usage: python tools_dev/run_oracle.py [--out oracle_axes.json] [--axes a,b]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/oracle_axes.json")
    p.add_argument("--axes", default="synthetic_dna,synthetic_dna_slow,synthetic_rna")
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = p.parse_args()

    from chiron_tpu.tools.oracle import measure_axis
    from chiron_tpu.tools.simulate import KmerModel, SimConfig

    dna_pore = KmerModel.load(
        os.path.join(REPO, "chiron_tpu", "model", "DNA_default", "pore_model.tsv"))
    slow_pore = KmerModel.load(
        os.path.join(REPO, "chiron_tpu", "model", "DNA_slow", "pore_model.tsv"))
    # accuracy.py axis parameters (full, non-quick run)
    AXES = {
        "synthetic_dna": dict(n_reads=20, n_bases=4000, seed=991,
                              model=dna_pore, cfg=SimConfig()),
        # full accuracy corpora (committed round-5 oracle rows used every
        # read). Cost on a 2-CPU host: ~40 min (fast), ~40 min (slow AR),
        # ~85 min (rna k=6); cap with a smaller n_reads (deterministic
        # corpus prefix, accuracy.py --oracle_reads) when iterating.
        "synthetic_dna_slow": dict(
            n_reads=10, n_bases=2000, seed=991, model=slow_pore,
            cfg=SimConfig(mean_dwell=24.0, max_dwell=140, noise_ar=0.7)),
        "synthetic_rna": dict(n_reads=5, n_bases=2000, seed=992,
                              model=KmerModel.synthetic(), cfg=SimConfig.rna()),
    }
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    for name in args.axes.split(","):
        if name in out:
            print(f"{name}: already done, skipping")
            continue
        t0 = time.time()
        rep = measure_axis(workers=args.workers, **AXES[name])
        s = {k: round(v, 4) if isinstance(v, float) else v
             for k, v in rep["summary"].items()}
        out[name] = s
        print(f"{name}: {json.dumps(s, sort_keys=True)}  "
              f"[{time.time() - t0:.0f}s]", flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
