"""length_bonus operating-point sweep on the full-size accuracy corpora.

Runs the slow and/or fast synthetic axis at several decode bonuses (one
process, memoised decode steps recompile per static bonus) and prints one
JSON line per point. Used to pick each bundled model's calibrated
model.json "length_bonus" default (VERDICT r4 #4).

Usage: timeout 3600 python tools_dev/bonus_sweep.py --axis slow --bonuses 0,0.3,0.6
"""
import argparse
import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--axis", default="slow", choices=["slow", "fast", "rna"])
    p.add_argument("--bonuses", default="0,0.3,0.6")
    p.add_argument("--beam", type=int, default=30)
    args = p.parse_args()

    import accuracy as A
    from chiron_tpu.tools.simulate import SimConfig

    work = tempfile.mkdtemp(prefix="bonus_sweep_")
    try:
        for b in [float(x) for x in args.bonuses.split(",")]:
            if args.axis == "slow":
                slow_dir, slow_kw = A._slow_model()
                s = A._measure_synth(
                    work, "dna", args.beam, 10, 2000,
                    cfg=SimConfig(mean_dwell=24.0, max_dwell=140,
                                  noise_ar=0.7),
                    axis=f"slow_b{b}", model_dir=slow_dir, call_kw=slow_kw,
                    length_bonus=b)
            elif args.axis == "fast":
                s = A._measure_synth(work, "dna", args.beam, 20, 4000,
                                     axis=f"fast_b{b}", length_bonus=b)
            else:
                s = A._measure_synth(work, "rna", args.beam, 5, 2000,
                                     axis=f"rna_b{b}", length_bonus=b)
            print(json.dumps({
                "axis": args.axis, "bonus": b,
                "identity": round(s["identity"], 4),
                "skill": round(s["skill"], 4),
                "kmer11": round(s["kmer11_hit_rate"], 4),
                "del": round(s["deletion_rate"], 4),
                "ins": round(s["insertion_rate"], 4),
            }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
