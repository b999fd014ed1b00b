"""Leave-one-read-out real-signal transfer measurement (VERDICT r4 #5a).

Round 4's realmix fine-tune measured real_dna gains but was shown to be
memorisation (5 reads, train loss 4.5). This driver runs the honest
variant: per fold, the held-out read contributes NO training windows
(make_bundled_models --stage realdata --exclude_read), the slow flagship is
fine-tuned on the remaining 4 reads + synthetic mix, and real_dna metrics
are computed ONLY on the held-out read. kmer11 >= 2x chance (~0.004) on
held-out reads = genuine transfer; chance-level = the 5-read corpus cannot
support real adaptation (the round-3/4 data-scarcity diagnosis, proven).

One fold per invocation (each fold holds the TPU for the fine-tune):
    timeout 3000 python tools_dev/loo_real.py --fold read1 [--steps 4000]
Results append to /tmp/loo_results.json.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import types

sys.path.insert(0, "/root/repo")
REPO = "/root/repo"
REFERENCE_DNA = "/root/reference/chiron/example_data/DNA"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fold", required=True, help="read name to hold out")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--step_rate", type=float, default=1e-3)
    p.add_argument("--beam", type=int, default=30)
    p.add_argument("--out", default="/tmp/loo_results.json")
    p.add_argument("--shared_sim", default="/tmp/loo_shared",
                   help="dir holding the fold-independent synthetic mix "
                        "(generated on first use, then symlinked)")
    args = p.parse_args()

    from chiron_tpu.tools.make_bundled_models import (
        stage_finetune,
        stage_realdata,
    )

    work = f"/tmp/loo_{args.fold}"
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work)

    # the synthetic halves of the realmix corpus are fold-independent;
    # build once, hardlink-copy per fold (the real windows differ per fold)
    os.makedirs(args.shared_sim, exist_ok=True)
    shared_done = os.path.join(args.shared_sim, ".done")
    if not os.path.exists(shared_done):
        stage_realdata(args.shared_sim, rep_stride_labels=10)
        open(shared_done, "w").write("ok\n")
    # per-fold: real labels minus the held-out read
    stage_realdata(work, rep_stride_labels=10, exclude_read=args.fold)
    # replace the per-fold synthetic dirs with hardlink copies of the
    # shared ones (os.walk does not follow dir symlinks, so a symlinked
    # corpus silently contributes ZERO windows — measured: the fold then
    # trains on real-only windows and catastrophically forgets)
    for sub in ("slow", "fast"):
        d = os.path.join(work, "train_realmix", sub)
        if os.path.isdir(d):
            shutil.rmtree(d)
        shutil.copytree(os.path.join(args.shared_sim, "train_realmix", sub),
                        d, copy_function=os.link)
    v = os.path.join(work, "valid_realmix")
    if os.path.isdir(v):
        shutil.rmtree(v)
    shutil.copytree(os.path.join(args.shared_sim, "valid_realmix"), v,
                    copy_function=os.link)

    stage_finetune(work, "dna_slow", args.steps, step_rate=args.step_rate,
                   train_sub="train_realmix", valid_sub="valid_realmix")

    # evaluate ONLY the held-out read with the fold checkpoint
    from chiron_tpu.eval.pipeline import evaluation
    from chiron_tpu.tools.assess import assess_dir

    model_dir = os.path.join(work, "models", "DNA_SLOW_retrain")
    # point the model at the fine-tune EMA (stage_install convention)
    emas = sorted(f for f in os.listdir(model_dir)
                  if f.startswith("ema-") and f.endswith(".npz"))
    if emas:
        with open(os.path.join(model_dir, "checkpoint"), "w") as f:
            f.write(emas[-1] + "\n")
    raw_one = tempfile.mkdtemp(prefix=f"loo_in_{args.fold}_")
    shutil.copy2(
        os.path.join(REFERENCE_DNA, "output", "raw", args.fold + ".signal"),
        raw_one)
    out_dir = os.path.join(work, "eval_out")
    flags = types.SimpleNamespace(
        input=raw_one, output=out_dir, model=model_dir, start=0,
        batch_size=300, segment_len=2000, jump=1900, threads=0,
        beam=args.beam, extension="fastq", concise=False, mode="dna",
        reverse_fast5=False, recursive=False, sig_norm=1, bf16=False,
        length_bonus=None,
    )
    evaluation(flags)
    report = assess_dir(os.path.join(out_dir, "result"),
                        os.path.join(REFERENCE_DNA, "output", "result"))
    s = report["summary"]
    s["fold"] = args.fold
    s["steps"] = args.steps
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results[args.fold] = s
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(json.dumps(s, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
