"""Accuracy benchmark: writes ACCURACY.json with the framework's accuracy axes.

The reference measures basecall accuracy externally (graphmap + samtools +
japsa identity metrics, chiron/utils/assess.sh:15-20; paper GigaScience
giy037). This harness makes accuracy a first-class, diffable number using
the framework's own aligner (chiron_tpu/tools/assess.py):

  1. real_dna — basecall the reference's committed example reads
     (/root/reference/chiron/example_data/DNA raw signal) with the bundled
     DNA_default model and align against the reference's committed golden
     fastq (example_data/DNA/output/result/*.fastq). This measures agreement
     with the reference's trained model on REAL R9.4 signal. Information
     flow from these reads into the bundled model: (a) the EM-estimated
     k-mer pore table used by the simulator (tools/pore_estimate.py), and
     (b) since round 3, bootstrap-labelled training windows — the reads
     resquiggled against their own golden basecalls with the native DTW
     stack (make_bundled_models --stage realdata), i.e. the reference's
     prescribed label-generation pipeline applied to its own example data.
     The axis is therefore a train-domain agreement number, not a held-out
     generalisation claim (the synthetic axes are the held-out ones).
  2. synthetic_dna / synthetic_rna — basecall a held-out simulated corpus
     (seed disjoint from every training corpus) and align against the true
     sequences. This is the controlled identity number tracked
     round-over-round.
  3. synthetic_dna_slow — a second full simulate+basecall pass at the REAL
     reads' translocation regime (mean dwell 24 samples/base vs
     synthetic_dna's ~9, autocorrelated noise). Roughly doubles the DNA
     synthetic runtime (even in --quick, which halves its read count);
     skip it with --skip synthetic_dna_slow when iterating fast.

Model routing: real_dna and synthetic_dna_slow are basecalled with the
bundled DNA_slow model at the dna-slow-pre preset (seg 2000/jump 1900)
when its checkpoint is installed — real reads run at 22-26 samples/base,
squarely in DNA_slow's regime — falling back to DNA_default at seg 400
otherwise; each axis records which model produced it ("model").

The committed ACCURACY.json must always carry EVERY axis (a skipped axis
is a tracking regression — VERDICT r2 missing #3); tests/
test_accuracy_smoke.py floors the synthetic identity in the test suite.

METRIC CALIBRATION (round-3 finding): the banded global aligner scores a
RANDOM same-length caller at ~0.52 identity (free mismatch pairing), so
raw identity compresses all real skill into [0.52, 1]. Every axis
therefore also reports ``skill`` ((identity - 0.525) / 0.475, 0 = noise)
and ``kmer11_hit_rate`` (fraction of called 11-mers present in the
reference; chance ~0.002 — junk output cannot inflate it). Historical
context: the r1/r2 real_dna identities (0.62-0.69) sat at or barely above
the random baseline; the synthetic axes carry genuine but modest skill.

Usage:  python accuracy.py [--cpu] [--beam N] [--quick]
Output: one JSON document in ACCURACY.json + a summary line per axis.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE_DNA = "/root/reference/chiron/example_data/DNA"
MODEL_DNA = os.path.join(REPO, "chiron_tpu", "model", "DNA_default")
MODEL_RNA = os.path.join(REPO, "chiron_tpu", "model", "RNA_default")
# slow-translocation model (dna-slow-pre preset): used for the real reads
# (22-26 samples/base) and the synthetic slow axis; falls back to
# DNA_default at seg 400 when no DNA_slow checkpoint is installed
MODEL_SLOW = os.path.join(REPO, "chiron_tpu", "model", "DNA_slow")


def _slow_model():
    if os.path.exists(os.path.join(MODEL_SLOW, "checkpoint")):
        return MODEL_SLOW, dict(batch=300, seg=2000, jump=1900)
    return MODEL_DNA, dict(batch=400, seg=400, jump=390)

# held-out simulation seeds: every training corpus must use different ones
HOLDOUT_SEED_DNA = 991
HOLDOUT_SEED_RNA = 992


def _flags(input_dir, output_dir, model_dir, mode="dna", beam=30,
           batch=400, seg=400, jump=390, length_bonus=None):
    return types.SimpleNamespace(
        input=input_dir, output=output_dir, model=model_dir,
        start=0, batch_size=batch, segment_len=seg, jump=jump, threads=0,
        beam=beam, extension="fastq", concise=False, mode=mode,
        reverse_fast5=False, recursive=False, sig_norm=1, bf16=False,
        # None => the model's calibrated model.json default (pipeline.py)
        length_bonus=length_bonus,
    )


def _call(flags):
    from chiron_tpu.eval.pipeline import evaluation

    return evaluation(flags)


def measure_real_dna(work: str, beam: int) -> dict:
    """Identity of our basecalls vs the reference golden fastq (real signal)."""
    from chiron_tpu.tools.assess import assess_dir

    raw = os.path.join(REFERENCE_DNA, "output", "raw")
    golden = os.path.join(REFERENCE_DNA, "output", "result")
    if not (os.path.isdir(raw) and os.path.isdir(golden)):
        return {"skipped": "reference example data absent"}
    out = os.path.join(work, "real_dna")
    model_dir, kw = _slow_model()
    _call(_flags(raw, out, model_dir, beam=beam, **kw))
    report = assess_dir(os.path.join(out, "result"), golden)
    s = report["summary"]
    s["per_read_identity"] = {
        name: round(r["identity"], 4) for name, r in sorted(report["reads"].items())
    }
    s["model"] = os.path.basename(model_dir)
    return s


def _measure_synth(work: str, mode: str, beam: int, n_reads: int,
                   n_bases: int, cfg=None, axis: str = "",
                   model_dir: str = None, call_kw: dict = None,
                   oracle: bool = False, length_bonus=None,
                   oracle_reads: int = 0) -> dict:
    """Held-out simulated corpus -> basecall -> identity vs truth.

    ``oracle=True`` additionally decodes the SAME corpus with the exact-
    model Viterbi oracle (tools/oracle.py, VERDICT r4 #1) and attaches its
    summary under "oracle" — the measured Bayes-style ceiling every model
    number should be read against (CPU-only). ``oracle_reads`` caps the
    oracle to the first N reads of the corpus (simulate_corpus and
    measure_axis draw reads sequentially from RandomState(seed), so the
    capped set is a deterministic prefix of the same corpus) — the joint
    Viterbi is exact but minutes-per-read on a small host; each read is
    2-4k bases so a handful bounds the ceiling tightly."""
    from chiron_tpu.tools.assess import assess_dir
    from chiron_tpu.tools.simulate import KmerModel, SimConfig, simulate_corpus

    if model_dir is None:
        model_dir = MODEL_DNA if mode == "dna" else MODEL_RNA
    pore_path = os.path.join(model_dir, "pore_model.tsv")
    pore = KmerModel.load(pore_path) if os.path.exists(pore_path) else (
        KmerModel.synthetic()
    )
    seed = HOLDOUT_SEED_DNA if mode == "dna" else HOLDOUT_SEED_RNA
    if cfg is None:
        cfg = SimConfig() if mode == "dna" else SimConfig.rna()
    axis = axis or f"synth_{mode}"
    data = os.path.join(work, f"{axis}_data")
    truth = os.path.join(work, f"truth_{axis}.fasta")
    simulate_corpus(data, n_reads, n_bases, seed=seed, model=pore, cfg=cfg,
                    fasta=truth)
    out = os.path.join(work, f"{axis}_out")
    if call_kw is not None:
        flags = _flags(data, out, model_dir, mode=mode, beam=beam,
                       length_bonus=length_bonus, **call_kw)
    elif mode == "dna":
        flags = _flags(data, out, model_dir, mode="dna", beam=beam,
                       length_bonus=length_bonus)
    else:
        flags = _flags(data, out, model_dir, mode="rna", beam=beam,
                       batch=100, seg=2000, jump=1900,
                       length_bonus=length_bonus)
    _call(flags)
    report = assess_dir(os.path.join(out, "result"), truth)
    s = report["summary"]
    s["n_bases_per_read"] = n_bases
    s["pore_model"] = os.path.relpath(pore_path, REPO) if os.path.exists(
        pore_path) else "synthetic(seed=1234)"
    if oracle:
        from chiron_tpu.tools.oracle import measure_axis as oracle_axis

        n_or = min(n_reads, oracle_reads) if oracle_reads else n_reads
        orep = oracle_axis(n_or, n_bases, seed, pore, cfg,
                           workers=os.cpu_count() or 1)
        s["oracle"] = {k: round(v, 4) if isinstance(v, float) else v
                       for k, v in orep["summary"].items()}
    return s


def main(argv=None):
    p = argparse.ArgumentParser(description="Accuracy benchmark -> ACCURACY.json")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--beam", type=int, default=30,
                   help="beam width (0 = greedy)")
    p.add_argument("--quick", action="store_true",
                   help="small synthetic corpora (CI-scale)")
    p.add_argument("--length_bonus", type=float, default=None,
                   help="beam-decode per-label bonus; default None = each "
                        "model's calibrated model.json value (0.0 if unset)")
    p.add_argument("--oracle", action="store_true",
                   help="also decode each synthetic corpus with the exact-"
                        "model Viterbi oracle (tools/oracle.py) and attach "
                        "its ceiling under each axis's 'oracle' key")
    p.add_argument("--oracle_reads", type=int, default=0,
                   help="cap the oracle to the first N reads per axis "
                        "(deterministic corpus prefix); 0 = all")
    p.add_argument("--skip", default="",
                   help="comma list of axes to skip (real_dna,synthetic_dna,"
                        "synthetic_dna_slow,synthetic_rna) — the COMMITTED "
                        "ACCURACY.json must carry every axis")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    skip = set(filter(None, args.skip.split(",")))
    n_reads = 5 if args.quick else 20
    work = tempfile.mkdtemp(prefix="chiron_acc_")
    out = {"beam": args.beam}
    try:
        if "real_dna" not in skip:
            out["real_dna"] = measure_real_dna(work, args.beam)
            print(f"real_dna identity:       "
                  f"{out['real_dna'].get('identity', 0):.4f}")
        if "synthetic_dna" not in skip:
            out["synthetic_dna"] = _measure_synth(
                work, "dna", args.beam, n_reads, 1000 if args.quick else 4000,
                oracle=args.oracle, length_bonus=args.length_bonus,
                oracle_reads=args.oracle_reads)
            print(f"synthetic_dna identity:  "
                  f"{out['synthetic_dna']['identity']:.4f}")
        if "synthetic_dna_slow" not in skip:
            # real-signal translocation regime: the reference's example
            # reads run at 22-26 samples/base (vs the 9 of synthetic_dna)
            from chiron_tpu.tools.simulate import SimConfig

            slow_dir, slow_kw = _slow_model()
            out["synthetic_dna_slow"] = _measure_synth(
                work, "dna", args.beam, max(2, n_reads // 2),
                500 if args.quick else 2000,
                cfg=SimConfig(mean_dwell=24.0, max_dwell=140, noise_ar=0.7),
                axis="synth_dna_slow", model_dir=slow_dir, call_kw=slow_kw,
                oracle=args.oracle, length_bonus=args.length_bonus,
                oracle_reads=args.oracle_reads)
            out["synthetic_dna_slow"]["sim_config"] = (
                "mean_dwell=24 max_dwell=140 noise_ar=0.7")
            out["synthetic_dna_slow"]["model"] = os.path.basename(slow_dir)
            print(f"synthetic_dna_slow identity: "
                  f"{out['synthetic_dna_slow']['identity']:.4f}")
        if "synthetic_rna" not in skip:
            out["synthetic_rna"] = _measure_synth(
                work, "rna", args.beam, max(2, n_reads // 4),
                500 if args.quick else 2000, oracle=args.oracle,
                length_bonus=args.length_bonus,
                oracle_reads=args.oracle_reads)
            print(f"synthetic_rna identity:  "
                  f"{out['synthetic_rna']['identity']:.4f}")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    path = os.path.join(REPO, "ACCURACY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"Wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
