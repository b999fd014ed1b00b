"""Benchmark: full basecall pipeline on the bundled 5 example DNA reads.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is end-to-end consensus bases per second (reading +
forward + CTC beam-search decode (width 30) + assembly + writing) on a warm
pipeline — directly comparable to the reference's GPU beam-search rate of
1204 bp/s (README.md:146-149, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import types

EXAMPLE_DATA = "/root/reference/chiron/example_data/DNA"
BASELINE_BPS = 1204.0  # reference GPU beam-search rate


def make_flags(input_dir, output_dir, model_dir, beam=30):
    return types.SimpleNamespace(
        input=input_dir,
        output=output_dir,
        model=model_dir,
        start=0,
        batch_size=400,
        segment_len=400,
        jump=390,
        threads=0,
        beam=beam,
        extension="fastq",
        concise=False,
        mode="dna",
        reverse_fast5=False,
        recursive=True,
    )


def main():
    from chiron_tpu.config import default_config, save_config
    from chiron_tpu.eval.pipeline import evaluation

    work = tempfile.mkdtemp(prefix="chiron_bench_")
    model_dir = os.path.join(work, "model")
    os.makedirs(model_dir)
    save_config(os.path.join(model_dir, "model.json"), default_config())

    # input: the golden .signal extractions if present, else the fast5s
    raw_dir = os.path.join(EXAMPLE_DATA, "output", "raw")
    input_dir = raw_dir if os.path.isdir(raw_dir) else EXAMPLE_DATA

    # warm-up run (compile)
    flags = make_flags(input_dir, os.path.join(work, "warm"), model_dir)
    evaluation(flags)

    # measured run
    flags = make_flags(input_dir, os.path.join(work, "run"), model_dir)
    t0 = time.time()
    result = evaluation(flags)
    elapsed = time.time() - t0

    bases = result["total_bases"]
    bps = bases / elapsed
    out = {
        "metric": "basecall_bases_per_second_beam30",
        "value": round(bps, 1),
        "unit": "bp/s",
        "vs_baseline": round(bps / BASELINE_BPS, 2),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
