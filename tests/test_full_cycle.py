"""The complete user journey through the real CLI surface:

  resquiggled fast5 --export--> .signal/.label --train--> model
  raw fast5 --call--> fastq (with the freshly trained model)

This is the reference's documented workflow (README: export -> train ->
call) exercised end-to-end in one hermetic test.
"""

import json
import os

import numpy as np

from synth import make_fast5_dir, synth_read, write_fast5


def test_export_train_call_cycle(tmp_path):
    from chiron_tpu import cli

    base = str(tmp_path)
    rng = np.random.RandomState(3)

    # 1. resquiggled fast5s (with Corrected_000 events)
    f5_train = os.path.join(base, "fast5_train")
    os.makedirs(f5_train)
    for i in range(3):
        seq, starts, lengths, signal = synth_read(rng, 300, noise=2.0)
        write_fast5(os.path.join(f5_train, f"t{i}.fast5"), signal, starts,
                    lengths, seq, read_id=f"t{i}")

    # 2. chiron export -> .signal/.label batch folders
    train_dir = os.path.join(base, "train_pairs")
    cli.main([
        "export", "-i", f5_train, "-o", train_dir,
        "--basecall_group", "Corrected_000", "-f", "train.tfrecords",
    ])
    batch1 = os.path.join(train_dir, "1")
    assert any(f.endswith(".signal") for f in os.listdir(batch1))
    assert any(f.endswith(".label") for f in os.listdir(batch1))
    # --tffile side output loads back as a training set
    from chiron_tpu.io.tfrecord import read_tfrecord_pairs

    tf_reads = list(read_tfrecord_pairs(os.path.join(train_dir, "train.tfrecords")))
    assert len(tf_reads) == 3 and all(len(r[2]) > 0 for r in tf_reads)

    # 3. chiron train (tiny model, few steps)
    cfg_path = os.path.join(base, "cfg.json")
    json.dump(
        {"cnn": {"model": "custom"},
         "rnn": {"layer_num": 1, "hidden_num": 16, "cell_type": "LSTM",
                 "layer_type": "normal"},
         "opt_method": "Adam", "fl_gamma": 0},
        open(cfg_path, "w"),
    )
    log_dir = os.path.join(base, "log")
    cli.main([
        "train", "-i", train_dir, "-o", log_dir, "-m", "cycle_model",
        "-s", "200", "-b", "8", "-x", "15", "--configure", cfg_path,
    ])
    model_dir = os.path.join(log_dir, "cycle_model")
    assert os.path.exists(os.path.join(model_dir, "checkpoint"))
    assert os.path.exists(os.path.join(model_dir, "metrics.jsonl"))

    # 4. chiron call with the trained model on fresh raw fast5s
    f5_call = os.path.join(base, "fast5_call")
    make_fast5_dir(f5_call, n_files=2, n_bases=80, seed=9)
    out = os.path.join(base, "out")
    cli.main([
        "call", "-i", f5_call, "-o", out, "-m", model_dir,
        "-b", "8", "-l", "100", "-j", "95", "--beam", "3",
    ])
    fastqs = sorted(os.listdir(os.path.join(out, "result")))
    assert fastqs == ["synth0.fastq", "synth1.fastq"]
    for f in fastqs:
        lines = open(os.path.join(out, "result", f)).read().splitlines()
        assert lines[0].startswith("@")
        assert set(lines[1]) <= set("ACGT")
