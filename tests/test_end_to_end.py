"""The full semantic loop: train on synthetic pairs, basecall synthetic
fast5s, and check the assembled reads match the ground-truth sequences.

This is the framework's answer to the reference's only self-test
(test_chiron_dummy_input, chiron/chiron_input.py:732-817) — but stronger:
it validates learning + decoding + assembly, not just the input pipeline.
"""

import json
import os
import types

import numpy as np
import pytest

from synth import make_fast5_dir, make_training_dir


def _cfg_path(tmp_path):
    cfg = {
        "cnn": {"model": "custom"},
        "rnn": {"layer_num": 2, "hidden_num": 48, "cell_type": "LSTM",
                "layer_type": "normal"},
        "opt_method": "Adam",
        "fl_gamma": 0,
    }
    path = os.path.join(str(tmp_path), "cfg.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


@pytest.mark.slow
def test_train_then_basecall_recovers_sequence(tmp_path):
    from chiron_tpu.eval import pipeline
    from chiron_tpu.train import loop
    from chiron_tpu.train.loop import edit_distance

    train_dir = os.path.join(str(tmp_path), "train")
    make_training_dir(train_dir, n_files=4, n_bases=500, seed=0, noise=2.0)
    h = types.SimpleNamespace(
        data_dir=train_dir,
        log_dir=os.path.join(str(tmp_path), "log"),
        model_name="m",
        validation=None,
        sequence_len=100,
        batch_size=64,
        step_rate=1e-2,
        max_steps=600,
        segments_num=None,
        configure=_cfg_path(tmp_path),
        k_mer=1,
        retrain=False,
        resample_after_epoch=0,
        offset_increment=3,
        n_devices=1,
        save_every=100,
        sig_norm=1,  # MEAN normalization
    )
    result = loop.train(h)
    assert result["losses"][-1] < result["losses"][0] * 0.5

    f5dir = os.path.join(str(tmp_path), "call_fast5")
    reads = make_fast5_dir(f5dir, n_files=2, n_bases=300, seed=99, noise=2.0)
    out = os.path.join(str(tmp_path), "out")
    flags = types.SimpleNamespace(
        input=f5dir, output=out, model=result["model_dir"],
        start=0, batch_size=32, segment_len=100, jump=95, threads=0,
        beam=0, extension="fastq", concise=False, mode="dna",
        reverse_fast5=False, recursive=True, sig_norm=1,
    )
    pipeline.run(flags)
    errors = []
    for i, (true_seq, _) in enumerate(reads):
        called = (
            open(os.path.join(out, "result", f"synth{i}.fastq"))
            .read()
            .splitlines()[1]
        )
        d = edit_distance([ord(c) for c in called], [ord(c) for c in true_seq])
        errors.append(d / len(true_seq))
    # loosely trained tiny model: demand the reads are clearly recovered
    assert np.mean(errors) < 0.5, errors
