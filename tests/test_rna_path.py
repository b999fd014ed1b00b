import json
import os
import types

import numpy as np

from synth import make_fast5_dir


def _rna_model_dir(path):
    os.makedirs(path, exist_ok=True)
    json.dump(
        {
            "cnn": {"model": "rna_model3"},
            "rnn": {"layer_num": 1, "hidden_num": 8, "cell_type": "LSTM",
                    "layer_type": "rna"},
            "opt_method": "Adam",
            "fl_gamma": 0,
        },
        open(os.path.join(path, "model.json"), "w"),
    )


def test_rna_pipeline_end_to_end(tmp_path):
    from chiron_tpu.eval import pipeline

    f5dir = os.path.join(str(tmp_path), "fast5")
    make_fast5_dir(f5dir, n_files=1, n_bases=200, seed=0)
    model = os.path.join(str(tmp_path), "model")
    _rna_model_dir(model)
    flags = types.SimpleNamespace(
        input=f5dir, output=os.path.join(str(tmp_path), "out"), model=model,
        start=0, batch_size=4, segment_len=700, jump=665, threads=0, beam=0,
        extension="fastq", concise=False, mode="rna", reverse_fast5=True,
        recursive=True,
    )
    result = pipeline.run(flags)
    assert result["n_files"] == 1
    fq = open(os.path.join(flags.output, "result", "synth0.fastq")).read()
    lines = fq.splitlines()
    # RNA mode writes U instead of T (chiron_eval.py:204-205 parity)
    assert "T" not in lines[1]
    assert set(lines[1]) <= set("ACGU")


def test_rna_window_reversal_reaches_model(tmp_path):
    # reverse_fast5 must flip the signal before windowing
    from chiron_tpu.io.signal import read_signal_for_eval
    from chiron_tpu.io.fast5 import read_signal_fast5

    f5dir = os.path.join(str(tmp_path), "fast5")
    make_fast5_dir(f5dir, n_files=1, n_bases=100, seed=1)
    f5 = os.path.join(f5dir, "synth0.fast5")
    sig = read_signal_fast5(f5)
    w, wl = read_signal_for_eval(f5, 0, step=100, seg_length=120,
                                 reverse_fast5=True)
    np.testing.assert_array_equal(w[0][: wl[0]], sig[::-1][: wl[0]])
