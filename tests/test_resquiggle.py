import os

import numpy as np
import pytest

from synth import BASE_SIGNAL, synth_read, write_fast5

from chiron_tpu.tools.resquiggle import (
    PoreModel,
    events_from_starts,
    native_available,
    resquiggle_signal,
    write_corrected_events,
    znorm,
)


def _boundary_error(starts, true_starts):
    n = min(len(starts) - 1, len(true_starts))
    return np.mean(np.abs(np.asarray(starts[:n]) - np.asarray(true_starts[:n])))


def test_native_library_builds():
    assert native_available(), "C++ DTW library failed to build/load"


def test_resquiggle_recovers_boundaries():
    rng = np.random.RandomState(0)
    seq, true_starts, lengths, signal = synth_read(rng, n_bases=150, noise=3.0)
    starts = resquiggle_signal(signal, seq, radius=40)
    assert starts[0] == 0 and starts[-1] == len(signal)
    assert np.all(np.diff(starts) >= 0)
    # mean boundary placement error well below one dwell (~10 samples)
    err = _boundary_error(starts, true_starts)
    assert err < 5.0, err


def test_resquiggle_long_read():
    rng = np.random.RandomState(1)
    seq, true_starts, lengths, signal = synth_read(rng, n_bases=800, noise=3.0)
    starts = resquiggle_signal(signal, seq, radius=50)
    err = _boundary_error(starts, true_starts)
    assert err < 6.0, err


def test_viterbi_segment_recovers_boundaries():
    from chiron_tpu.tools.resquiggle import viterbi_segment

    rng = np.random.RandomState(2)
    seq, true_starts, lengths, signal = synth_read(rng, n_bases=150, noise=3.0)
    starts = viterbi_segment(signal, seq, band=400)
    assert starts[0] == 0 and starts[-1] == len(signal)
    # the dwell prior forbids zero-dwell bases entirely
    assert np.all(np.diff(starts) >= 1)
    err = _boundary_error(starts, true_starts)
    assert err < 6.0, err


def test_resquiggle_events_recovers_boundaries():
    from chiron_tpu.tools.resquiggle import resquiggle_events

    rng = np.random.RandomState(3)
    seq, true_starts, lengths, signal = synth_read(rng, n_bases=150, noise=3.0)
    starts = resquiggle_events(signal, seq, radius=60)
    assert starts[0] == 0 and starts[-1] == len(signal)
    assert np.all(np.diff(starts) >= 0)
    err = _boundary_error(starts, true_starts)
    assert err < 6.0, err


def test_events_from_starts():
    starts = np.asarray([0, 5, 12, 20])
    rows = events_from_starts(starts, "ACG")
    assert rows == [(0, 5, "A"), (5, 7, "C"), (12, 8, "G")]


def test_pore_model_tsv_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "pm.tsv")
    with open(path, "w") as f:
        f.write("kmer\tlevel_mean\tlevel_stdv\n")
        f.write("AAA\t80.0\t2.0\nAAC\t90.0\t2.0\n")
    pm = PoreModel.load(path)
    assert pm.k == 3
    assert pm.levels["AAA"] == 80.0
    sig = pm.expected_signal("AAAC")
    assert sig.shape == (4,)


def test_write_corrected_events_roundtrip(tmp_path):
    import h5py

    rng = np.random.RandomState(2)
    seq, true_starts, lengths, signal = synth_read(rng, n_bases=60, noise=2.0)
    path = os.path.join(str(tmp_path), "x.fast5")
    write_fast5(path, signal)
    starts = resquiggle_signal(signal, seq, radius=30)
    write_corrected_events(path, starts, seq)
    # the label extraction pipeline must be able to read it back
    from chiron_tpu.io.labels import get_label_raw

    (raw, label, ev_starts, ev_lens), _ = get_label_raw(
        path, "Corrected_000", "BaseCalled_template"
    )
    assert len(label) == len(seq)
    assert label["base"][0].decode() == seq[0]


def test_python_fallback_matches_native():
    if not native_available():
        pytest.skip("native lib unavailable")
    import chiron_tpu.tools.resquiggle as rs

    rng = np.random.RandomState(3)
    seq, true_starts, lengths, signal = synth_read(rng, n_bases=80, noise=2.0)
    native_starts = resquiggle_signal(signal, seq, radius=30)
    lib, rs._lib = rs._lib, None
    orig = rs._load_native
    rs._load_native = lambda: None
    try:
        py_starts = resquiggle_signal(signal, seq, radius=30)
    finally:
        rs._load_native = orig
        rs._lib = lib
    # both implement the same algorithm; boundaries must agree closely
    assert np.mean(np.abs(native_starts - py_starts)) < 2.0
