import os

import numpy as np
import pytest

from chiron_tpu.io.fast5 import iter_fast5_reads, read_signal_fast5
from chiron_tpu.io.labels import base2ind, read_label, read_raw, read_raw_data_sets
from chiron_tpu.io.signal import (
    MEAN,
    MEDIAN,
    normalize_signal,
    read_signal,
    read_signal_for_eval,
    window_signal,
)

from synth import make_fast5_dir, make_training_dir


def test_window_signal_shapes_and_padding():
    sig = np.arange(1000, dtype=np.float32)
    windows, lengths = window_signal(sig, start_index=0, step=390, seg_length=400)
    assert windows.shape == (3, 400)
    np.testing.assert_array_equal(lengths, [400, 400, 220])
    np.testing.assert_array_equal(windows[0], sig[:400])
    np.testing.assert_array_equal(windows[2, :220], sig[780:])
    np.testing.assert_array_equal(windows[2, 220:], 0)


def test_window_signal_start_index():
    sig = np.arange(100, dtype=np.float32)
    windows, lengths = window_signal(sig, start_index=50, step=30, seg_length=40)
    assert windows.shape == (2, 40)
    np.testing.assert_array_equal(windows[0], np.r_[sig[50:90]])


def test_normalize_modes():
    rng = np.random.RandomState(0)
    sig = rng.randn(500).astype(np.float32) * 7 + 3
    m = normalize_signal(sig, MEAN)
    np.testing.assert_allclose(np.mean(m), 0, atol=1e-5)
    np.testing.assert_allclose(np.std(m), 1, atol=1e-4)
    md = normalize_signal(sig, MEDIAN)
    np.testing.assert_allclose(np.median(md), 0, atol=1e-5)


def test_signal_roundtrip(tmp_path):
    sig = np.asarray([1.5, 2.0, -3.25], np.float32)
    path = tmp_path / "x.signal"
    path.write_text("\n".join(str(v) for v in sig))
    out = read_signal(str(path))
    np.testing.assert_array_equal(out, sig)


def test_fast5_read_and_eval_windows(tmp_path):
    reads = make_fast5_dir(str(tmp_path), n_files=1, n_bases=100, seed=1)
    f5 = os.path.join(str(tmp_path), "synth0.fast5")
    sig = read_signal_fast5(f5)
    # int16 truncation happens at write; lengths must match
    assert len(sig) == len(reads[0][1])
    windows, lengths = read_signal_for_eval(f5, 0, step=300, seg_length=400)
    assert windows.shape[1] == 400
    # RNA mode must feed the reversed signal: first reversed window ==
    # reverse of the signal tail
    wr, wl = read_signal_for_eval(f5, 0, step=300, seg_length=400, reverse_fast5=True)
    n0 = int(wl[0])
    np.testing.assert_array_equal(wr[0][:n0], sig[::-1][:n0])


def test_iter_fast5_reads(tmp_path):
    make_fast5_dir(str(tmp_path), n_files=1, n_bases=80, seed=2)
    f5 = os.path.join(str(tmp_path), "synth0.fast5")
    items = list(iter_fast5_reads(f5))
    assert len(items) == 1
    suffix, signal, ref, read_id = items[0]
    assert suffix == "" and read_id == "read0" and len(signal) > 0


def test_base2ind():
    assert [base2ind(b) for b in "ACGT"] == [0, 1, 2, 3]
    assert [base2ind(b) for b in "acgt"] == [0, 1, 2, 3]
    assert base2ind("X", alphabet_n=5) == 4


def test_read_label_and_read_raw(tmp_path):
    make_training_dir(str(tmp_path), n_files=1, n_bases=120, seed=3)
    labels = read_label(os.path.join(str(tmp_path), "read0.label"), skip_start=10)
    assert len(labels.start) == 120 - 20  # 10 skipped each side
    sig = read_signal(os.path.join(str(tmp_path), "read0.signal"))
    ev, evl, lb, lbl = read_raw(sig, labels, 300)
    assert len(ev) > 0
    assert all(len(e) == 300 for e in ev)
    assert all(l > 2 for l in lbl)
    # labels are valid base indices
    assert all(0 <= x <= 3 for lab in lb for x in lab)


def test_read_raw_data_sets(tmp_path):
    make_training_dir(str(tmp_path), n_files=2, n_bases=150, seed=4)
    events, event_lens, labels, label_lens = read_raw_data_sets(
        str(tmp_path), seq_length=300
    )
    assert events.shape[0] == len(event_lens) == len(labels) == len(label_lens)
    assert events.shape[1] == 300
    assert events.shape[0] > 0
    # signal correlates with labels through the synthetic base->level map
    i = 0
    lab = labels[i][: label_lens[i]]
    assert np.all(lab >= 0)


def test_label_correlation_with_signal(tmp_path):
    # The synthetic mapping A<C<G<T in signal level must survive windowing:
    # mean window signal correlates with mean label index.
    make_training_dir(str(tmp_path), n_files=2, n_bases=300, seed=5)
    events, event_lens, labels, label_lens = read_raw_data_sets(
        str(tmp_path), seq_length=200
    )
    means = np.array([
        events[i][: event_lens[i]].mean() for i in range(len(events))
    ])
    lab_means = np.array([
        labels[i][: label_lens[i]].mean() for i in range(len(events))
    ])
    corr = np.corrcoef(means, lab_means)[0, 1]
    assert corr > 0.9


def test_parse_signal_text_native_matches_numpy():
    """Native parser parity with the Python split path on edge cases."""
    import numpy as np

    from chiron_tpu.io import signal as S

    cases = [
        b"565 446 462 455",
        b"  -3 +7\n12\t0  ",
        b"1.5 -2.25e1 3e-2 100",
        b"",
        b"   ",
        b"7",
        (" ".join(str(v) for v in range(-500, 500))).encode(),
    ]
    lib = S._load_parse_lib()
    assert lib is not None, "native parser should build in this environment"
    for raw in cases:
        got = S.parse_signal_text(raw)
        vals = raw.split()
        want = (
            np.asarray(vals, dtype=np.float32)
            if vals else np.zeros(0, np.float32)
        )
        np.testing.assert_array_equal(got, want, err_msg=repr(raw))


def test_get_label_segment_annotations(tmp_path):
    """Basecall segments get centered 5-mers, moves, corrected bounds."""
    import numpy as np

    from chiron_tpu.io.labels import get_label_segment
    from tests.synth import synth_read, write_fast5

    rng = np.random.RandomState(0)
    seq, starts, lengths, signal = synth_read(rng, n_bases=30)
    path = str(tmp_path / "r.fast5")
    write_fast5(path, signal, starts, lengths, seq, basecall_events=True)
    seg, first, last, total = get_label_segment(
        path, "Basecall_1D_000", "BaseCalled_template",
        corrected_group="Corrected_000",
    )
    assert total >= 30 and 0 < len(seg) <= total
    # every annotated segment's 5-mer is centered on the covering event
    for row in seg:
        s = int(row["start"])
        # find the corrected (= truth) event covering this start
        i = int(np.searchsorted(starts, s, side="right")) - 1
        assert 2 <= i <= len(seq) - 3
        assert row["kmer"].decode() == seq[i - 2:i + 3]
        assert int(row["cstart"]) == starts[i]
        assert int(row["clength"]) == lengths[i]
    # move == 1 exactly at the first segment of each corrected event
    cstarts = seg["cstart"]
    expect_move = np.r_[1, (cstarts[1:] != cstarts[:-1]).astype(np.uint32)]
    np.testing.assert_array_equal(seg["move"], expect_move)
    # split events (every 3rd) produce continuation segments with move 0
    assert (seg["move"] == 0).any()
