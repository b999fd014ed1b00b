"""Simulator + pore-model estimation (tools/simulate.py, tools/pore_estimate.py)."""

import numpy as np
import pytest

from chiron_tpu.tools.pore_estimate import (
    detect_events,
    estimate_kmer_model,
    final_alignments,
)
from chiron_tpu.tools.simulate import (
    KmerModel,
    SimConfig,
    seq_to_ids,
    simulate_corpus,
    simulate_read,
)


def test_kmer_model_synthetic_deterministic():
    a = KmerModel.synthetic(k=4, seed=3)
    b = KmerModel.synthetic(k=4, seed=3)
    np.testing.assert_array_equal(a.means, b.means)
    assert a.means.shape == (256,)
    assert abs(float(a.means.mean())) < 1e-5
    assert abs(float(a.means.std()) - 1.0) < 1e-5


def test_kmer_model_save_load_roundtrip(tmp_path):
    m = KmerModel.synthetic(k=3, seed=1)
    path = str(tmp_path / "model.tsv")
    m.save(path)
    m2 = KmerModel.load(path)
    assert m2.k == 3
    np.testing.assert_allclose(m.means, m2.means, atol=1e-5)
    np.testing.assert_allclose(m.stdvs, m2.stdvs, atol=1e-5)


def test_kmer_codes_centered():
    m = KmerModel.synthetic(k=3, seed=0)
    ids = seq_to_ids("ACGTA")
    codes = m.kmer_codes(ids)
    # center convention: code for position 1 is the ACG window
    assert codes[1] == 0 * 16 + 1 * 4 + 2
    assert codes[2] == 1 * 16 + 2 * 4 + 3
    assert len(codes) == 5


def test_simulate_read_consistency():
    m = KmerModel.synthetic(k=5, seed=2)
    rng = np.random.RandomState(0)
    seq, starts, lengths, signal = simulate_read(rng, m, n_bases=300)
    assert len(seq) == len(starts) == len(lengths) == 300
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], np.cumsum(lengths)[:-1])
    assert len(signal) == int(lengths.sum()) + 8
    # per-base mean signal correlates with the model's levels
    levels = m.per_base(seq_to_ids(seq))[0]
    seg_means = np.add.reduceat(signal[:-8].astype(np.float64), starts) / lengths
    corr = np.corrcoef(levels, seg_means)[0, 1]
    assert corr > 0.9


def test_simulate_corpus_trains_layout(tmp_path):
    from chiron_tpu.io.labels import read_raw_data_sets

    out = str(tmp_path / "sim")
    simulate_corpus(out, n_reads=3, n_bases=150, seed=1,
                    fasta=str(tmp_path / "truth.fasta"))
    events, evl, labels, lbl = read_raw_data_sets(out, seq_length=200, sig_norm=1)
    assert len(events) > 0
    assert (tmp_path / "truth.fasta").read_text().count(">") == 3


def test_detect_events_clean_steps():
    rng = np.random.RandomState(0)
    levels = np.repeat([0.0, 3.0, -2.0, 1.5], 20)
    sig = levels + rng.randn(len(levels)) * 0.05
    starts, means = detect_events(sig, w=3, min_len=2)
    # the three true boundaries (20, 40, 60) are all found within 2 samples
    for b in (20, 40, 60):
        assert np.min(np.abs(starts - b)) <= 2
    assert starts[0] == 0 and starts[-1] == len(sig)


def test_estimate_kmer_model_recovers_structure():
    # k=5 matches real usage; shorter contexts are much less identifiable
    # (the per-base level trace is too self-similar for the bootstrap DTW)
    true = KmerModel.synthetic(k=5, seed=7)
    rng = np.random.RandomState(5)
    pairs, truth = [], []
    for _ in range(6):
        seq, st, ln, sig = simulate_read(rng, true, n_bases=1500)
        pairs.append((sig, seq))
        truth.append(st)
    est = estimate_kmer_model(pairs, k=5, iters=2)
    corr = np.corrcoef(true.means, est.means)[0, 1]
    assert corr > 0.45, f"estimated model corr {corr:.3f}"
    # alignments land within ~a dwell of the truth for most bases
    als = final_alignments(pairs, est)
    errs = np.concatenate([
        al[:-1].astype(int) - st for al, st in zip(als, truth)
    ])
    assert np.median(np.abs(errs)) <= 6


def test_rna_sim_config_longer_dwell():
    m = KmerModel.synthetic(k=5, seed=2)
    rng = np.random.RandomState(0)
    _, _, dl_dna, _ = simulate_read(rng, m, n_bases=200, cfg=SimConfig())
    _, _, dl_rna, _ = simulate_read(rng, m, n_bases=200, cfg=SimConfig.rna())
    assert dl_rna.mean() > 2.5 * dl_dna.mean()
