"""Oracle decoder tests (tools/oracle.py).

The oracle is the measured accuracy ceiling for the synthetic axes
(VERDICT r4 #1); these tests pin its correctness on regimes where the
answer is known: near-noiseless reads must decode ~perfectly, each
generative nuisance (drift, AR noise, slow dwell) must be decoded through,
and the decoded skill must sit far above the trained-model floors.
"""

import numpy as np
import pytest

from chiron_tpu.tools.assess import assess_read
from chiron_tpu.tools.oracle import (
    _pred_table,
    codes_to_seq,
    oracle_decode_read,
    viterbi_drift_decode,
)
from chiron_tpu.tools.simulate import KmerModel, SimConfig, simulate_read


@pytest.fixture(scope="module")
def kmodel():
    return KmerModel.synthetic()


def test_pred_table_inverts_advance(kmodel):
    k = kmodel.k
    pred = _pred_table(k)
    rng = np.random.RandomState(0)
    for c in rng.randint(0, 4 ** k, 20):
        b = c % 4
        for a in range(4):
            p = pred[a, c]
            # advancing p by base b must give back c
            assert (p % 4 ** (k - 1)) * 4 + b == c


def test_codes_to_seq_roundtrip(kmodel):
    k = kmodel.k
    seq = "ACGTACGGTTAC"
    ids = np.array([{"A": 0, "C": 1, "G": 2, "T": 3}[b] for b in seq])
    codes = kmodel.kmer_codes(ids)
    # interior windows advance one base at a time; drop the clamped edges
    half = (k - 1) // 2
    interior = codes[half: len(seq) - (k - 1 - half)]
    out = codes_to_seq(np.asarray(interior), k)
    assert out == seq


def test_near_noiseless_exact(kmodel):
    cfg = SimConfig(mean_dwell=9.0, noise=0.05, drift_walk=0.0,
                    drift_sine_amp=0.0, scale_jitter=0.0, offset_jitter=0.0)
    rng = np.random.RandomState(3)
    seq, _st, _dw, sig = simulate_read(rng, kmodel, 150, cfg)
    y = (sig - cfg.level_offset) / cfg.level_scale
    codes, starts, dpath = viterbi_drift_decode(
        y.astype(np.float64), kmodel, cfg)
    called = codes_to_seq(codes, kmodel.k)
    r = assess_read(called, seq)
    assert r["identity"] >= 0.99
    assert len(starts) == len(codes)
    assert dpath.shape == (len(y),)


def test_decodes_through_drift(kmodel):
    # default drift (walk + sine) + affine jitter, moderate noise: the
    # joint drift-state decode must stay close to the exact-latent ceiling
    cfg = SimConfig(mean_dwell=9.0, noise=0.5)
    rng = np.random.RandomState(5)
    seq, _st, _dw, sig = simulate_read(rng, kmodel, 250, cfg)
    called = oracle_decode_read(sig, kmodel, cfg, refine=1)
    r = assess_read(called, seq)
    assert r["identity"] >= 0.90, r


def test_decodes_through_ar_noise(kmodel):
    # slow-translocation regime with AR(1) noise (the synthetic_dna_slow
    # generative family, accuracy.py:198)
    cfg = SimConfig(mean_dwell=18.0, max_dwell=110, noise=1.0, noise_ar=0.7)
    rng = np.random.RandomState(9)
    seq, _st, _dw, sig = simulate_read(rng, kmodel, 150, cfg)
    called = oracle_decode_read(sig, kmodel, cfg, refine=1)
    r = assess_read(called, seq)
    # well above the committed slow-model skill (identity 0.73); one short
    # read of the noisier k=6 synthetic table => wide floor
    assert r["identity"] >= 0.80, r


def test_oracle_beats_model_floor_fast_axis():
    """On the REAL fast-axis generative family (bundled pore table,
    default SimConfig) the oracle must clear the model smoke floors by a
    wide margin — it is the ceiling those floors live under."""
    import os

    pore = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "chiron_tpu", "model", "DNA_default",
        "pore_model.tsv")
    model = KmerModel.load(pore)
    cfg = SimConfig()
    rng = np.random.RandomState(991)
    seq, _st, _dw, sig = simulate_read(rng, model, 400, cfg)
    called = oracle_decode_read(sig, model, cfg, refine=1)
    r = assess_read(called, seq)
    assert r["identity"] >= 0.82, r
    assert r["kmer11_hit_rate"] >= 0.30, r
