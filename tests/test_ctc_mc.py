"""Experimental decoders: Monte-Carlo, exact enumeration, sections.

Reference parity: chiron/utils/easy_assembler.py:69-206.
"""

import numpy as np

from chiron_tpu.ops.ctc_mc import best_path_decode, mc_decode, section_decoding


def _logits_for(labels, t_per=2, strength=8.0, c=5):
    """Near-deterministic logits spelling out ``labels`` (blank-separated)."""
    frames = []
    for lab in labels:
        frames.extend([lab] * t_per)
        frames.append(c - 1)  # blank separator
    logits = np.full((len(frames), c), -strength, np.float32)
    for j, lab in enumerate(frames):
        logits[j, lab] = strength
    return logits


def test_mc_decode_recovers_clear_sequence():
    labels = [0, 2, 1, 3, 2]
    logits = _logits_for(labels, strength=10.0)
    strings, scores = mc_decode(logits, None, sample_n=64)
    assert strings == ["ACGT"[i] for i in [0]] * 0 + ["".join("ACGT"[i] for i in labels)]
    assert scores[0] > 0


def test_mc_decode_batch_and_lengths():
    l1 = _logits_for([1, 0], strength=10.0)
    l2 = _logits_for([3, 3, 2], strength=10.0)
    t = max(len(l1), len(l2))
    batch = np.full((2, t, 5), 0.0, np.float32)
    batch[0, : len(l1)] = l1
    batch[1, : len(l2)] = l2
    strings, _ = mc_decode(batch, np.asarray([len(l1), len(l2)]), sample_n=64)
    assert strings[0] == "CA"
    assert strings[1] == "TTG"


def _best_path_bruteforce(logits, alphabet="ACGT"):
    """Clear (slow) reference: enumerate paths with itertools."""
    import itertools

    t, c = logits.shape
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    mass = {}
    for path in itertools.product(range(c), repeat=t):
        p = 1.0
        for j, k in enumerate(path):
            p *= probs[j, k]
        # collapse
        out = []
        prev = -1
        for k in path:
            if k != prev and k != c - 1:
                out.append(k)
            prev = k
        s = "".join(alphabet[k] for k in out)
        mass[s] = mass.get(s, 0.0) + p
    return max(mass.items(), key=lambda kv: kv[1])[0]


def test_best_path_matches_bruteforce():
    rng = np.random.RandomState(0)
    for _ in range(3):
        logits = rng.randn(5, 5).astype(np.float32) * 2
        assert best_path_decode(logits) == _best_path_bruteforce(logits)


def test_best_path_guard():
    import pytest

    with pytest.raises(ValueError):
        best_path_decode(np.zeros((20, 5), np.float32))


def test_section_decoding_joins_sections():
    # two clear sections separated by a confident blank run
    sec1 = _logits_for([0, 1], t_per=2, strength=10.0)
    blanks = np.full((4, 5), -10.0, np.float32)
    blanks[:, 4] = 10.0
    sec2 = _logits_for([3], t_per=2, strength=10.0)
    logits = np.concatenate([sec1, blanks, sec2], axis=0)[None]
    out = section_decoding(logits, sample_n=64)
    assert out == ["ACT"]


def test_section_decoding_all_blank():
    logits = np.full((1, 6, 5), -10.0, np.float32)
    logits[:, :, 4] = 10.0
    assert section_decoding(logits, sample_n=16) == [""]
