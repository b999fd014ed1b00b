import itertools

import jax.nn
import jax.numpy as jnp
import numpy as np

from chiron_tpu.config import BLANK
from chiron_tpu.ops.ctc_beam import beam_search_decode
from chiron_tpu.ops.ctc_greedy import greedy_decode


def _np_prefix_beam_search(log_probs, beam_width):
    """Reference CTC prefix beam search with dict-keyed prefixes.

    log_probs: [T, C] log-softmax values. Returns (best_prefix, log_prob).
    """
    nlab = log_probs.shape[1] - 1
    beams = {(): (0.0, -np.inf)}  # prefix -> (log p_blank, log p_nonblank)

    def lse(*xs):
        xs = [x for x in xs if x > -np.inf]
        if not xs:
            return -np.inf
        m = max(xs)
        return m + np.log(sum(np.exp(x - m) for x in xs))

    for t in range(log_probs.shape[0]):
        new = {}
        for prefix, (pb, pnb) in beams.items():
            # stay via blank
            npb, npnb = new.get(prefix, (-np.inf, -np.inf))
            npb = lse(npb, lse(pb, pnb) + log_probs[t, BLANK])
            # stay via repeat of last char
            if prefix:
                npnb = lse(npnb, pnb + log_probs[t, prefix[-1]])
            new[prefix] = (npb, npnb)
            # extend
            for c in range(nlab):
                ext = prefix + (c,)
                epb, epnb = new.get(ext, (-np.inf, -np.inf))
                base = pb if (prefix and c == prefix[-1]) else lse(pb, pnb)
                epnb = lse(epnb, log_probs[t, c] + base)
                new[ext] = (epb, epnb)
        # prune
        scored = sorted(
            new.items(), key=lambda kv: -lse(kv[1][0], kv[1][1])
        )[:beam_width]
        beams = dict(scored)
    best, (pb, pnb) = max(beams.items(), key=lambda kv: lse(kv[1][0], kv[1][1]))
    return list(best), lse(pb, pnb)


def test_beam_matches_numpy_reference():
    rng = np.random.RandomState(0)
    for trial in range(5):
        t = 8
        logits = rng.randn(1, t, 5).astype(np.float32) * 2
        dec, lens, lprob = beam_search_decode(
            jnp.asarray(logits), jnp.asarray([t]), beam_width=8
        )
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
        expected, expected_lp = _np_prefix_beam_search(lp, beam_width=8)
        n = int(lens[0])
        assert list(np.asarray(dec)[0, :n]) == expected, f"trial {trial}"
        np.testing.assert_allclose(float(lprob[0]), expected_lp, rtol=1e-3, atol=1e-3)


def test_beam_matches_exhaustive_map_label():
    # With a wide beam and tiny T, beam search must find the MAP label seq.
    rng = np.random.RandomState(1)
    t = 5
    logits = rng.randn(2, t, 5).astype(np.float32)
    dec, lens, _ = beam_search_decode(jnp.asarray(logits), jnp.asarray([t, t]), beam_width=64)
    for b in range(2):
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[b])))
        # exhaustive: sum path probs per collapsed label
        scores = {}
        for path in itertools.product(range(5), repeat=t):
            collapsed = []
            prev = None
            for s in path:
                if s != prev and s != BLANK:
                    collapsed.append(s)
                prev = s
            key = tuple(collapsed)
            val = sum(lp[i, s] for i, s in enumerate(path))
            m = scores.get(key, -np.inf)
            mx = max(m, val)
            scores[key] = mx + np.log(np.exp(m - mx) + np.exp(val - mx))
        best = max(scores.items(), key=lambda kv: kv[1])[0]
        n = int(lens[b])
        assert tuple(np.asarray(dec)[b, :n]) == best


def test_beam_peaky_logits_match_greedy():
    # With near-one-hot logits the beam result equals the greedy result.
    rng = np.random.RandomState(2)
    b, t = 3, 20
    classes = rng.randint(0, 5, size=(b, t))
    logits = np.full((b, t, 5), -20.0, np.float32)
    for i in range(b):
        for j in range(t):
            logits[i, j, classes[i, j]] = 20.0
    sl = jnp.asarray([t, t, 11])
    gdec, glens, _ = greedy_decode(jnp.asarray(logits), sl)
    bdec, blens, _ = beam_search_decode(jnp.asarray(logits), sl, beam_width=4)
    np.testing.assert_array_equal(np.asarray(glens), np.asarray(blens))
    np.testing.assert_array_equal(np.asarray(gdec), np.asarray(bdec))


def test_beam_seq_len_zero_and_batch():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 10, 5).astype(np.float32)
    sl = jnp.asarray([10, 5, 0, 10])
    dec, lens, lprob = beam_search_decode(jnp.asarray(logits), sl, beam_width=30)
    assert int(lens[2]) == 0
    assert np.all(np.asarray(dec)[2] == -1)
    assert float(lprob[2]) == 0.0  # empty sequence, p_blank = 1
    # batch independence: same row alone gives same answer
    dec1, lens1, _ = beam_search_decode(jnp.asarray(logits[:1]), sl[:1], beam_width=30)
    np.testing.assert_array_equal(np.asarray(dec)[0], np.asarray(dec1)[0])


def test_beam_repeat_semantics():
    # A label sequence with a genuine repeat (e.g. A A) requires a blank
    # between emissions; check the decoder can produce repeats.
    logits = np.full((1, 5, 5), -20.0, np.float32)
    logits[0, 0, 0] = 20.0  # A
    logits[0, 1, BLANK] = 20.0
    logits[0, 2, 0] = 20.0  # A again
    logits[0, 3, BLANK] = 20.0
    logits[0, 4, BLANK] = 20.0
    dec, lens, _ = beam_search_decode(jnp.asarray(logits), jnp.asarray([5]), beam_width=4)
    assert int(lens[0]) == 2
    np.testing.assert_array_equal(np.asarray(dec)[0, :2], [0, 0])
