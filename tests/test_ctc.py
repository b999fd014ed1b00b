import itertools

import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu.config import BLANK
from chiron_tpu.ops.ctc_greedy import greedy_decode
from chiron_tpu.ops.ctc_loss import ctc_focal_loss, ctc_loss


def _brute_force_ctc_nll(log_probs, label):
    """Sum probability over ALL alignments by enumeration. log_probs: [T, C]."""
    t, c = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(c), repeat=t):
        # collapse: merge repeats then drop blanks
        collapsed = []
        prev = None
        for s in path:
            if s != prev:
                collapsed.append(s)
            prev = s
        collapsed = [s for s in collapsed if s != BLANK]
        if collapsed == list(label):
            lp = sum(log_probs[i, s] for i, s in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def test_ctc_loss_matches_brute_force():
    rng = np.random.RandomState(0)
    t, c = 5, 5
    logits = rng.randn(3, t, c).astype(np.float32)
    labels = np.array([[0, 1, 0], [2, 2, 0], [3, 0, 0]], dtype=np.int32)
    label_lengths = np.array([3, 2, 1], dtype=np.int32)
    logit_lengths = np.array([5, 5, 4], dtype=np.int32)

    loss = np.asarray(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lengths),
            jnp.asarray(labels),
            jnp.asarray(label_lengths),
        )
    )
    for i in range(3):
        lp = jax.nn.log_softmax(jnp.asarray(logits[i, : logit_lengths[i]]))
        expected = _brute_force_ctc_nll(
            np.asarray(lp), labels[i, : label_lengths[i]]
        )
        np.testing.assert_allclose(loss[i], expected, rtol=1e-4)


def test_ctc_loss_ignores_too_long_labels():
    logits = jnp.zeros((1, 3, 5))
    labels = jnp.asarray([[0, 1, 2, 3]])
    loss = ctc_loss(logits, jnp.asarray([3]), labels, jnp.asarray([4]))
    assert float(loss[0]) == 0.0
    grad = jax.grad(
        lambda lg: jnp.sum(ctc_loss(lg, jnp.asarray([3]), labels, jnp.asarray([4])))
    )(logits)
    np.testing.assert_array_equal(np.asarray(grad), 0.0)


def test_ctc_loss_gradient_is_finite():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 8, 5), jnp.float32)
    labels = jnp.asarray([[0, 1, 2], [3, 3, 0]])
    fn = lambda lg: ctc_focal_loss(
        lg, jnp.asarray([8, 6]), labels, jnp.asarray([3, 2]), fl_gamma=2.0
    )
    g = jax.grad(fn)(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_focal_modulation():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 6, 5), jnp.float32)
    labels = jnp.asarray([[0, 1], [2, 3]])
    ll = jnp.asarray([6, 6])
    yl = jnp.asarray([2, 2])
    base = np.asarray(ctc_loss(logits, ll, labels, yl))
    focal = float(ctc_focal_loss(logits, ll, labels, yl, fl_gamma=2.0))
    expected = np.mean((1 - np.exp(-base)) ** 2 * base)
    np.testing.assert_allclose(focal, expected, rtol=1e-5)


def _np_greedy(classes, length):
    out = []
    prev = None
    for t in range(length):
        s = classes[t]
        if s != prev and s != BLANK:
            out.append(s)
        prev = s
    return out


def test_greedy_decode_matches_numpy():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 12, 5).astype(np.float32)
    seq_lengths = np.array([12, 7, 1, 0], dtype=np.int32)
    decoded, lengths, _ = greedy_decode(jnp.asarray(logits), jnp.asarray(seq_lengths))
    decoded = np.asarray(decoded)
    lengths = np.asarray(lengths)
    classes = np.argmax(logits, axis=-1)
    for i in range(4):
        expected = _np_greedy(classes[i], seq_lengths[i])
        assert lengths[i] == len(expected)
        np.testing.assert_array_equal(decoded[i, : lengths[i]], expected)
        np.testing.assert_array_equal(decoded[i, lengths[i]:], -1)


def test_greedy_decode_full_row():
    # Every frame emits a distinct non-blank: output fills the whole row.
    logits = np.full((1, 4, 5), -10.0, dtype=np.float32)
    for t, s in enumerate([0, 1, 2, 3]):
        logits[0, t, s] = 10.0
    decoded, lengths, _ = greedy_decode(jnp.asarray(logits), jnp.asarray([4]))
    assert int(lengths[0]) == 4
    np.testing.assert_array_equal(np.asarray(decoded)[0], [0, 1, 2, 3])


def test_ctc_loss_matches_optax():
    # independent implementation cross-check (optax uses blank=0; remap)
    import optax

    rng = np.random.RandomState(11)
    b, t, u = 4, 20, 8
    logits = jnp.asarray(rng.randn(b, t, 5), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, (b, u)), jnp.int32)
    ll = jnp.asarray([8, 5, 3, 1])
    tl = jnp.asarray([20, 18, 20, 9])
    ours = ctc_loss(logits, tl, labels, ll)
    logits_o = jnp.concatenate([logits[..., 4:5], logits[..., :4]], axis=-1)
    logit_pad = (jnp.arange(t)[None, :] >= tl[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(u)[None, :] >= ll[:, None]).astype(jnp.float32)
    theirs = optax.ctc_loss(logits_o, logit_pad, labels + 1, label_pad)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), rtol=1e-4)


def test_ctc_custom_vjp_matches_autodiff():
    """Analytic alpha-beta gradient == autodiff through the forward scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import importlib

    M = importlib.import_module("chiron_tpu.ops.ctc_loss")

    rng = np.random.RandomState(0)
    b, t, u, c = 6, 20, 7, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    sl = jnp.asarray([t, t, 15, 9, 20, 3], jnp.int32)
    labels = jnp.asarray(rng.randint(0, 4, size=(b, u)), jnp.int32)
    # include: full labels, short labels, zero labels, label longer than
    # logits (ignore case: sl=3 < ll=7)
    ll = jnp.asarray([u, 4, 2, 1, 0, 7], jnp.int32)
    w = jnp.asarray(rng.rand(b).astype(np.float32))  # random cotangent

    g_custom = jax.grad(
        lambda lg: jnp.sum(M.ctc_loss(lg, sl, labels, ll) * w)
    )(logits)
    g_auto = jax.grad(
        lambda lg: jnp.sum(M._ctc_forward(lg, sl, labels, ll)[0] * w)
    )(logits)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=2e-4, atol=2e-6
    )
    # values identical too
    v1 = M.ctc_loss(logits, sl, labels, ll)
    v2 = M._ctc_forward(logits, sl, labels, ll)[0]
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
