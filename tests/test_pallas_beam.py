import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.ops.ctc_beam import beam_search_decode
from chiron_tpu.ops.pallas.beam import beam_search_pallas


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_beam_matches_xla(seed):
    rng = np.random.RandomState(seed)
    b, t = 5, 10
    logits = rng.randn(b, t, 5).astype(np.float32) * 2
    sl = jnp.asarray([t, t, 7, 1, 0])
    dec_x, len_x, lp_x = beam_search_decode(jnp.asarray(logits), sl, beam_width=8)
    dec_p, len_p, lp_p = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=8, batch_tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))
    np.testing.assert_array_equal(np.asarray(dec_x), np.asarray(dec_p))
    np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_p), rtol=1e-4, atol=1e-4)


def test_pallas_beam_peaky():
    rng = np.random.RandomState(3)
    b, t = 3, 16
    classes = rng.randint(0, 5, size=(b, t))
    logits = np.full((b, t, 5), -20.0, np.float32)
    for i in range(b):
        for j in range(t):
            logits[i, j, classes[i, j]] = 20.0
    sl = jnp.asarray([t, t, 9])
    dec_x, len_x, _ = beam_search_decode(jnp.asarray(logits), sl, beam_width=4)
    dec_p, len_p, _ = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=4, batch_tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(dec_x), np.asarray(dec_p))
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))


def test_pallas_beam_wide_width_matches_xla():
    # the reference's published baseline is beam 50 (README.md:146-149);
    # widths above 32 must stay on the Pallas path (seg rises to 56)
    rng = np.random.RandomState(7)
    b, t = 4, 12
    logits = rng.randn(b, t, 5).astype(np.float32) * 1.5
    sl = jnp.asarray([t, t, 5, 0])
    dec_x, len_x, lp_x = beam_search_decode(jnp.asarray(logits), sl,
                                            beam_width=50)
    dec_p, len_p, lp_p = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=50, batch_tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))
    np.testing.assert_array_equal(np.asarray(dec_x), np.asarray(dec_p))
    np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_p),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 5])
def test_pallas_beam_six_class_matches_xla(seed):
    # ACGTX methylation alphabet (config alphabet 5 -> 6 CTC classes) must
    # stay on the Pallas fast path (VERDICT r2 weak #4): the kernel is
    # generic over the label count
    rng = np.random.RandomState(seed)
    b, t = 5, 12
    logits = rng.randn(b, t, 6).astype(np.float32) * 2
    sl = jnp.asarray([t, t, 8, 1, 0])
    dec_x, len_x, lp_x = beam_search_decode(jnp.asarray(logits), sl,
                                            beam_width=8)
    dec_p, len_p, lp_p = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=8, batch_tile=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))
    np.testing.assert_array_equal(np.asarray(dec_x), np.asarray(dec_p))
    np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_p),
                               rtol=1e-4, atol=1e-4)


def test_pallas_beam_batch_tiling():
    rng = np.random.RandomState(4)
    b, t = 10, 8
    logits = rng.randn(b, t, 5).astype(np.float32)
    sl = jnp.full((b,), t, jnp.int32)
    dec1, len1, lp1 = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=6, batch_tile=4, interpret=True
    )
    dec2, len2, lp2 = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=6, batch_tile=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(dec1), np.asarray(dec2))
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-5)


@pytest.mark.parametrize("bonus", [0.7, 1.5])
def test_pallas_beam_length_bonus_matches_xla(bonus):
    """The length-bonus knob (deletion/insertion rebalancing) must stay in
    exact parity between the Pallas kernel and the XLA twin, including the
    merge path (the bonus enters merged extend mass on both sides)."""
    rng = np.random.RandomState(7)
    b, t = 4, 12
    logits = rng.randn(b, t, 5).astype(np.float32) * 2
    sl = jnp.asarray([t, t, 8, 3])
    dec_x, len_x, lp_x = beam_search_decode(
        jnp.asarray(logits), sl, beam_width=8, length_bonus=bonus)
    dec_p, len_p, lp_p = beam_search_pallas(
        jnp.asarray(logits), sl, beam_width=8, batch_tile=8, interpret=True,
        length_bonus=bonus)
    np.testing.assert_array_equal(np.asarray(len_x), np.asarray(len_p))
    np.testing.assert_array_equal(np.asarray(dec_x), np.asarray(dec_p))
    np.testing.assert_allclose(np.asarray(lp_x), np.asarray(lp_p),
                               rtol=1e-4, atol=1e-4)
    # a positive bonus must not shorten decodes vs bonus 0
    _, len0, _ = beam_search_decode(jnp.asarray(logits), sl, beam_width=8)
    assert (np.asarray(len_p) >= np.asarray(len0)).all()
