import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.models.rnn import _lstm_scan
from chiron_tpu.ops.pallas.lstm import lstm_layer_pallas, pad_lstm_weights


@pytest.mark.parametrize("h", [100, 128])
def test_pallas_lstm_matches_scan(h):
    rng = np.random.RandomState(0)
    t, b = 12, 16
    c_in = 8
    wx = jnp.asarray(rng.randn(c_in, 4 * h) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.randn(h, 4 * h) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    lengths = jnp.asarray([t] * 8 + [5] * 4 + [0] * 4, jnp.int32)

    xw = x @ wx + bias
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]
    ref = _lstm_scan({"wx": wx, "wh": wh, "b": bias}, xw, mask)
    wx_p, wh_p, b_p = pad_lstm_weights(wx, wh, bias, h)
    out = lstm_layer_pallas(x @ wx_p + b_p, wh_p, lengths, hidden=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_lstm_zero_length_batch():
    rng = np.random.RandomState(1)
    t, b, h = 6, 8, 100
    xw = jnp.asarray(rng.randn(t, b, 4 * h), jnp.float32)
    wh = jnp.asarray(rng.randn(h, 4 * h) * 0.1, jnp.float32)
    _, wh_p, _ = pad_lstm_weights(jnp.zeros((1, 4 * h)), wh, jnp.zeros(4 * h), h)
    from chiron_tpu.ops.pallas.lstm import pad_gate_cols
    out = lstm_layer_pallas(pad_gate_cols(xw, h), wh_p, jnp.zeros(b, jnp.int32), hidden=h, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
