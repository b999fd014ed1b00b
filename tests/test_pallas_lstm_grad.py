import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.models.rnn import _lstm_scan
from chiron_tpu.ops.pallas.lstm import pad_lstm_weights
from chiron_tpu.ops.pallas.lstm_grad import lstm_layer_pallas_ad


def _setup(h, t=8, b=8, c_in=6, seed=0, lengths=None):
    rng = np.random.RandomState(seed)
    wx = jnp.asarray(rng.randn(c_in, 4 * h) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.randn(h, 4 * h) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    return wx, wh, bias, x, lengths


@pytest.mark.parametrize("h", [100, 128])
def test_forward_matches_scan(h):
    wx, wh, bias, x, lengths = _setup(h)
    t, b, _ = x.shape
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]
    ref = _lstm_scan({"wx": wx, "wh": wh, "b": bias}, x @ wx + bias, mask)
    wx_p, wh_p, b_p = pad_lstm_weights(wx, wh, bias, h)
    out = lstm_layer_pallas_ad(x @ wx_p + b_p, wh_p, lengths, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("lengths_spec", ["full", "ragged"])
def test_gradients_match_scan(lengths_spec):
    h = 100
    t, b = 8, 8
    lengths = None
    if lengths_spec == "ragged":
        lengths = jnp.asarray([8, 8, 5, 5, 3, 1, 1, 0], jnp.int32)
    wx, wh, bias, x, lengths = _setup(h, t=t, b=b, lengths=lengths)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]
    # random cotangent so every output position contributes
    rng = np.random.RandomState(42)
    cot = jnp.asarray(rng.randn(t, b, h), jnp.float32)

    def loss_scan(wx_, wh_, b_):
        hs = _lstm_scan({"wx": wx_, "wh": wh_, "b": b_}, x @ wx_ + b_, mask)
        return jnp.sum(hs * cot)

    def loss_pallas(wx_, wh_, b_):
        wx_p, wh_p, b_p = pad_lstm_weights(wx_, wh_, b_, h)
        hs = lstm_layer_pallas_ad(x @ wx_p + b_p, wh_p, lengths, h, True)
        return jnp.sum(hs * cot)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2))(wx, wh, bias)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(wx, wh, bias)
    for a, b_, name in zip(g_ref, g_pal, ("wx", "wh", "bias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name} ({lengths_spec})",
        )


def test_gradient_wrt_input():
    h = 100
    wx, wh, bias, x, lengths = _setup(h, t=6, b=4)
    t, b, _ = x.shape
    mask = jnp.ones((t, b, 1), jnp.float32)
    rng = np.random.RandomState(7)
    cot = jnp.asarray(rng.randn(t, b, h), jnp.float32)

    def loss_scan(x_):
        return jnp.sum(_lstm_scan({"wx": wx, "wh": wh, "b": bias},
                                  x_ @ wx + bias, mask) * cot)

    def loss_pallas(x_):
        wx_p, wh_p, b_p = pad_lstm_weights(wx, wh, bias, h)
        return jnp.sum(
            lstm_layer_pallas_ad(x_ @ wx_p + b_p, wh_p, lengths, h, True) * cot
        )

    gx_ref = jax.grad(loss_scan)(x)
    gx_pal = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_pal),
                               rtol=2e-4, atol=2e-4)
