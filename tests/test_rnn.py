import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu.models import rnn as R


def _np_lstm(wx, wh, b, x, length, forget_bias=1.0):
    """Plain numpy LSTM reference for one sequence. x: [T, C]."""
    hidden = wh.shape[0]
    h = np.zeros(hidden)
    c = np.zeros(hidden)
    outs = []
    for t in range(x.shape[0]):
        if t >= length:
            outs.append(np.zeros(hidden))
            continue
        gates = x[t] @ wx + h @ wh + b
        i, g, f, o = np.split(gates, 4)
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        c = sig(f + forget_bias) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        outs.append(h.copy())
    return np.stack(outs)


def test_lstm_matches_numpy_with_lengths():
    rng = np.random.RandomState(0)
    t, b, cin, hid = 7, 3, 4, 5
    params = {
        "wx": jnp.asarray(rng.randn(cin, 4 * hid) * 0.3, jnp.float32),
        "wh": jnp.asarray(rng.randn(hid, 4 * hid) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(4 * hid) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.randn(t, b, cin), jnp.float32)
    lengths = jnp.asarray([7, 4, 0])
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]
    xw = x @ params["wx"] + params["b"]
    hs = np.asarray(R._lstm_scan(params, xw, mask))
    for bi in range(b):
        expected = _np_lstm(
            np.asarray(params["wx"]),
            np.asarray(params["wh"]),
            np.asarray(params["b"]),
            np.asarray(x)[:, bi],
            int(lengths[bi]),
        )
        np.testing.assert_allclose(hs[:, bi], expected, rtol=1e-5, atol=1e-5)


def test_reverse_sequence():
    x = jnp.arange(5)[:, None, None].astype(jnp.float32).repeat(2, axis=1)
    lengths = jnp.asarray([5, 3])
    y = np.asarray(R.reverse_sequence(x, lengths))
    np.testing.assert_array_equal(y[:, 0, 0], [4, 3, 2, 1, 0])
    np.testing.assert_array_equal(y[:, 1, 0], [2, 1, 0, 3, 4])


def test_birnn_stack_shapes_and_masking():
    key = jax.random.PRNGKey(0)
    for layer_type in ("normal", "rna"):
        p = R.init_birnn_stack(key, c_in=3, hidden=6, layer_num=2,
                               cell_type="LSTM", layer_type=layer_type)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3))
        lengths = jnp.asarray([10, 6])
        y = R.birnn_stack(p, x, lengths, "LSTM", layer_type)
        assert y.shape == (2, 10, 12)
        # outputs past each example's length must be exactly zero
        np.testing.assert_array_equal(np.asarray(y)[1, 6:], 0.0)


def test_birnn_batch_independence():
    # An example's output must not depend on its batch neighbours.
    key = jax.random.PRNGKey(2)
    p = R.init_birnn_stack(key, 3, 4, 2, "LSTM", "normal")
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 3))
    lengths = jnp.asarray([8, 8, 8])
    full = R.birnn_stack(p, x, lengths, "LSTM", "normal")
    solo = R.birnn_stack(p, x[1:2], lengths[1:2], "LSTM", "normal")
    np.testing.assert_allclose(np.asarray(full)[1], np.asarray(solo)[0],
                               rtol=1e-5, atol=1e-6)


def test_gru_shapes():
    key = jax.random.PRNGKey(4)
    p = R.init_birnn_stack(key, 3, 5, 1, "GRU", "normal")
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 3))
    y = R.birnn_stack(p, x, jnp.asarray([6, 6]), "GRU", "normal")
    assert y.shape == (2, 6, 10)


def test_rnn_head():
    key = jax.random.PRNGKey(6)
    p = R.init_rnn_layers(key, c_in=3, hidden=4, layer_num=1, class_n=5,
                          cell_type="LSTM", layer_type="normal")
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 6, 3))
    y = R.rnn_layers(p, x, jnp.asarray([6, 6]))
    assert y.shape == (2, 6, 5)


def test_unirnn_layers_shapes_and_masking():
    """Forward-only stack (parity: chiron/rnn.py:176-216)."""
    import jax

    from chiron_tpu.models.rnn import init_unirnn_layers, unirnn_layers

    rng = np.random.RandomState(0)
    b, t, c_in, h, n_class = 4, 10, 6, 32, 5
    for cell in ("BNLSTM", "LSTM", "GRU"):
        params = init_unirnn_layers(
            jax.random.PRNGKey(0), c_in, h, 2, n_class, cell_type=cell
        )
        x = jnp.asarray(rng.randn(b, t, c_in), jnp.float32)
        lengths = jnp.asarray([t, 7, 3, 0], jnp.int32)
        logits = unirnn_layers(params, x, lengths, cell_type=cell)
        assert logits.shape == (b, t, n_class)
        assert np.isfinite(np.asarray(logits)).all()
        # past each row's length the hidden states are zero -> logits == bias
        out = np.asarray(logits)
        np.testing.assert_allclose(
            out[2, 5:], np.broadcast_to(params["b_class"], (t - 5, n_class)),
            atol=1e-6,
        )
