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


def test_pallas_lstm_flip_starts_equals_reverse_sequence():
    """flip + start-offset mask == reverse_sequence orchestration.

    The backward direction of birnn_stack feeds the kernel the fully
    time-flipped sequence with starts = T - len; the result flipped back
    must equal running the scan on reverse_sequence input and re-reversing.
    """
    from chiron_tpu.models.rnn import reverse_sequence

    rng = np.random.RandomState(5)
    t, b, h, c_in = 12, 8, 100, 8
    wx = jnp.asarray(rng.randn(c_in, 4 * h) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.randn(h, 4 * h) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    lengths = jnp.asarray([t, t, 9, 5, 3, 1, 0, 7], jnp.int32)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]

    # path A: reverse_sequence orchestration over the scan reference
    bw_in = reverse_sequence(x, lengths)
    out_a = reverse_sequence(
        _lstm_scan({"wx": wx, "wh": wh, "b": bias}, bw_in @ wx + bias, mask),
        lengths,
    )

    # path B: flip + starts through the Pallas kernel
    wx_p, wh_p, b_p = pad_lstm_weights(wx, wh, bias, h)
    bw_in2 = jnp.flip(x, axis=0)
    out_k = lstm_layer_pallas(
        bw_in2 @ wx_p + b_p, wh_p, lengths, hidden=h,
        starts=(t - lengths), interpret=True,
    )
    out_b = jnp.flip(out_k, axis=0)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_a), rtol=2e-5, atol=2e-5
    )


def test_pallas_bilstm_fused_matches_two_calls():
    """Fused bidirectional kernel == two single-direction kernels."""
    from chiron_tpu.ops.pallas.lstm import bilstm_layer_pallas

    rng = np.random.RandomState(7)
    t, b, h, c_in = 12, 8, 100, 8
    lengths = jnp.asarray([t, t, 9, 5, 3, 1, 0, 7], jnp.int32)
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    cells = []
    for _ in range(2):
        wx = jnp.asarray(rng.randn(c_in, 4 * h) * 0.3, jnp.float32)
        wh = jnp.asarray(rng.randn(h, 4 * h) * 0.3, jnp.float32)
        bias = jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32)
        cells.append(pad_lstm_weights(wx, wh, bias, h))
    (wxf, whf, bf), (wxb, whb, bb) = cells

    starts = t - lengths
    xf = x
    xb = jnp.flip(x, axis=0)
    ref_f = lstm_layer_pallas(xf @ wxf + bf, whf, lengths, hidden=h,
                              interpret=True)
    ref_b = lstm_layer_pallas(xb @ wxb + bb, whb, lengths, hidden=h,
                              starts=starts, interpret=True)
    out_f, out_b = bilstm_layer_pallas(
        xf @ wxf + bf, xb @ wxb + bb, whf, whb, lengths, starts,
        hidden=h, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("layer_type", ["normal", "rna"])
def test_fused_bilstm_stack_matches_scan_stack(layer_type):
    """birnn_stack fused flip path == the XLA scan path, full stack."""
    from unittest import mock

    from chiron_tpu.models import rnn as rnn_mod

    rng = np.random.RandomState(9)
    b, t, c_in, h = 8, 12, 6, 100
    key = jax.random.PRNGKey(0)
    params = rnn_mod.init_birnn_stack(key, c_in, h, 2, "LSTM", layer_type)
    x = jnp.asarray(rng.randn(b, t, c_in), jnp.float32)
    lengths = jnp.asarray([t, t, 9, 5, 3, 1, 0, 7], jnp.int32)

    ref = rnn_mod.birnn_stack(params, x, lengths, "LSTM", layer_type)

    # force the fused flip path with interpreter-mode kernels
    from chiron_tpu.ops.pallas import lstm as klstm

    fused_bilstm = klstm.bilstm_layer_pallas

    def bilstm_interp(*args, **kw):
        kw["interpret"] = True
        return fused_bilstm(*args, **kw)

    with mock.patch.object(rnn_mod, "_use_pallas", lambda: True), \
            mock.patch.object(klstm, "bilstm_layer_pallas", bilstm_interp):
        out = rnn_mod.birnn_stack(params, x, lengths, "LSTM", layer_type)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
