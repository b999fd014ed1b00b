import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.models.rnn import (
    _bnlstm_scan,
    _gru_scan,
    init_bnlstm_cell,
    init_gru_cell,
)
from chiron_tpu.ops.pallas.bnlstm import bnlstm_layer_pallas, pad_bnlstm_weights
from chiron_tpu.ops.pallas.gru import gru_layer_pallas, pad_gru_weights


@pytest.mark.parametrize("h", [100, 128])
def test_pallas_gru_matches_scan(h):
    rng = np.random.RandomState(0)
    t, b, c_in = 12, 16, 8
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape) * 0.3, jnp.float32),
        init_gru_cell(jax.random.PRNGKey(0), c_in, h),
    )
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    lengths = jnp.asarray([t] * 8 + [5] * 4 + [0] * 4, jnp.int32)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]

    ref = _gru_scan(params, x, mask)
    wxg, whg, bg, wxc, whc, bc = pad_gru_weights(params, h)
    out = gru_layer_pallas(
        x @ wxg + bg, x @ wxc + bc, whg, whc, lengths, hidden=h, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h", [100, 128])
def test_pallas_bnlstm_matches_scan(h):
    rng = np.random.RandomState(1)
    t, b, c_in = 10, 16, 8
    params = init_bnlstm_cell(jax.random.PRNGKey(1), c_in, h)
    # randomize the learned pieces (keep BN scales positive-ish)
    params = dict(
        params,
        wx=jnp.asarray(rng.randn(c_in, 4 * h) * 0.3, jnp.float32),
        wh=jnp.asarray(rng.randn(h, 4 * h) * 0.3, jnp.float32),
        b=jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32),
        scale_x=jnp.asarray(0.1 + rng.rand(4 * h) * 0.2, jnp.float32),
        scale_h=jnp.asarray(0.1 + rng.rand(4 * h) * 0.2, jnp.float32),
        scale_c=jnp.asarray(0.1 + rng.rand(h) * 0.2, jnp.float32),
        offset_c=jnp.asarray(rng.randn(h) * 0.1, jnp.float32),
    )
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    lengths = jnp.asarray([t] * 8 + [4] * 4 + [0] * 4, jnp.int32)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)[..., None]

    ref = _bnlstm_scan(params, x @ params["wx"], mask)
    wx_p, wh_p, b_p, sx_p, sh_p, sc_p, oc_p = pad_bnlstm_weights(params, h)
    out = bnlstm_layer_pallas(
        x @ wx_p, wh_p, b_p, sx_p, sh_p, sc_p, oc_p, lengths,
        hidden=h, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_pallas_gru_zero_length_batch():
    rng = np.random.RandomState(2)
    t, b, h = 6, 8, 100
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape) * 0.2, jnp.float32),
        init_gru_cell(jax.random.PRNGKey(2), 4, h),
    )
    x = jnp.asarray(rng.randn(t, b, 4), jnp.float32)
    wxg, whg, bg, wxc, whc, bc = pad_gru_weights(params, h)
    out = gru_layer_pallas(
        x @ wxg + bg, x @ wxc + bc, whg, whc,
        jnp.zeros(b, jnp.int32), hidden=h, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_pallas_bigru_fused_matches_two_calls():
    """Fused bidirectional GRU kernel == two single-direction kernels."""
    from chiron_tpu.ops.pallas.gru import bigru_layer_pallas

    rng = np.random.RandomState(7)
    t, b, h, c_in = 12, 8, 100, 8
    lengths = jnp.asarray([t, t, 9, 5, 3, 1, 0, 7], jnp.int32)
    starts = t - lengths
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    cells = []
    for seed in (1, 2):
        params = jax.tree.map(
            lambda a: jnp.asarray(rng.randn(*a.shape) * 0.3, jnp.float32),
            init_gru_cell(jax.random.PRNGKey(seed), c_in, h),
        )
        cells.append(pad_gru_weights(params, h))
    (wxg_f, whg_f, bg_f, wxc_f, whc_f, bc_f) = cells[0]
    (wxg_b, whg_b, bg_b, wxc_b, whc_b, bc_b) = cells[1]

    xf, xb = x, jnp.flip(x, axis=0)
    ref_f = gru_layer_pallas(xf @ wxg_f + bg_f, xf @ wxc_f + bc_f,
                             whg_f, whc_f, lengths, h, interpret=True)
    ref_b = gru_layer_pallas(xb @ wxg_b + bg_b, xb @ wxc_b + bc_b,
                             whg_b, whc_b, lengths, h, starts=starts,
                             interpret=True)
    out_f, out_b = bigru_layer_pallas(
        xf @ wxg_f + bg_f, xf @ wxc_f + bc_f,
        xb @ wxg_b + bg_b, xb @ wxc_b + bc_b,
        (whg_f, whc_f), (whg_b, whc_b), lengths, starts,
        hidden=h, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("layer_type", ["normal", "rna"])
def test_fused_bigru_stack_matches_scan_stack(layer_type):
    """birnn_stack fused GRU flip path == the XLA scan path."""
    from unittest import mock

    from chiron_tpu.models import rnn as rnn_mod
    from chiron_tpu.ops.pallas import gru as kgru

    rng = np.random.RandomState(9)
    b, t, c_in, h = 8, 12, 6, 100
    params = rnn_mod.init_birnn_stack(
        jax.random.PRNGKey(0), c_in, h, 2, "GRU", layer_type
    )
    x = jnp.asarray(rng.randn(b, t, c_in), jnp.float32)
    lengths = jnp.asarray([t, t, 9, 5, 3, 1, 0, 7], jnp.int32)

    ref = rnn_mod.birnn_stack(params, x, lengths, "GRU", layer_type)

    fused_bigru = kgru.bigru_layer_pallas

    def bigru_interp(*args, **kw):
        kw["interpret"] = True
        return fused_bigru(*args, **kw)

    with mock.patch.object(rnn_mod, "_use_pallas", lambda: True), \
            mock.patch.object(kgru, "bigru_layer_pallas", bigru_interp):
        out = rnn_mod.birnn_stack(params, x, lengths, "GRU", layer_type)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _rand_bnlstm_cell(rng, c_in, h, seed):
    params = init_bnlstm_cell(jax.random.PRNGKey(seed), c_in, h)
    return dict(
        params,
        wx=jnp.asarray(rng.randn(c_in, 4 * h) * 0.3, jnp.float32),
        wh=jnp.asarray(rng.randn(h, 4 * h) * 0.3, jnp.float32),
        b=jnp.asarray(rng.randn(4 * h) * 0.1, jnp.float32),
        scale_x=jnp.asarray(0.1 + rng.rand(4 * h) * 0.2, jnp.float32),
        scale_h=jnp.asarray(0.1 + rng.rand(4 * h) * 0.2, jnp.float32),
        scale_c=jnp.asarray(0.1 + rng.rand(h) * 0.2, jnp.float32),
        offset_c=jnp.asarray(rng.randn(h) * 0.1, jnp.float32),
    )


def test_pallas_bibnlstm_fused_matches_two_calls():
    """Fused bidirectional BNLSTM kernel == two single-direction kernels."""
    from chiron_tpu.ops.pallas.bnlstm import bibnlstm_layer_pallas

    rng = np.random.RandomState(11)
    t, b, h, c_in = 12, 8, 100, 6
    lengths = jnp.asarray([t, t, 9, 5, 3, 1, 0, 7], jnp.int32)
    x = jnp.asarray(rng.randn(t, b, c_in), jnp.float32)
    fw = _rand_bnlstm_cell(rng, c_in, h, 3)
    bw = _rand_bnlstm_cell(rng, c_in, h, 4)

    from chiron_tpu.models.rnn import reverse_sequence

    xb = reverse_sequence(x, lengths)
    wx_f, *rest_f = pad_bnlstm_weights(fw, h)
    wx_b, *rest_b = pad_bnlstm_weights(bw, h)
    ref_f = bnlstm_layer_pallas(x @ wx_f, *rest_f, lengths, hidden=h,
                                interpret=True)
    ref_b = bnlstm_layer_pallas(xb @ wx_b, *rest_b, lengths, hidden=h,
                                interpret=True)
    out_f, out_b = bibnlstm_layer_pallas(
        x @ wx_f, xb @ wx_b, tuple(rest_f), tuple(rest_b), lengths,
        hidden=h, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("layer_type", ["normal", "rna"])
def test_fused_bibnlstm_stack_matches_scan_stack(layer_type):
    """birnn_stack fused BNLSTM path == the XLA scan path."""
    from unittest import mock

    from chiron_tpu.models import rnn as rnn_mod
    from chiron_tpu.ops.pallas import bnlstm as kbn

    rng = np.random.RandomState(13)
    b, t, c_in, h = 8, 12, 6, 100
    params = rnn_mod.init_birnn_stack(
        jax.random.PRNGKey(5), c_in, h, 2, "BNLSTM", layer_type
    )
    x = jnp.asarray(rng.randn(b, t, c_in), jnp.float32)
    lengths = jnp.asarray([t, t, 9, 5, 3, 2, 2, 7], jnp.int32)

    ref = rnn_mod.birnn_stack(params, x, lengths, "BNLSTM", layer_type)

    fused = kbn.bibnlstm_layer_pallas

    def fused_interp(*args, **kw):
        kw["interpret"] = True
        return fused(*args, **kw)

    with mock.patch.object(rnn_mod, "_use_pallas", lambda: True), \
            mock.patch.object(kbn, "bibnlstm_layer_pallas", fused_interp):
        out = rnn_mod.birnn_stack(params, x, lengths, "BNLSTM", layer_type)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
