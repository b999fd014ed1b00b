"""Net2WiderNet function preservation (tools/net2wide.py).

The widened model must compute the same logits as the source model at
init (noise=0 exactly to fp tolerance; the default symmetry-breaking
noise only perturbs at the ~1e-2-relative level)."""

import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu.models import apply_model, init_model
from chiron_tpu.tools.net2wide import widen_params

CFG = {
    "cnn": {"model": "dna_model1"},
    "rnn": {"layer_num": 3, "hidden_num": 12, "cell_type": "LSTM",
            "layer_type": "normal"},
}
CFG_WIDE = {
    "cnn": {"model": "dna_model1"},
    "rnn": {"layer_num": 3, "hidden_num": 16, "cell_type": "LSTM",
            "layer_type": "normal"},
}


def _to_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def test_widen_preserves_logits_exactly_without_noise():
    params = _to_np(init_model(jax.random.PRNGKey(3), CFG))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    lens = jnp.asarray([64, 48], jnp.int32)
    base = np.asarray(apply_model(params, CFG, x, lens))
    wide = widen_params(params, 12, 16, seed=1, noise=0.0)
    assert wide["rnn"]["stack"]["layers"][0]["fw"]["wh"].shape == (16, 64)
    assert wide["rnn"]["stack"]["layers"][1]["fw"]["wx"].shape == (32, 64)
    assert wide["rnn"]["head"]["w_class"].shape[0] == 16
    out = np.asarray(apply_model(wide, CFG_WIDE, x, lens))
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-4)


def test_widen_default_noise_stays_close():
    params = _to_np(init_model(jax.random.PRNGKey(5), CFG))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    lens = jnp.asarray([64, 64], jnp.int32)
    base = np.asarray(apply_model(params, CFG, x, lens))
    wide = widen_params(params, 12, 16, seed=1)  # default 1e-2 noise
    out = np.asarray(apply_model(wide, CFG_WIDE, x, lens))
    # symmetry-breaking noise: small but nonzero deviation
    dev = np.abs(out - base).max()
    assert dev < 0.35, dev
    assert not np.allclose(out, base, atol=1e-6)
