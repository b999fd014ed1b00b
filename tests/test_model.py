import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chiron_tpu.config import default_config, read_config
from chiron_tpu.models import apply_model, init_model, model_ratio, output_len


def test_dna_model_forward_shape():
    config = default_config()
    params = init_model(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    seq_len = jnp.full((4,), 64, jnp.int32)
    logits = apply_model(params, config, x, seq_len)
    assert logits.shape == (4, 64, 5)
    assert model_ratio(config, 64) == 1.0


def test_rna_model3_ratio_and_shape():
    config = read_config(None)
    config["cnn"]["model"] = "rna_model3"
    config["rnn"]["layer_type"] = "rna"
    params = init_model(jax.random.PRNGKey(0), config)
    seg = 70
    x = jax.random.normal(jax.random.PRNGKey(1), (2, seg))
    t_out = output_len(config, seg)
    assert t_out == 10  # ceil(70/7)
    logits = apply_model(
        params, config, x, jnp.full((2,), t_out, jnp.int32)
    )
    assert logits.shape == (2, 10, 5)
    assert model_ratio(config, seg) == 7.0


def test_cnn_only_model():
    config = default_config()
    config["rnn"]["layer_num"] = 0
    params = init_model(jax.random.PRNGKey(0), config)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    logits = apply_model(params, config, x, jnp.full((2,), 32, jnp.int32))
    assert logits.shape == (2, 32, 5)


@pytest.mark.parametrize(
    "name", ["rna_model1", "rna_model2", "rna_test", "variant_wavnet",
             "gate_conv_net", "gate_conv_net_low", "gate_conv_net_high", "custom"]
)
def test_zoo_models_compile(name):
    config = default_config()
    config["cnn"]["model"] = name
    config["rnn"]["layer_num"] = 0
    params = init_model(jax.random.PRNGKey(0), config)
    seg = 80
    x = jax.random.normal(jax.random.PRNGKey(1), (2, seg))
    logits = apply_model(params, config, x, jnp.full((2,), output_len(config, seg)))
    assert logits.shape[0] == 2 and logits.shape[2] == 5
    assert logits.shape[1] == output_len(config, seg)


def test_dynamic_net():
    config = default_config()
    config["cnn"] = {
        "model": "dynamic_net",
        "tp": ["conv", "res", "p_max"],
        "hu": [32, 32, 0],
        "kw": [5, 3, 3],
        "st": [2, 1, 2],
        "pd": ["SAME", "SAME", "SAME"],
    }
    config["rnn"]["layer_num"] = 0
    params = init_model(jax.random.PRNGKey(0), config)
    seg = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (2, seg))
    logits = apply_model(params, config, x, jnp.full((2,), output_len(config, seg)))
    assert logits.shape == (2, 16, 5)


def test_model_jits():
    config = default_config()
    params = init_model(jax.random.PRNGKey(0), config)
    fwd = jax.jit(lambda p, x, sl: apply_model(p, config, x, sl))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    sl = jnp.full((2,), 32, jnp.int32)
    y1 = fwd(params, x, sl)
    y2 = apply_model(params, config, x, sl)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-4, atol=1e-4)


def test_bf16_inference_mode_close_to_f32():
    """config["bf16"] casts matmul/conv inputs to bfloat16 (f32 accum)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chiron_tpu import config as C
    from chiron_tpu.models import apply_model, init_model

    config = C.default_config()
    rng = np.random.RandomState(0)
    params = init_model(jax.random.PRNGKey(0), config)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    sl = jnp.full((4,), 64, jnp.int32)
    ref = np.asarray(apply_model(params, config, x, sl))
    out = np.asarray(apply_model(params, dict(config, bf16=True), x, sl))
    assert not np.array_equal(out, ref)  # mode actually engaged
    # logits agree to bf16 round-off through BN + 3 BiLSTM layers
    np.testing.assert_allclose(out, ref, rtol=0.15, atol=0.15)
    # training ignores the flag (exact f32 semantics for parity/stability)
    tr_ref = np.asarray(apply_model(params, config, x, sl, training=True))
    tr_bf = np.asarray(
        apply_model(params, dict(config, bf16=True), x, sl, training=True)
    )
    np.testing.assert_array_equal(tr_ref, tr_bf)
