import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu.models import layers as L


def test_conv_shapes_same_padding():
    key = jax.random.PRNGKey(0)
    p = L.init_conv(key, ksize=3, c_in=1, c_out=8)
    x = jnp.ones((2, 40, 1))
    y = L.conv(p, x)
    assert y.shape == (2, 40, 8)
    y = L.conv(p, x, stride=7)
    assert y.shape == (2, -(-40 // 7), 8)


def test_conv_dilation_shape():
    key = jax.random.PRNGKey(1)
    p = L.init_conv(key, ksize=3, c_in=4, c_out=4)
    x = jnp.ones((2, 40, 4))
    assert L.conv(p, x, dilation=3).shape == (2, 40, 4)


def test_global_bn_moments():
    # Global BN must use live batch+time moments (reference parity:
    # chiron/cnn.py:166-188 normalizes with current-batch statistics).
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 10, 3) * 5 + 2, dtype=jnp.float32)
    y = L.global_bn(x, jnp.ones((3,)), jnp.zeros((3,)))
    np.testing.assert_allclose(np.mean(np.asarray(y), axis=(0, 1)), 0, atol=1e-4)
    np.testing.assert_allclose(np.std(np.asarray(y), axis=(0, 1)), 1, atol=1e-3)


def test_residual_block():
    key = jax.random.PRNGKey(2)
    p = L.init_residual(key, c_in=1, c_out=16, i_bn=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 1))
    y = L.residual(p, x)
    assert y.shape == (2, 32, 16)
    assert bool(jnp.all(y >= 0))  # final relu
    y2 = L.residual(p, x, stride=2)
    assert y2.shape == (2, 16, 16)


def test_avg_pool_matches_numpy():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
    y = L.avg_pool(x, ksize=3, stride=1)
    # SAME padding: edges average over the in-bounds window only
    expected = np.convolve(np.arange(12.0), np.ones(3), "same") / np.convolve(
        np.ones(12), np.ones(3), "same"
    )
    np.testing.assert_allclose(np.asarray(y)[0, :, 0], expected, rtol=1e-6)


def test_inception_channels():
    key = jax.random.PRNGKey(4)
    p = L.init_inception(key, c_in=8, times=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 8))
    y = L.inception(p, x)
    assert y.shape == (2, 16, 4 * 3 * 6)


def test_wavenet_and_gated_conv():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 8))
    wp = L.init_wavenet(key, 8, 8)
    assert L.wavenet(wp, x, dilation=2).shape == (2, 16, 8)
    gp = L.init_gated_conv(key, 8, 8, k=3)
    assert L.gated_conv(gp, x).shape == (2, 16, 8)
