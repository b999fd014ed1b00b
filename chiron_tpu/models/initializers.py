"""Weight initializers matching the reference's TF1 initializer choices.

The reference uses xavier (glorot) normal for conv weights
(chiron/cnn.py:45), variance-scaling for BN scale/offset (chiron/cnn.py:181-186),
truncated normal for the RNN output head (chiron/rnn.py:73-88), and TF's
default glorot uniform for LSTM kernels. Exact init parity is not required
(pretrained checkpoint blobs are absent upstream); distributional parity is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fans(shape) -> tuple[float, float]:
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = float(shape[-2] * receptive)
    fan_out = float(shape[-1] * receptive)
    return fan_in, fan_out


def xavier_normal(key, shape, dtype=jnp.float32):
    """Glorot normal: std = sqrt(2 / (fan_in + fan_out))."""
    fan_in, fan_out = _fans(shape)
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def variance_scaling(key, shape, dtype=jnp.float32, scale=2.0):
    """He / variance-scaling (fan_in, truncated normal), TF contrib default."""
    fan_in, _ = _fans(shape)
    std = np.sqrt(scale / max(fan_in, 1.0))
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def truncated_normal(key, shape, stddev, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def orthogonal(key, shape, dtype=jnp.float32):
    """Orthogonal init (used by the custom LSTM cells, chiron/utils/lstm.py)."""
    n_rows = int(np.prod(shape[:-1]))
    n_cols = int(shape[-1])
    mat_shape = (max(n_rows, n_cols), min(n_rows, n_cols))
    a = jax.random.normal(key, mat_shape, dtype)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    if n_rows < n_cols:
        q = q.T
    return q[:n_rows, :n_cols].reshape(shape)
