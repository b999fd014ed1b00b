"""Convolutional layer library (pure init/apply functions).

TPU-first re-design of the reference CNN zoo building blocks
(reference: chiron/cnn.py:15-331). All ops are expressed on [B, T, C]
(NWC) 1-D convolutions, which XLA lowers onto the MXU; the reference's
[B, 1, T, C] NHWC 2-D conv framing is dropped.

Parameters are plain nested dicts (pytrees); every block is a pair
``init_*(key, ...) -> params`` / ``apply fn(params, x) -> y``. There is no
mutable state: the reference's "global batch norm" (chiron/cnn.py:166-188)
uses current-batch statistics even at inference, so it is a pure function
of the batch here too (this is load-bearing for output parity — outputs
depend on batch composition, see SURVEY.md §6).
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from chiron_tpu.models.initializers import variance_scaling, xavier_normal

Params = Dict[str, Any]

_BN_EPS = 1e-5

# bf16 inference mode (config["bf16"]): matmul/conv INPUTS are cast to
# bfloat16 with float32 accumulation (the MXU's native mode); batch-norm
# statistics, biases, activations and all recurrent state stay float32.
# Trace-time static: apply_model sets this for the duration of tracing.
_BF16 = False


@contextlib.contextmanager
def bf16_compute(enabled: bool = True):
    global _BF16
    prev = _BF16
    _BF16 = bool(enabled)
    try:
        yield
    finally:
        _BF16 = prev


def matmul_inputs(*arrays):
    """Cast matmul/conv operands to the active compute dtype (f32 or bf16)."""
    if not _BF16:
        return arrays
    return tuple(a.astype(jnp.bfloat16) for a in arrays)


def bf16_active() -> bool:
    """True while tracing under bf16 inference mode."""
    return _BF16


def store_activation(x: jnp.ndarray) -> jnp.ndarray:
    """Cast an activation to the storage dtype of the active mode.

    Under bf16 mode, materialised activations are stored as bfloat16 —
    the forward pass is HBM-bandwidth-bound, so halving every
    [B, T, C] tensor's footprint is the actual win (bf16 MXU inputs
    alone measured ~0 speedup). All reductions/normalisation math still
    runs in float32 via type promotion inside the fusion.
    """
    return x.astype(jnp.bfloat16) if _BF16 else x


# --------------------------------------------------------------------------
# conv1d + global batch norm (reference: chiron/cnn.py:15-83,166-188)
# --------------------------------------------------------------------------

def init_conv(
    key,
    ksize: int,
    c_in: int,
    c_out: int,
    bias: bool = False,
    bn: bool = True,
) -> Params:
    keys = jax.random.split(key, 4)
    p: Params = {"w": xavier_normal(keys[0], (ksize, c_in, c_out))}
    if bias:
        p["b"] = jnp.zeros((c_out,))
    if bn:
        p["bn_scale"] = variance_scaling(keys[1], (c_out,))
        p["bn_offset"] = variance_scaling(keys[2], (c_out,))
    return p


def global_bn(x: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Normalize by current-batch moments over (batch, time).

    Parity with ``simple_global_bn`` (chiron/cnn.py:166-188): moments are
    always from the live batch — there are no population statistics.
    Moments accumulate in float32 even when x is stored as bfloat16.
    """
    mean = jnp.mean(x, axis=(0, 1), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(x.astype(jnp.float32) - mean), axis=(0, 1), keepdims=True
    )
    inv = lax.rsqrt(var + _BN_EPS)
    return (x.astype(jnp.float32) - mean) * inv * scale + offset


def pop_bn(x, scale, offset, mean, var) -> jnp.ndarray:
    """Population-statistics batch norm (inference branch of the
    reference's older ``batchnorm``, chiron/cnn.py:125-163, eps 1e-5).

    Selected when a conv's params carry bn_mean/bn_var — the layout
    tools/convert_tf_checkpoint.py emits for the shipped "pop"-dialect
    checkpoints. A pure elementwise affine: XLA fuses it into the conv.
    """
    inv = lax.rsqrt(var.astype(jnp.float32) + _BN_EPS)
    return (x.astype(jnp.float32) - mean) * inv * scale + offset


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
}


# --------------------------------------------------------------------------
# fused conv+BN chains (ops/pallas/convbn.py) — inference-only
# --------------------------------------------------------------------------

# Trace-time static, set by apply_model for inference traces on TPU. When
# on, BN'd relu/linear convs return LazyBN values: the raw conv output plus
# a deferred affine that the NEXT fused conv applies as it reads — one HBM
# write + one read per tensor instead of XLA's ~4 trips around the
# batch-stat moment reduction.
_FUSED = False


@contextlib.contextmanager
def fused_cnn(enabled: bool = True):
    global _FUSED
    prev = _FUSED
    _FUSED = bool(enabled)
    try:
        yield
    finally:
        _FUSED = prev


class LazyBN:
    """Deferred sum of affine-normalized raw tensors, optionally relu'd.

    value == relu?(sum_i raw_i * a_i + b_i); raws share [B, T, C].
    """

    def __init__(self, terms, relu: bool):
        self.terms = list(terms)
        self.relu = bool(relu)

    @property
    def shape(self):
        return self.terms[0][0].shape


def materialize(x):
    """Collapse a LazyBN into a plain array (XLA elementwise fusion)."""
    if not isinstance(x, LazyBN):
        return x
    y = None
    for raw, a, b in x.terms:
        t = raw.astype(jnp.float32) * a + b
        y = t if y is None else y + t
    if x.relu:
        y = jax.nn.relu(y)
    return store_activation(y)


def _as_terms(x):
    """(terms, relu_in) for a fused conv's input."""
    if isinstance(x, LazyBN):
        return tuple(x.terms), x.relu
    c = x.shape[-1]
    one = jnp.ones((c,), jnp.float32)
    zero = jnp.zeros((c,), jnp.float32)
    return ((x, one, zero),), False


def _fused_conv_ok(params, stride, dilation, padding, active) -> bool:
    return (
        _FUSED
        and dilation == 1
        and padding == "SAME"
        and active in ("relu", None)
        and "b" not in params
    )


def _fused_conv(params, x, active, stride=1):
    """Fused conv+BN path: returns a LazyBN of this conv's raw output."""
    from chiron_tpu.ops.pallas.convbn import bn_affine, conv_bn_pallas

    if isinstance(x, LazyBN) and len(x.terms) > 2:
        x = materialize(x)  # the kernel prologue sums at most two terms
    terms, relu_in = _as_terms(x)
    w = params["w"]
    k = w.shape[0]
    out_dtype = jnp.bfloat16 if _BF16 else jnp.float32
    y_raw, sums, sqs = conv_bn_pallas(terms, w, k, relu_in, stride=stride,
                                      out_dtype=out_dtype)
    c_out = w.shape[-1]
    if "bn_mean" in params:  # pop-stats BN: affine from stored moments
        inv = lax.rsqrt(params["bn_var"].astype(jnp.float32) + _BN_EPS)
        a = inv * params["bn_scale"]
        b = params["bn_offset"] - params["bn_mean"] * a
    elif "bn_scale" in params:  # batch-stat BN: affine from streamed moments
        bsz, t = y_raw.shape[0], y_raw.shape[1]
        a, b = bn_affine(sums, sqs, float(bsz * t), params["bn_scale"],
                         params["bn_offset"])
    else:
        a = jnp.ones((c_out,), jnp.float32)
        b = jnp.zeros((c_out,), jnp.float32)
    return LazyBN([(y_raw, a, b)], relu=(active == "relu"))


def conv(
    params: Params,
    x: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "SAME",
    active: Optional[str] = "relu",
) -> jnp.ndarray:
    """1-D convolution [B, T, C_in] -> [B, T', C_out] (+BN, +activation).

    Reference behaviour: chiron/cnn.py:15-83 (conv -> optional bias ->
    optional global BN -> optional activation).

    Under fused_cnn (TPU inference), eligible convs (dilation 1, SAME,
    relu/linear, no bias; any stride) return a LazyBN deferred value instead of
    an array; materialize() collapses it. Callers that need arrays (other
    activations, pooling, the RNN) materialize on entry.
    """
    if _fused_conv_ok(params, stride, dilation, padding, active):
        return _fused_conv(params, x, active, stride=stride)
    x = materialize(x)
    lhs, rhs = matmul_inputs(x, params["w"])
    y = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    # bf16 mode: the conv result materialises once (the BN moments reduce
    # over it), so cast it at the fusion boundary to halve the HBM write
    y = store_activation(y)
    if "b" in params:
        y = y + store_activation(params["b"])
    if "bn_mean" in params:
        y = pop_bn(y, params["bn_scale"], params["bn_offset"],
                   params["bn_mean"], params["bn_var"])
    elif "bn_scale" in params:
        y = global_bn(y, params["bn_scale"], params["bn_offset"])
    if active is not None:
        y = _ACTIVATIONS[active](y)
    return store_activation(y)


# --------------------------------------------------------------------------
# residual block (reference: chiron/cnn.py:234-262)
# --------------------------------------------------------------------------

def init_residual(
    key, c_in: int, c_out: int, k: int = 3, i_bn: bool = False
) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        # identity branch: 1x1 conv, BN only when i_bn, no activation
        "branch1": init_conv(k1, 1, c_in, c_out, bn=i_bn),
        # bottleneck branch: 1x1 -> 1xk -> 1x1, all BN'd, last inactive
        "conv2a": init_conv(k2, 1, c_in, c_out),
        "conv2b": init_conv(k3, k, c_out, c_out),
        "conv2c": init_conv(k4, 1, c_out, c_out),
    }


def residual(params: Params, x: jnp.ndarray, stride: int = 1):
    identity = conv(params["branch1"], x, stride=stride, active=None)
    y = conv(params["conv2a"], x)
    y = conv(params["conv2b"], y, stride=stride)
    y = conv(params["conv2c"], y, active=None)
    if isinstance(identity, LazyBN) and isinstance(y, LazyBN):
        # the block output is never materialised: both branches flow to the
        # next fused conv's prologue as (raw, affine) terms under one relu
        return LazyBN(identity.terms + y.terms, relu=True)
    return jax.nn.relu(materialize(identity) + materialize(y))


# --------------------------------------------------------------------------
# inception block (reference: chiron/cnn.py:191-231)
# --------------------------------------------------------------------------

def init_inception(key, c_in: int, times: int = 16) -> Params:
    ks = jax.random.split(key, 10)
    return {
        "conv1a": init_conv(ks[0], 1, c_in, times * 3),
        "conv0b": init_conv(ks[1], 1, c_in, times * 3),
        "conv0c": init_conv(ks[2], 1, c_in, times * 2),
        "conv1c": init_conv(ks[3], 3, times * 2, times * 3),
        "conv0d": init_conv(ks[4], 1, c_in, times * 2),
        "conv1d": init_conv(ks[5], 5, times * 2, times * 3),
        "conv0e": init_conv(ks[6], 1, c_in, times * 2),
        "conv1e": init_conv(ks[7], 3, times * 2, times * 3),
        "conv0f": init_conv(ks[8], 1, c_in, times * 2),
        "conv1f": init_conv(ks[9], 3, times * 2, times * 3),
    }


def inception(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    avg = avg_pool(x, ksize=3, stride=1)
    b1 = conv(params["conv1a"], avg)
    b2 = conv(params["conv0b"], x)
    b3 = conv(params["conv1c"], conv(params["conv0c"], x))
    b4 = conv(params["conv1d"], conv(params["conv0d"], x))
    b5 = conv(params["conv1e"], conv(params["conv0e"], x), dilation=2)
    b6 = conv(params["conv1f"], conv(params["conv0f"], x), dilation=3)
    return jnp.concatenate(
        [materialize(b) for b in (b1, b2, b3, b4, b5, b6)], axis=-1
    )


# --------------------------------------------------------------------------
# wavenet block (reference: chiron/cnn.py:299-331)
# --------------------------------------------------------------------------

def init_wavenet(key, c_in: int, c_out: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "identity": init_conv(k1, 1, c_in, c_out),
        "gate": init_conv(k2, 2, c_in, c_out),
        "filter": init_conv(k3, 2, c_in, c_out),
        "proj": init_conv(k4, 1, c_out, c_out),
    }


def wavenet(params: Params, x: jnp.ndarray, dilation: int) -> jnp.ndarray:
    identity = conv(params["identity"], x, active=None)
    gate = conv(params["gate"], x, dilation=dilation, active="sigmoid")
    filt = conv(params["filter"], x, dilation=dilation, active="tanh")
    y = conv(params["proj"], gate * filt, active=None)
    if isinstance(identity, LazyBN) and isinstance(y, LazyBN):
        return LazyBN(identity.terms + y.terms, relu=True)
    return jax.nn.relu(materialize(identity) + materialize(y))


# --------------------------------------------------------------------------
# gated conv block (reference: chiron/cnn.py:85-124)
# --------------------------------------------------------------------------

def init_gated_conv(key, c_in: int, c_out: int, k: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate": init_conv(k1, k, c_in, c_out, bias=True),
        "conv": init_conv(k2, k, c_in, c_out, bias=True),
        "identity": init_conv(k3, 1, c_in, c_out),
    }


def gated_conv(params: Params, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    gate = conv(params["gate"], x, dilation=dilation, active="sigmoid")
    y = conv(params["conv"], x, dilation=dilation, active="tanh")
    identity = conv(params["identity"], x, active=None)
    return gate * y + materialize(identity)


# --------------------------------------------------------------------------
# pooling
# --------------------------------------------------------------------------

def avg_pool(x: jnp.ndarray, ksize: int, stride: int, padding: str = "SAME") -> jnp.ndarray:
    x = materialize(x)
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, ksize, 1), (1, stride, 1), padding
    )
    ones = jnp.ones((1, x.shape[1], 1), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, ksize, 1), (1, stride, 1), padding
    )
    return s / counts


def max_pool(x: jnp.ndarray, ksize: int, stride: int, padding: str = "SAME") -> jnp.ndarray:
    x = materialize(x)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, ksize, 1), (1, stride, 1), padding
    )
