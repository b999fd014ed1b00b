"""Fused conv1d + batch-stat BN chains as Pallas TPU kernels.

The reference's ``simple_global_bn`` (chiron/cnn.py:166-188) normalizes
every conv output by CURRENT-batch moments, so under XLA each conv tensor
makes ~4 HBM trips: conv writes y, the moment reduction reads y, the
normalize+relu fusion reads y and writes z, and the next conv reads z.
At dna_model1's shapes ([400, 400, 256] f32 = 164 MB per tensor, 12 convs)
those extra passes dominate the forward's wall time — the conv FLOPs are
microseconds on the MXU.

This kernel chain gets each tensor down to ONE write + ONE read:

* a conv's raw (un-normalized) output is what lands in HBM, together with
  per-channel sum / sum-of-squares accumulated in VMEM scratch while the
  tiles stream out — the moment reduction costs no extra pass;
* the BN affine (a = rsqrt(var+eps)*scale, b = offset - mean*a, computed
  from those moments by tiny XLA ops) and the relu are applied by the NEXT
  conv's prologue as it reads the raw tensor;
* a residual block's output (relu(identity + bottleneck)) is never
  materialised: it flows as TWO (raw, a, b) terms summed in the consumer's
  prologue (see models/layers.py LazyBN).

SAME zero-padding happens inside the kernel AFTER the prologue (XLA pads
the post-normalization input, so pad positions must be zero post-affine).
The conv itself is k tap-matmuls [BB*T, C_in] x [C_in, C_out] over shifted
in-VMEM views — clean MXU shapes at C=256.

Numerics: moments use the one-pass E[x^2] - E[x]^2 form in float32 (the
XLA twin computes the centered two-pass form); after BN+relu every tensor
is O(1) so the reassociation error is ~1e-6 relative. Parity vs the XLA
twin is asserted in tests at 1e-4.

Inference-only (pallas_call has no autodiff); gated in models/layers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5


def _batch_tile(bsz: int, t: int, c: int) -> int:
    """Largest divisor of bsz <= 8 that keeps the input block under ~4MB."""
    cap = max(1, (4 << 20) // max(t * c * 4, 1))
    bb = min(8, cap)
    while bb > 1 and bsz % bb:
        bb -= 1
    return bb


def _conv_bn_kernel(k, stride, out_t, lpad, rpad, n_terms, relu_in,
                    raw_dtype, *refs):
    """One grid step: prologue-normalize BB batch rows, conv, accumulate
    output moments.

    refs layout: vec_ref, raw refs (n_terms), w_ref, y_ref, mom_ref,
    acc_scr. vec_ref rows: (a1, b1[, a2, b2]) each [C_in], padded to 8.

    stride > 1 uses a phase-split: the padded input reshapes to
    [BB, Lp/s, s*C_in] so tap i = q*s + p reads rows [q, q+out_t) at lane
    range [p*C_in, (p+1)*C_in) — static slices only (no strided loads).
    """
    vec_ref = refs[0]
    raws = refs[1:1 + n_terms]
    w_ref = refs[1 + n_terms]
    y_ref = refs[2 + n_terms]
    mom_ref = refs[3 + n_terms]
    acc = refs[4 + n_terms]

    bgrid = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(bgrid == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # the affine runs in 2-D [BB*T, C]: Mosaic rejects the [1, 1, C]
    # mid-dimension broadcast a 3-D form would need (gather lowering)
    vec = vec_ref[:]
    bb, t, c_in = raws[0].shape
    z = raws[0][:].astype(jnp.float32).reshape(bb * t, c_in) * vec[0:1] \
        + vec[1:2]
    if n_terms == 2:
        z = z + (raws[1][:].astype(jnp.float32).reshape(bb * t, c_in)
                 * vec[2:3] + vec[3:4])
    if relu_in:
        z = jnp.maximum(z, 0.0)
    z = z.reshape(bb, t, c_in)
    if lpad or rpad:
        z = jnp.concatenate(
            [jnp.zeros((bb, lpad, c_in), z.dtype), z,
             jnp.zeros((bb, rpad, c_in), z.dtype)],
            axis=1,
        )
    c_out = w_ref.shape[-1]
    y = jnp.zeros((bb * out_t, c_out), jnp.float32)
    if stride == 1:
        for i in range(k):
            zi = z[:, i:i + out_t, :].reshape(bb * out_t, c_in)
            y = y + jnp.dot(zi, w_ref[i], preferred_element_type=jnp.float32)
    else:
        lp_rows = z.shape[1]
        zr = z.reshape(bb, lp_rows // stride, stride * c_in)
        for i in range(k):
            q, p = divmod(i, stride)
            zi = zr[:, q:q + out_t, p * c_in:(p + 1) * c_in]
            y = y + jnp.dot(zi.reshape(bb * out_t, c_in), w_ref[i],
                            preferred_element_type=jnp.float32)

    acc[0:1, :] += jnp.sum(y, axis=0, keepdims=True)
    acc[1:2, :] += jnp.sum(y * y, axis=0, keepdims=True)
    y_ref[:] = y.reshape(bb, out_t, c_out).astype(y_ref.dtype)

    @pl.when(bgrid == nb - 1)
    def _():
        mom_ref[:] = acc[:]


@functools.partial(
    jax.jit, static_argnames=("k", "relu_in", "stride", "out_dtype",
                              "interpret")
)
def conv_bn_pallas(
    terms,
    w: jnp.ndarray,
    k: int,
    relu_in: bool,
    stride: int = 1,
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fused prologue-normalize + conv1d + output-moment accumulation.

    Args:
      terms: tuple of (raw [B, T, C_in], a [C_in], b [C_in]) — the input is
        relu?(sum_i raw_i * a_i + b_i) (relu controlled by ``relu_in``).
      w: [k, C_in, C_out] conv kernel; SAME padding, dilation 1.
      k: static kernel width (must equal w.shape[0]).
      relu_in: apply relu after the input affine sum.
      stride: window stride (SAME semantics: out_t = ceil(t / stride)).
    Returns:
      (y_raw [B, T', C_out] in out_dtype, sums [C_out] f32, sqs [C_out] f32)
      where sums/sqs are the per-channel moments of y over (B, T').
    """
    n_terms = len(terms)
    assert n_terms in (1, 2)
    raw0 = terms[0][0]
    bsz, t, c_in = raw0.shape
    assert w.shape == (k, c_in, w.shape[-1])
    c_out = w.shape[-1]
    s = int(stride)
    out_t = -(-t // s)
    if s == 1:
        lpad = (k - 1) // 2
        rpad = k - 1 - lpad
    else:
        # XLA SAME for strided windows, then right-pad so the phase-split
        # reshape ([Lp/s, s*C_in]) covers every tap's [q, q+out_t) rows
        pad_total = max((out_t - 1) * s + k - t, 0)
        lpad = pad_total // 2
        lp_rows = (out_t + (k - 1) // s + 1) * s
        rpad = lp_rows - lpad - t

    # pack affine vectors into one [8, C_in] block
    rows = []
    for _, a, b in terms:
        rows.append(a.astype(jnp.float32))
        rows.append(b.astype(jnp.float32))
    vec = jnp.stack(rows, axis=0)
    vec = jnp.pad(vec, ((0, 8 - vec.shape[0]), (0, 0)))

    bb = _batch_tile(bsz, t, max(c_in, c_out))
    kernel = functools.partial(
        _conv_bn_kernel, k, s, out_t, lpad, rpad, n_terms, relu_in,
        raw0.dtype
    )
    raw_specs = [
        pl.BlockSpec((bb, t, c_in), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_terms)
    ]
    y, mom = pl.pallas_call(
        kernel,
        grid=(bsz // bb,),
        in_specs=[
            pl.BlockSpec((8, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            *raw_specs,
            pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, out_t, c_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, out_t, c_out), out_dtype),
            jax.ShapeDtypeStruct((8, c_out), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, c_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vec, *[tm[0] for tm in terms], w)
    return y, mom[0], mom[1]


def bn_affine(sums, sqs, count, scale, offset):
    """(a, b) such that bn(y) == y * a + b, from streamed moments."""
    mean = sums / count
    var = jnp.maximum(sqs / count - mean * mean, 0.0)
    a = jax.lax.rsqrt(var + _BN_EPS) * scale
    return a, offset - mean * a
