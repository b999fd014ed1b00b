"""Custom VJP for the fused Pallas LSTM: backward pass as a second kernel.

Training differentiates the recurrence; without this, the trainer falls
back to the lax.scan path and pays per-step launch latency in BOTH
directions (~50ms+/layer at T=400). Here:

* forward kernel additionally stores per-step residuals (activated gates,
  carried cell state, carried hidden state),
* the backward kernel runs the reverse-time BPTT recurrence in one grid
  program: per step, gate-gradient VPU math plus two MXU contractions
  (dh = da @ wh^T and the dwh accumulation h_{t-1}^T @ da in VMEM scratch),
* dwx/db fall out of XLA autodiff of the surrounding xw = x @ wx + b.

Masking follows the forward exactly: steps past a row's length contribute
zero gate gradients and pass dh/dc straight through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chiron_tpu.ops.pallas.lstm import LANE, _FORGET_BIAS


def _fwd_kernel(lens_ref, xw_ref, wh_ref, out_ref, gates_ref, cc_ref, hc_ref,
                h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hp = h_scr.shape[-1]
    gates = xw_ref[0] + jnp.dot(
        h_scr[:], wh_ref[:], preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(gates[:, 0 * hp:1 * hp])
    g = jnp.tanh(gates[:, 1 * hp:2 * hp])
    f = jax.nn.sigmoid(gates[:, 2 * hp:3 * hp] + _FORGET_BIAS)
    o = jax.nn.sigmoid(gates[:, 3 * hp:4 * hp])
    new_c = f * c_scr[:] + i * g
    new_h = o * jnp.tanh(new_c)
    mask = (lens_ref[:] > t).astype(new_h.dtype)
    if hp != LANE:
        mask = jnp.broadcast_to(mask[:, :1], new_h.shape)
    else:
        mask = mask
    c_scr[:] = mask * new_c + (1.0 - mask) * c_scr[:]
    masked_h = mask * new_h
    out_ref[0] = masked_h
    h_scr[:] = masked_h + (1.0 - mask) * h_scr[:]
    gates_ref[0] = jnp.concatenate([i, g, f, o], axis=1)
    cc_ref[0] = c_scr[:]
    hc_ref[0] = h_scr[:]


def _bwd_kernel(lens_ref, gates_ref, cc_ref, ccprev_ref, hcprev_ref,
                dhs_ref, wh_ref, dxw_ref, dwh_ref, dh_scr, dc_scr, dwh_scr):
    t = pl.program_id(0)  # 0..T-1 in REVERSE time: time index = T-1-t
    t_max = pl.num_programs(0)
    tt = t_max - 1 - t
    hp = dh_scr.shape[-1]
    tb = dh_scr.shape[0]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    gates = gates_ref[0]
    i = gates[:, 0 * hp:1 * hp]
    g = gates[:, 1 * hp:2 * hp]
    f = gates[:, 2 * hp:3 * hp]
    o = gates[:, 3 * hp:4 * hp]
    c_t = cc_ref[0]
    # carried state of the PREVIOUS step (zeros at time 0)
    is_first_step = tt == 0
    c_prev = jnp.where(is_first_step, jnp.zeros_like(c_t), ccprev_ref[0])
    h_prev = jnp.where(is_first_step, jnp.zeros_like(c_t), hcprev_ref[0])

    mask = (lens_ref[:] > tt).astype(jnp.float32)
    if hp != LANE:
        mask = jnp.broadcast_to(mask[:, :1], (tb, hp))

    tc = jnp.tanh(c_t)
    dh_new = mask * (dhs_ref[0] + dh_scr[:])
    dc_new = mask * dc_scr[:] + dh_new * o * (1.0 - tc * tc)
    do = dh_new * tc * o * (1.0 - o)
    df = dc_new * c_prev * f * (1.0 - f)
    di = dc_new * g * i * (1.0 - i)
    dg = dc_new * i * (1.0 - g * g)
    da = jnp.concatenate([di, dg, df, do], axis=1)  # [B, 4Hp]
    dxw_ref[0] = da
    # dh_{t-1} via wh^T contraction; passthrough for masked rows
    dh_from_gates = jax.lax.dot_general(
        da, wh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # masked steps pass the carried gradient through untouched; the output
    # was zeroed in the forward, so dhs does NOT flow through them
    dh_scr[:] = dh_from_gates + (1.0 - mask) * dh_scr[:]
    dc_scr[:] = (1.0 - mask) * dc_scr[:] + dc_new * f
    dwh_scr[:] = dwh_scr[:] + jax.lax.dot_general(
        h_prev, da, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwh_ref[:] = dwh_scr[:]


def _forward_with_residuals(xw, wh, lens_b, hp, interpret):
    t_max, bsz, four_hp = xw.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, four_hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, four_hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, four_hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, bsz, four_hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_b, xw, wh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_layer_pallas_ad(xw, wh, lengths, hidden: int, interpret: bool = False):
    """Differentiable fused LSTM layer (padded layout, like lstm_layer_pallas).

    Returns hs [T, B, hidden].
    """
    hs, _ = _fwd_rule(xw, wh, lengths, hidden, interpret)
    return hs


def _fwd_rule(xw, wh, lengths, hidden: int, interpret: bool):
    t_max, bsz, four_hp = xw.shape
    hp = four_hp // 4
    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    out, gates, cc, hc = _forward_with_residuals(xw, wh, lens_b, hp, interpret)
    hs = out[:, :, :hidden]
    return hs, (wh, lens_b, gates, cc, hc, t_max, bsz, hp)


def _bwd_rule(hidden: int, interpret: bool, res, dhs):
    wh, lens_b, gates, cc, hc, t_max, bsz, hp = res
    if dhs.shape[-1] != hp:
        dhs = jnp.pad(dhs, ((0, 0), (0, 0), (0, hp - dhs.shape[-1])))
    four_hp = 4 * hp
    rev = lambda t: (t_max - 1 - t, 0, 0)
    rev_prev = lambda t: (jnp.maximum(t_max - 2 - t, 0), 0, 0)
    dxw, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, four_hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, four_hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bsz, four_hp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, four_hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, bsz, four_hp), jnp.float32),
            jax.ShapeDtypeStruct((hp, four_hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((hp, four_hp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_b, gates, cc, cc, hc, dhs, wh)
    dlengths = np.zeros((lens_b.shape[0],), dtype=jax.dtypes.float0)
    return dxw, dwh, dlengths


lstm_layer_pallas_ad.defvjp(_fwd_rule, _bwd_rule)
