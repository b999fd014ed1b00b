"""Fused batch-normalized LSTM (arxiv 1603.09025) as a Pallas TPU kernel.

Mirrors ops/pallas/lstm.py but with the recurrent batch normalization of
the reference's BNLSTMCell (chiron/utils/lstm.py:61-151, as re-designed in
models/rnn.py:_bnlstm_scan): per step, the input projection x@wx and the
recurrent projection h@wh are batch-normalized independently (current-batch
moments over the still-active rows), the shared bias is added after
normalization, and the new cell state is normalized again before the output
tanh. Batch sits on the sublane axis, so the per-column moments are cheap
sublane-tree reductions.

Numerics match the scan to float32 round-off (moment reductions are
reassociated); padded H lanes stay exactly zero because their BN scales are
zero-padded. Training uses the lax.scan path (pallas_call has no autodiff);
this kernel is inference-only, gated in models/rnn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chiron_tpu.ops.pallas.lstm import pad_gate_cols, _round_up

_FORGET_BIAS = 1.0
_BN_EPS = 1e-5
LANE = 128


def pad_bnlstm_weights(params, h: int):
    """Pad a BNLSTM param dict (models/rnn.py:init_bnlstm_cell) for the kernel."""
    hp = _round_up(h, LANE)
    wx = pad_gate_cols(params["wx"], h)
    wh = pad_gate_cols(params["wh"], h)
    b = pad_gate_cols(params["b"], h)
    sx = pad_gate_cols(params["scale_x"], h)
    sh = pad_gate_cols(params["scale_h"], h)
    sc = params["scale_c"]
    oc = params["offset_c"]
    if hp != h:
        wh = jnp.pad(wh, ((0, hp - h), (0, 0)))
        sc = jnp.pad(sc, (0, hp - h))
        oc = jnp.pad(oc, (0, hp - h))
    return wx, wh, b, sx, sh, sc, oc


def _bn_step(x, scale, m, count):
    """Normalize columns over the masked batch (sublane) axis."""
    mean = jnp.sum(x * m, axis=0, keepdims=True) / count
    var = jnp.sum(((x - mean) ** 2) * m, axis=0, keepdims=True) / count
    return (x - mean) * lax.rsqrt(var + _BN_EPS) * scale


def _bnlstm_kernel(lens_ref, xw_ref, wh_ref, vec_ref, out_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hp = h_scr.shape[-1]
    # vec_ref rows: 0 = b, 1 = scale_x, 2 = scale_h, 3 = scale_c|offset_c
    b = vec_ref[0:1, :]
    scale_x = vec_ref[1:2, :]
    scale_h = vec_ref[2:3, :]
    scale_c = vec_ref[3:4, 0 * hp:1 * hp]
    offset_c = vec_ref[3:4, 1 * hp:2 * hp]

    m = (lens_ref[:, :1] > t).astype(jnp.float32)  # [B, 1]
    count = jnp.maximum(jnp.sum(m), 1.0)

    bn_x = _bn_step(xw_ref[0], scale_x, m, count)
    hw = jnp.dot(h_scr[:], wh_ref[:], preferred_element_type=jnp.float32)
    bn_h = _bn_step(hw, scale_h, m, count)
    gates = bn_x + bn_h + b
    i = gates[:, 0 * hp:1 * hp]
    g = gates[:, 1 * hp:2 * hp]
    f = gates[:, 2 * hp:3 * hp]
    o = gates[:, 3 * hp:4 * hp]
    new_c = jax.nn.sigmoid(f + _FORGET_BIAS) * c_scr[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
    bn_c = _bn_step(new_c, scale_c, m, count) + offset_c
    new_h = jax.nn.sigmoid(o) * jnp.tanh(bn_c)
    c_scr[:] = m * new_c + (1.0 - m) * c_scr[:]
    masked_h = m * new_h
    out_ref[0] = masked_h
    h_scr[:] = masked_h + (1.0 - m) * h_scr[:]


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def bnlstm_layer_pallas(
    xw: jnp.ndarray,
    wh: jnp.ndarray,
    b: jnp.ndarray,
    scale_x: jnp.ndarray,
    scale_h: jnp.ndarray,
    scale_c: jnp.ndarray,
    offset_c: jnp.ndarray,
    lengths: jnp.ndarray,
    hidden: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a full BN-LSTM recurrence over precomputed raw input projections.

    Args:
      xw: [T, B, 4*Hp] float32 — x @ wx WITHOUT bias (added post-BN), padded.
      wh: [Hp, 4*Hp]; b/scale_x/scale_h: [4*Hp]; scale_c/offset_c: [Hp].
      lengths: [B] int32 valid lengths.
      hidden: true (unpadded) hidden size; output is sliced back to it.
    Returns:
      hs [T, B, hidden] float32 (outputs past each length are zero).
    """
    t_max, bsz, four_hp = xw.shape
    hp = four_hp // 4
    if hp != _round_up(hidden, LANE) or wh.shape != (hp, 4 * hp):
        raise ValueError(
            f"xw/wh must be in padded layout: got xw 4H={four_hp}, wh "
            f"{wh.shape}, hidden={hidden}; use pad_bnlstm_weights first"
        )
    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    # pack the five parameter vectors into one [8, 4*Hp] block
    row3 = jnp.concatenate(
        [scale_c, offset_c, jnp.zeros((2 * hp,), jnp.float32)], axis=0
    )
    vec = jnp.stack([b, scale_x, scale_h, row3], axis=0)
    vec = jnp.pad(vec, ((0, 4), (0, 0)))  # sublane-align to 8 rows

    out = pl.pallas_call(
        _bnlstm_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, 4 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_b, xw, wh, vec)
    return out[:, :, :hidden]


BN_TIME_CHUNK = 8


def _bibnlstm_kernel(chunk, lens_ref, xwf_ref, xwb_ref, whf_ref, whb_ref,
                     vecf_ref, vecb_ref, outf_ref, outb_ref,
                     hf_scr, cf_scr, hb_scr, cb_scr):
    """Both directions of one Bi-BNLSTM layer, ``chunk`` steps per grid step.

    Unlike the flip-mode BiLSTM/BiGRU kernels, BOTH directions here mask on
    ``t < len``: the per-step batch-norm moments must be taken over exactly
    the rows TF's dynamic_rnn would have active, so the backward direction
    consumes the reverse_sequence-reversed input (models/rnn.py) rather
    than a flipped one. The fusion + time chunking amortises the
    per-grid-iteration bookkeeping that dominates at H=128.
    """
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)
        cb_scr[:] = jnp.zeros_like(cb_scr)

    hp = hf_scr.shape[-1]

    def unpack(vec_ref):
        return (vec_ref[0:1, :], vec_ref[1:2, :], vec_ref[2:3, :],
                vec_ref[3:4, 0 * hp:1 * hp], vec_ref[3:4, 1 * hp:2 * hp])

    pf = unpack(vecf_ref)
    pb = unpack(vecb_ref)

    def half(j, xw_ref, wh_ref, vec, h_scr, c_scr, out_ref, m, count):
        b, scale_x, scale_h, scale_c, offset_c = vec
        bn_x = _bn_step(xw_ref[j], scale_x, m, count)
        hw = jnp.dot(h_scr[:], wh_ref[:], preferred_element_type=jnp.float32)
        bn_h = _bn_step(hw, scale_h, m, count)
        gates = bn_x + bn_h + b
        i = gates[:, 0 * hp:1 * hp]
        g = gates[:, 1 * hp:2 * hp]
        f = gates[:, 2 * hp:3 * hp]
        o = gates[:, 3 * hp:4 * hp]
        new_c = (jax.nn.sigmoid(f + _FORGET_BIAS) * c_scr[:]
                 + jax.nn.sigmoid(i) * jnp.tanh(g))
        bn_c = _bn_step(new_c, scale_c, m, count) + offset_c
        new_h = jax.nn.sigmoid(o) * jnp.tanh(bn_c)
        c_scr[:] = m * new_c + (1.0 - m) * c_scr[:]
        masked_h = m * new_h
        out_ref[j] = masked_h
        h_scr[:] = masked_h + (1.0 - m) * h_scr[:]

    lens = lens_ref[:, :1]
    for j in range(chunk):
        t = tc * chunk + j
        m = (lens > t).astype(jnp.float32)  # [B, 1]
        count = jnp.maximum(jnp.sum(m), 1.0)
        half(j, xwf_ref, whf_ref, pf, hf_scr, cf_scr, outf_ref, m, count)
        half(j, xwb_ref, whb_ref, pb, hb_scr, cb_scr, outb_ref, m, count)


def _pack_vec(b, scale_x, scale_h, scale_c, offset_c, hp):
    """[8, 4*Hp] parameter block: rows b / scale_x / scale_h / (sc|oc)."""
    row3 = jnp.concatenate(
        [scale_c, offset_c, jnp.zeros((2 * hp,), jnp.float32)], axis=0
    )
    vec = jnp.stack([b, scale_x, scale_h, row3], axis=0)
    return jnp.pad(vec, ((0, 4), (0, 0)))


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def bibnlstm_layer_pallas(
    xw_fw: jnp.ndarray,
    xw_bw: jnp.ndarray,
    fw_weights,
    bw_weights,
    lengths: jnp.ndarray,
    hidden: int,
    interpret: bool = False,
):
    """Fused bidirectional BN-LSTM layer (inference path).

    Args:
      xw_fw / xw_bw: [T, B, 4*Hp] raw input projections (NO bias), the
        backward one already reverse_sequence-reversed.
      fw_weights / bw_weights: (wh, b, scale_x, scale_h, scale_c, offset_c)
        per direction, in the padded layout from pad_bnlstm_weights.
      lengths: [B] int32; hidden: true (unpadded) hidden size.
    Returns (hs_fw, hs_bw) each [T, B, hidden]; hs_bw is in reversed time
    order (caller reverses back).
    """
    t_max, bsz, four_hp = xw_fw.shape
    hp = four_hp // 4
    wh_fw = fw_weights[0]
    if hp != _round_up(hidden, LANE) or wh_fw.shape != (hp, 4 * hp):
        raise ValueError("weights must be in padded layout (pad_bnlstm_weights)")

    tc = BN_TIME_CHUNK
    t_pad = -(-t_max // tc) * tc
    if t_pad != t_max:
        pad = ((0, t_pad - t_max), (0, 0), (0, 0))
        xw_fw = jnp.pad(xw_fw, pad)
        xw_bw = jnp.pad(xw_bw, pad)

    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    vec_fw = _pack_vec(*fw_weights[1:], hp)
    vec_bw = _pack_vec(*bw_weights[1:], hp)

    outf, outb = pl.pallas_call(
        functools.partial(_bibnlstm_kernel, tc),
        grid=(t_pad // tc,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bsz, 4 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bsz, 4 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, bsz, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, bsz, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lens_b, xw_fw, xw_bw, wh_fw, bw_weights[0], vec_fw, vec_bw)
    return outf[:t_max, :, :hidden], outb[:t_max, :, :hidden]
