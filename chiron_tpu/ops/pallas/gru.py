"""Fused GRU layer as a single Pallas TPU kernel.

Same design as ops/pallas/lstm.py (reference cell semantics:
tf.nn.rnn_cell.GRUCell as selected via chiron/rnn.py:30-33): the time axis
is the kernel grid, the hidden state lives in VMEM scratch across grid
steps, and the gate/candidate input projections are precomputed outside as
two large MXU matmuls. Each grid step does the two small recurrent matmuls
([B,Hp]x[Hp,2Hp] for the r/u gates, [B,Hp]x[Hp,Hp] for the candidate) plus
VPU gate math.

Padding: H -> Hp (multiple of 128 lanes) with zero-padded weight/bias
columns. Padded lanes stay exactly zero through the recurrence: gates on a
padded lane are sigmoid(0)=0.5 but the candidate is tanh(0)=0 and h starts
at 0, so new_h = 0.5*0 + 0.5*0 = 0.

Training uses the lax.scan path (pallas_call has no autodiff); this kernel
is inference-only, gated in models/rnn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_cols(w: jnp.ndarray, h: int, ngates: int) -> jnp.ndarray:
    """Pad each of the ``ngates`` gate column-blocks of [..., ngates*H] to Hp."""
    hp = _round_up(h, LANE)
    if hp == h:
        return w
    lead = w.shape[:-1]
    wg = w.reshape(lead + (ngates, h))
    pad = [(0, 0)] * len(lead) + [(0, 0), (0, hp - h)]
    return jnp.pad(wg, pad).reshape(lead + (ngates * hp,))


def pad_gru_weights(params, h: int):
    """Pad a GRU cell param dict (models/rnn.py:init_gru_cell) for the kernel."""
    hp = _round_up(h, LANE)
    wxg = _pad_cols(params["wx_g"], h, 2)
    bg = _pad_cols(params["b_g"], h, 2)
    whg = _pad_cols(params["wh_g"], h, 2)
    wxc = _pad_cols(params["wx_c"], h, 1)
    bc = _pad_cols(params["b_c"], h, 1)
    whc = _pad_cols(params["wh_c"], h, 1)
    if hp != h:
        whg = jnp.pad(whg, ((0, hp - h), (0, 0)))
        whc = jnp.pad(whc, ((0, hp - h), (0, 0)))
    return wxg, whg, bg, wxc, whc, bc


def _gru_kernel(lens_ref, starts_ref, gx_ref, cx_ref, whg_ref, whc_ref, out_ref, h_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    hp = h_scr.shape[-1]
    gates = jax.nn.sigmoid(
        gx_ref[0] + jnp.dot(h, whg_ref[:], preferred_element_type=jnp.float32)
    )
    r = gates[:, 0 * hp:1 * hp]
    u = gates[:, 1 * hp:2 * hp]
    cand = jnp.tanh(
        cx_ref[0] + jnp.dot(r * h, whc_ref[:], preferred_element_type=jnp.float32)
    )
    new_h = u * h + (1.0 - u) * cand
    # active window per row: starts <= t < starts + lens (see lstm.py)
    active = (starts_ref[:] <= t) & (starts_ref[:] + lens_ref[:] > t)
    mask = active.astype(new_h.dtype)  # [B, LANE] broadcast block
    if hp == LANE:
        mask_h = mask
    else:
        mask_h = jnp.broadcast_to(mask[:, :1], new_h.shape)
    masked_h = mask_h * new_h
    out_ref[0] = masked_h
    h_scr[:] = masked_h + (1.0 - mask_h) * h


def _bigru_kernel(lens_ref, starts_ref, gxf_ref, cxf_ref, gxb_ref, cxb_ref,
                  whgf_ref, whcf_ref, whgb_ref, whcb_ref,
                  outf_ref, outb_ref, hf_scr, hb_scr):
    """Both directions of one BiGRU layer per grid step (see lstm.py
    _bilstm_kernel: the backward rows consume the time-flipped sequence
    with per-row start T-len; fusing halves per-step bookkeeping)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)

    hp = hf_scr.shape[-1]

    def half(gx_ref, cx_ref, whg_ref, whc_ref, h_scr, out_ref, active):
        h = h_scr[:]
        gates = jax.nn.sigmoid(
            gx_ref[0] + jnp.dot(h, whg_ref[:], preferred_element_type=jnp.float32)
        )
        r = gates[:, 0 * hp:1 * hp]
        u = gates[:, 1 * hp:2 * hp]
        cand = jnp.tanh(
            cx_ref[0] + jnp.dot(r * h, whc_ref[:],
                                preferred_element_type=jnp.float32)
        )
        new_h = u * h + (1.0 - u) * cand
        mask = active.astype(new_h.dtype)
        if hp != LANE:
            mask = jnp.broadcast_to(mask[:, :1], new_h.shape)
        masked_h = mask * new_h
        out_ref[0] = masked_h
        h_scr[:] = masked_h + (1.0 - mask) * h

    lens = lens_ref[:]
    half(gxf_ref, cxf_ref, whgf_ref, whcf_ref, hf_scr, outf_ref, lens > t)
    starts = starts_ref[:]
    half(gxb_ref, cxb_ref, whgb_ref, whcb_ref, hb_scr, outb_ref,
         (starts <= t) & (starts + lens > t))


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def bigru_layer_pallas(
    gx_fw: jnp.ndarray,
    cx_fw: jnp.ndarray,
    gx_bw: jnp.ndarray,
    cx_bw: jnp.ndarray,
    wh_fw: tuple,
    wh_bw: tuple,
    lengths: jnp.ndarray,
    starts_bw: jnp.ndarray,
    hidden: int,
    interpret: bool = False,
):
    """Fused bidirectional GRU layer (inference path).

    ``gx_bw``/``cx_bw`` must be projections of the time-FLIPPED input and
    ``starts_bw`` = T - len. ``wh_fw``/``wh_bw`` are (whg, whc) pairs.
    Returns (hs_fw, hs_bw) with hs_bw still in flipped time order.
    """
    whg_f, whc_f = wh_fw
    whg_b, whc_b = wh_bw
    t_max, bsz, two_hp = gx_fw.shape
    hp = two_hp // 2
    if hp != _round_up(hidden, LANE) or whg_f.shape != (hp, 2 * hp):
        raise ValueError("weights must be in padded layout (pad_gru_weights)")
    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    starts_b = jnp.broadcast_to(starts_bw[:, None], (bsz, LANE)).astype(jnp.int32)

    outf, outb = pl.pallas_call(
        _bigru_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, 2 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, 2 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_b, starts_b, gx_fw, cx_fw, gx_bw, cx_bw,
      whg_f, whc_f, whg_b, whc_b)
    return outf[:, :, :hidden], outb[:, :, :hidden]


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def gru_layer_pallas(
    gx: jnp.ndarray,
    cx: jnp.ndarray,
    whg: jnp.ndarray,
    whc: jnp.ndarray,
    lengths: jnp.ndarray,
    hidden: int,
    interpret: bool = False,
    starts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run a full GRU recurrence over precomputed input projections.

    Args:
      gx: [T, B, 2*Hp] float32 — x @ wx_g + b_g (padded layout).
      cx: [T, B, Hp] float32 — x @ wx_c + b_c (padded layout).
      whg: [Hp, 2*Hp] recurrent gate kernel; whc: [Hp, Hp] candidate kernel.
      lengths: [B] int32 valid lengths.
      hidden: true (unpadded) hidden size; output is sliced back to it.
    Returns:
      hs [T, B, hidden] float32 (outputs past each length are zero).
    """
    t_max, bsz, two_hp = gx.shape
    hp = two_hp // 2
    if hp != _round_up(hidden, LANE) or whg.shape != (hp, 2 * hp) or whc.shape != (hp, hp):
        raise ValueError(
            f"gx/whg/whc must be in padded layout: got gx 2H={two_hp}, "
            f"whg {whg.shape}, whc {whc.shape}, hidden={hidden}; "
            "use pad_gru_weights first"
        )
    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    if starts is None:
        starts_b = jnp.zeros((bsz, LANE), jnp.int32)
    else:
        starts_b = jnp.broadcast_to(starts[:, None], (bsz, LANE)).astype(jnp.int32)

    out = pl.pallas_call(
        _gru_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, 2 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, bsz, hp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bsz, hp), jnp.float32)],
        interpret=interpret,
    )(lens_b, starts_b, gx, cx, whg, whc)
    return out[:, :, :hidden]
