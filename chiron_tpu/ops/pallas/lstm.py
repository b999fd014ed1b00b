"""Fused LSTM layer as a single Pallas TPU kernel.

Motivation (measured on the target chip): a ``lax.scan`` LSTM step costs
~16-60us of per-iteration kernel-launch latency, so a T=400 layer burns
~26ms while the actual MXU work is ~0.4us/step. This kernel runs the WHOLE
recurrence inside one ``pallas_call``: the time axis is the grid (TPU grid
iterations execute in order with automatically double-buffered block DMA),
the hidden/cell state lives in VMEM scratch across iterations, and each
step is one [B,H]x[H,4H] MXU matmul plus VPU gate math — per-step cost
drops to DMA-streaming speed (~1-3us).

Layout notes:
* H is padded to a multiple of 128 lanes (H=100 -> 128) OUTSIDE the kernel;
  the padded weight columns/rows are zero so results are exact.
* Input projections xw = x @ wx + b are precomputed as one large MXU matmul
  (XLA), shaped [T, B, 4*Hp]; the kernel consumes one [B, 4*Hp] block per
  grid step.
* Sequence-length masking (dynamic_rnn parity: zero outputs past the
  length, frozen state) uses a [B, 128]-broadcast length array compared
  against the grid index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FORGET_BIAS = 1.0
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lstm_kernel(lens_ref, starts_ref, xw_ref, wh_ref, out_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    gates = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h_scr[:], wh_ref[:], preferred_element_type=jnp.float32
    )
    hp = h_scr.shape[-1]
    i = gates[:, 0 * hp:1 * hp]
    g = gates[:, 1 * hp:2 * hp]
    f = gates[:, 2 * hp:3 * hp]
    o = gates[:, 3 * hp:4 * hp]
    new_c = jax.nn.sigmoid(f + _FORGET_BIAS) * c_scr[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    # active window per row: starts <= t < starts + lens (starts is 0 for a
    # forward pass; T-len for a flip-reversed backward pass — see
    # models/rnn.py:birnn_stack; the state stays frozen at zero before it)
    active = (starts_ref[:] <= t) & (starts_ref[:] + lens_ref[:] > t)
    mask = active.astype(new_h.dtype)  # [B, LANE] broadcast block
    if hp == LANE:
        mask_h = mask
    else:
        mask_h = jnp.broadcast_to(mask[:, :1], new_h.shape)
    c_scr[:] = mask_h * new_c + (1.0 - mask_h) * c_scr[:]
    masked_h = mask_h * new_h
    # output storage dtype follows xw (bf16 under bf16 inference mode);
    # the carried state stays float32
    out_ref[0] = masked_h.astype(out_ref.dtype)
    h_scr[:] = masked_h + (1.0 - mask_h) * h_scr[:]


def pad_gate_cols(w: jnp.ndarray, h: int) -> jnp.ndarray:
    """Pad each of the 4 gate column-blocks of a [..., 4H] array to Hp."""
    hp = _round_up(h, LANE)
    if hp == h:
        return w
    lead = w.shape[:-1]
    w4 = w.reshape(lead + (4, h))
    pad = [(0, 0)] * len(lead) + [(0, 0), (0, hp - h)]
    return jnp.pad(w4, pad).reshape(lead + (4 * hp,))


def pad_lstm_weights(wx: jnp.ndarray, wh: jnp.ndarray, b: jnp.ndarray, h: int):
    """Pad (wx, wh, b) to the lane-aligned layout the kernel consumes.

    The padded rows/columns are zero, so the recurrence is exact: padded h
    lanes stay 0 through tanh/sigmoid gating because their input gate i is
    sigmoid(0)=0.5 but g=tanh(0)=0 -> c stays 0 -> h stays 0.
    """
    hp = _round_up(h, LANE)
    wx_p = pad_gate_cols(wx, h)
    b_p = pad_gate_cols(b, h)
    wh_p = pad_gate_cols(wh, h)
    if hp != h:
        wh_p = jnp.pad(wh_p, ((0, hp - h), (0, 0)))
    return wx_p, wh_p, b_p


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def lstm_layer_pallas(
    xw: jnp.ndarray,
    wh: jnp.ndarray,
    lengths: jnp.ndarray,
    hidden: int | None = None,
    interpret: bool = False,
    starts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run a full LSTM recurrence over precomputed input projections.

    Args:
      xw: [T, B, 4*Hp] float32 — x @ wx + b for every timestep, already in
        the padded gate layout (see pad_lstm_weights). If ``hidden`` is
        None it is taken as Hp (i.e. unpadded input with lane-aligned H).
      wh: [Hp, 4*Hp] float32 recurrent kernel (padded layout).
      lengths: [B] int32 valid lengths.
      hidden: true (unpadded) hidden size; output is sliced back to it.
      interpret: run in the Pallas interpreter (for CPU tests).
    Returns:
      hs [T, B, hidden] float32 (outputs past each length are zero).
    """
    t_max, bsz, four_hp = xw.shape
    hp = four_hp // 4
    h = hidden if hidden is not None else hp
    if hp != _round_up(h, LANE) or wh.shape != (hp, 4 * hp):
        raise ValueError(
            f"xw/wh must be in padded layout: got xw 4H={four_hp}, wh "
            f"{wh.shape}, hidden={h}; use pad_lstm_weights first"
        )
    xw_p, wh_p = xw, wh

    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    if starts is None:
        starts_b = jnp.zeros((bsz, LANE), jnp.int32)
    else:
        starts_b = jnp.broadcast_to(starts[:, None], (bsz, LANE)).astype(jnp.int32)

    out = pl.pallas_call(
        _lstm_kernel,
        grid=(t_max,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            # xw streams in its own dtype (bf16 under bf16 inference mode:
            # halves the dominant per-step DMA), upcast to f32 in-kernel
            pl.BlockSpec((1, bsz, 4 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_max, bsz, hp), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((bsz, hp), jnp.float32),
            pltpu.VMEM((bsz, hp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_b, starts_b, xw_p, wh_p)
    return out[:, :, :h]


TIME_CHUNK = 8


def _bilstm_kernel(chunk, lens_ref, starts_ref, xwf_ref, xwb_ref, whf_ref,
                   whb_ref, outf_ref, outb_ref, hf_scr, cf_scr, hb_scr,
                   cb_scr):
    """Both directions of one BiLSTM layer, ``chunk`` timesteps per grid step.

    The forward rows run with start 0; the backward rows consume the
    time-FLIPPED sequence with per-row start T-len (models/rnn.py
    _flip_reversal). Fusing the two directions into one program and
    chunking the time axis amortises the per-grid-iteration bookkeeping,
    which dominates over the small MXU matmuls at H=128 (same trick as the
    beam traceback kernel's TRACE_CHUNK).
    """
    tc = pl.program_id(0)

    @pl.when(tc == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)
        cb_scr[:] = jnp.zeros_like(cb_scr)

    hp = hf_scr.shape[-1]

    def half(j, t, xw_ref, wh_ref, h_scr, c_scr, out_ref, active):
        gates = xw_ref[j].astype(jnp.float32) + jnp.dot(
            h_scr[:], wh_ref[:], preferred_element_type=jnp.float32
        )
        i = gates[:, 0 * hp:1 * hp]
        g = gates[:, 1 * hp:2 * hp]
        f = gates[:, 2 * hp:3 * hp]
        o = gates[:, 3 * hp:4 * hp]
        new_c = (jax.nn.sigmoid(f + _FORGET_BIAS) * c_scr[:]
                 + jax.nn.sigmoid(i) * jnp.tanh(g))
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        mask = active.astype(new_h.dtype)
        if hp != LANE:
            mask = jnp.broadcast_to(mask[:, :1], new_h.shape)
        c_scr[:] = mask * new_c + (1.0 - mask) * c_scr[:]
        masked_h = mask * new_h
        out_ref[j] = masked_h.astype(out_ref.dtype)
        h_scr[:] = masked_h + (1.0 - mask) * h_scr[:]

    lens = lens_ref[:]
    starts = starts_ref[:]
    for j in range(chunk):
        t = tc * chunk + j
        half(j, t, xwf_ref, whf_ref, hf_scr, cf_scr, outf_ref, lens > t)
        half(j, t, xwb_ref, whb_ref, hb_scr, cb_scr, outb_ref,
             (starts <= t) & (starts + lens > t))


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def bilstm_layer_pallas(
    xw_fw: jnp.ndarray,
    xw_bw: jnp.ndarray,
    wh_fw: jnp.ndarray,
    wh_bw: jnp.ndarray,
    lengths: jnp.ndarray,
    starts_bw: jnp.ndarray,
    hidden: int | None = None,
    interpret: bool = False,
):
    """Fused bidirectional LSTM layer (inference path).

    Args mirror lstm_layer_pallas, duplicated per direction; ``xw_bw`` must
    already be the time-flipped projection and ``starts_bw`` = T - len.
    Returns (hs_fw, hs_bw) each [T, B, hidden]; hs_bw is in flipped time
    order (caller flips back).
    """
    t_max, bsz, four_hp = xw_fw.shape
    hp = four_hp // 4
    h = hidden if hidden is not None else hp
    if hp != _round_up(h, LANE) or wh_fw.shape != (hp, 4 * hp):
        raise ValueError("weights must be in padded layout (pad_lstm_weights)")

    # pad time to a multiple of TIME_CHUNK; padded steps are inactive for
    # every row (fw: t >= len; bw: t >= start+len = T) so state is frozen
    # and the padded outputs (zero) are sliced off below
    tc = TIME_CHUNK
    t_pad = -(-t_max // tc) * tc
    if t_pad != t_max:
        pad = ((0, t_pad - t_max), (0, 0), (0, 0))
        xw_fw = jnp.pad(xw_fw, pad)
        xw_bw = jnp.pad(xw_bw, pad)

    lens_b = jnp.broadcast_to(lengths[:, None], (bsz, LANE)).astype(jnp.int32)
    starts_b = jnp.broadcast_to(starts_bw[:, None], (bsz, LANE)).astype(jnp.int32)

    outf, outb = pl.pallas_call(
        functools.partial(_bilstm_kernel, tc),
        grid=(t_pad // tc,),
        in_specs=[
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bsz, 4 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bsz, 4 * hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 4 * hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, bsz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, bsz, hp), xw_fw.dtype),
            jax.ShapeDtypeStruct((t_pad, bsz, hp), xw_bw.dtype),
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
    )(lens_b, starts_b, xw_fw, xw_bw, wh_fw, wh_bw)
    return outf[:t_max, :, :h], outb[:t_max, :, :h]


def lstm_scan_reference(params, xw, mask):
    """XLA-scan reference used for cross-checking (rnn._lstm_scan clone)."""
    from chiron_tpu.models.rnn import _lstm_scan

    return _lstm_scan(params, xw, mask)
