"""CTC prefix beam search as fused Pallas TPU kernels.

The XLA implementation (chiron_tpu/ops/ctc_beam.py) pays per-timestep
kernel-launch latency for ~15 ops/step (candidate scoring, hash-equality
merge, lax.top_k sort, gathers) — ~0.8ms/step, 326ms for T=400. These
kernels run the whole search in TWO pallas programs:

* ``_beam_kernel``: grid (batch_tiles, T); per grid step the full candidate
  expansion, merge, and an unrolled W-iteration argmax top-k happen on VPU
  registers/VMEM, with beam state persisting in VMEM scratch across the
  time axis. Emits per-step (parent, char) traceback records.
* ``_traceback_kernel``: grid (batch_tiles, T) in reverse time order,
  following the best beam's parent chain with one-hot lane selects.

Candidate layout per batch row (256 lanes): lanes [0,32) hold the W stay
candidates; lanes [32*(c+1), 32*(c+2)) hold extend-with-label-c candidates.
Lane arithmetic (lane//32, lane%32) recovers (char, parent) after top-k.

Semantics are identical to ops/ctc_beam.py (same scoring, same rolling-hash
merge, ties broken toward the lowest candidate index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chiron_tpu.config import BLANK

_NEG = -1e30
_H1_MULT = np.int32(-1640531535)  # 2654435761 as int32 (same bits)
_H2_MULT = np.int32(0x01000193)
NLAB = 4  # non-blank labels
SEG = 32  # candidate segment width (>= W)
NSEG = NLAB + 1
CAND = SEG * NSEG  # 160 -> padded to 256 lanes
CAND_PAD = 256


def _lae(a, b):
    """logaddexp guarded for -1e30 sentinels."""
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return jnp.where(mx <= _NEG / 2, _NEG, mx + jnp.log1p(jnp.exp(mn - mx)))


def _beam_kernel(w, lens_ref, lp_ref, trace_ref,
                 pb_s, pnb_s, h1_s, h2_s, last_s):
    # w is a STATIC python int (beam width baked into the program)
    t = pl.program_id(1)
    tb = pb_s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, SEG), 1)
    live = lane < w  # [TB, SEG] valid beam slots

    @pl.when(t == 0)
    def _():
        pb_s[:] = jnp.where(lane == 0, 0.0, _NEG)
        pnb_s[:] = jnp.full((tb, SEG), _NEG)
        h1_s[:] = jnp.where(lane == 0, 1, lane * 7919 + 3)
        h2_s[:] = jnp.where(lane == 0, 1, lane * 104729 + 5)
        last_s[:] = jnp.full((tb, SEG), -1, jnp.int32)

    pb = pb_s[:]
    pnb = pnb_s[:]
    h1 = h1_s[:]
    h2 = h2_s[:]
    last = last_s[:]

    lp = lp_ref[0]  # [TB, 8] (5 classes padded to 8 lanes)
    lp_blank = lp[:, BLANK:BLANK + 1]  # [TB, 1]
    # lp at each beam's last label via 4-way select (no gathers on TPU)
    lp_last = jnp.full((tb, SEG), 0.0)
    for c in range(NLAB):
        lp_last = jnp.where(last == c, lp[:, c:c + 1], lp_last)

    pb_or_pnb = _lae(pb, pnb)
    stay_pb = pb_or_pnb + lp_blank
    stay_pnb = jnp.where(last >= 0, pnb + lp_last, _NEG)
    stay_pb = jnp.where(live, stay_pb, _NEG)
    stay_pnb = jnp.where(live, stay_pnb, _NEG)

    ext_pnb = []
    ext_h1 = []
    ext_h2 = []
    for c in range(NLAB):
        base = jnp.where(last == c, pb, pb_or_pnb)
        e = lp[:, c:c + 1] + base
        ext_pnb.append(jnp.where(live, e, _NEG))
        ext_h1.append(h1 * _H1_MULT + (c + 1))
        ext_h2.append(h2 * _H2_MULT + (c + 1))

    # ---- merge extends into equal-hash stays (pairwise, lane-packed) -----
    # All four labels share one [TB, SEG, 4*SEG] matrix: lane group c holds
    # the (ext-with-label-c, stay) comparisons. 4*SEG = 128 lanes exactly,
    # so no lane padding is wasted (a per-label [.., SEG] matrix pads 4x).
    live_i = live.astype(jnp.int32)  # i1 minor-dim inserts unsupported
    glane = jax.lax.broadcasted_iota(jnp.int32, (tb, SEG, 4 * SEG), 2)
    cplus1 = glane // SEG + 1                      # label c+1 per lane group
    h1_stay = jnp.concatenate([h1] * NLAB, axis=1)[:, None, :]   # [TB,1,128]
    h2_stay = jnp.concatenate([h2] * NLAB, axis=1)[:, None, :]
    live_stay = jnp.concatenate([live_i] * NLAB, axis=1)[:, None, :]
    # extend-side quantities in sublane orientation (one relayout each)
    h1k = (h1 * _H1_MULT)[:, :, None]
    h2k = (h2 * _H2_MULT)[:, :, None]
    pb_ins = pb[:, :, None]
    pon_ins = pb_or_pnb[:, :, None]
    last_ins = last[:, :, None]
    lp_lane = jnp.concatenate(
        [jnp.broadcast_to(lp[:, c:c + 1], (tb, SEG)) for c in range(NLAB)],
        axis=1,
    )[:, None, :]                                   # [TB, 1, 128]
    ext_pnb_m = lp_lane + jnp.where(last_ins == cplus1 - 1, pb_ins, pon_ins)
    eq = (
        (h1k + cplus1 == h1_stay)
        & (h2k + cplus1 == h2_stay)
        & (ext_pnb_m > _NEG / 2)
        & (live_i[:, :, None] > 0)
        & (live_stay > 0)
    )
    contrib = jnp.where(eq, ext_pnb_m, _NEG)       # [TB, SEG, 128]
    m_all = jnp.max(contrib, axis=1)               # [TB, 128] per (c, stay)
    s_all = jnp.sum(jnp.where(eq, jnp.exp(contrib - m_all[:, None, :]), 0.0), axis=1)
    merged_all = jnp.where(
        m_all > _NEG / 2, m_all + jnp.log(jnp.maximum(s_all, 1e-37)), _NEG
    )
    merged_total = jnp.full((tb, SEG), _NEG)
    killed = []
    for c in range(NLAB):
        merged_total = _lae(merged_total, merged_all[:, c * SEG:(c + 1) * SEG])
        killed.append(jnp.any(eq[:, :, c * SEG:(c + 1) * SEG], axis=2))
    stay_pnb = _lae(stay_pnb, merged_total)

    # ---- assemble candidate lanes [TB, CAND_PAD] -------------------------
    neg_tail = jnp.full((tb, CAND_PAD - CAND), _NEG)
    zeros_tail_i = jnp.zeros((tb, CAND_PAD - CAND), jnp.int32)
    cand_pb = jnp.concatenate(
        [stay_pb] + [jnp.full((tb, SEG), _NEG)] * NLAB + [neg_tail], axis=1
    )
    cand_pnb = jnp.concatenate(
        [stay_pnb]
        + [jnp.where(killed[c], _NEG, ext_pnb[c]) for c in range(NLAB)]
        + [neg_tail],
        axis=1,
    )
    cand_h1 = jnp.concatenate([h1] + ext_h1 + [zeros_tail_i], axis=1)
    cand_h2 = jnp.concatenate([h2] + ext_h2 + [zeros_tail_i], axis=1)
    cand_last = jnp.concatenate(
        [last] + [jnp.full((tb, SEG), c, jnp.int32) for c in range(NLAB)]
        + [zeros_tail_i],
        axis=1,
    )
    score = _lae(cand_pb, cand_pnb)

    cl = jax.lax.broadcasted_iota(jnp.int32, (tb, CAND_PAD), 1)

    # ---- top-k phase 1: collect the k-th argmax indices ------------------
    # Iterative extract-max is inherently sequential but each iteration is
    # only ~5 ops; all state gathering is deferred to one vectorized pass.
    # w is static, so exactly w iterations are emitted.
    idx_cols = []
    live_cols = []
    for k in range(w):
        m = jnp.max(score, axis=1, keepdims=True)  # [TB, 1]
        idx = jnp.min(jnp.where(score >= m, cl, CAND_PAD), axis=1, keepdims=True)
        idx_cols.append(idx)
        live_cols.append((m > _NEG / 2).astype(jnp.int32))  # i1 concat unsupported
        score = jnp.where(cl == idx, _NEG, score)
    if w < SEG:  # inert tail slots
        idx_cols.append(jnp.zeros((tb, SEG - w), jnp.int32))
        live_cols.append(jnp.zeros((tb, SEG - w), jnp.int32))
    idx_all = jnp.concatenate(idx_cols, axis=1)    # [TB, SEG]
    picked_live = jnp.concatenate(live_cols, axis=1) > 0  # [TB, SEG]

    # ---- top-k phase 2: one 3D one-hot gather for all slots --------------
    # A slot with no live candidate receives a FRESH garbage hash (derived
    # from (t, k)) — otherwise it would copy candidate 0's hash and a later
    # merge could resurrect a duplicate prefix.
    onehot3 = idx_all[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (tb, SEG, CAND_PAD), 2
    )  # [TB, SEG, CAND_PAD]

    def pick_f(arr):
        return jnp.sum(jnp.where(onehot3, arr[:, None, :], 0.0), axis=2)

    def pick_i(arr):
        return jnp.sum(jnp.where(onehot3, arr[:, None, :], 0), axis=2)

    kcol = jax.lax.broadcasted_iota(jnp.int32, (tb, SEG), 1)
    valid = live & picked_live  # live == (kcol < w)
    garbage1 = (t * 131 + kcol) * 7919 + 1000003
    garbage2 = (t * 131 + kcol) * 104729 + 666
    new_pb = jnp.where(valid, pick_f(cand_pb), _NEG)
    new_pnb = jnp.where(valid, pick_f(cand_pnb), _NEG)
    new_h1 = jnp.where(valid, pick_i(cand_h1), garbage1)
    new_h2 = jnp.where(valid, pick_i(cand_h2), garbage2)
    new_last = jnp.where(valid, pick_i(cand_last), -1)
    parents = jnp.where(valid, idx_all % SEG, kcol)
    chars = jnp.where(valid, idx_all // SEG - 1, -1)

    # ---- freeze past each row's length -----------------------------------
    active = lens_ref[:, :1] > t  # [TB, 1]
    pb_s[:] = jnp.where(active, new_pb, pb)
    pnb_s[:] = jnp.where(active, new_pnb, pnb)
    h1_s[:] = jnp.where(active, new_h1, h1)
    h2_s[:] = jnp.where(active, new_h2, h2)
    last_s[:] = jnp.where(active, new_last, last)
    wlane = jax.lax.broadcasted_iota(jnp.int32, (tb, SEG), 1)
    out_parent = jnp.where(active, parents, wlane)
    out_char = jnp.where(active, chars, -1)
    # pack (char, parent) into one int32 word: (char+1)*SEG + parent
    trace_ref[0] = (out_char + 1) * SEG + out_parent
    # NOTE: final beam scores are rematerialised outside from pb/pnb outputs


def _final_kernel(pb_ref, pnb_ref, score_ref):
    score_ref[:] = _lae(pb_ref[:], pnb_ref[:])


TRACE_CHUNK = 16


def _traceback_kernel(best_ref, trace_in_ref, out_ref, w_scr):
    """Follow the best beam's parent chain, TRACE_CHUNK steps per grid step.

    The per-step work is a handful of tiny selects, so the grid is chunked
    along time to amortise grid-iteration overhead (4x fewer steps ~= 4x
    faster end-to-end traceback).
    """
    t = pl.program_id(1)  # chunk index; chunk covers reverse-time order
    tb = w_scr.shape[0]

    @pl.when(t == 0)
    def _():
        w_scr[:] = best_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, SEG), 1)
    wcur = w_scr[:, :1]  # [TB, 1] current beam per row
    # the input block holds TRACE_CHUNK steps in FORWARD time order; walk
    # them backwards (the index map already reversed the chunk order)
    for j in range(TRACE_CHUNK - 1, -1, -1):
        onehot = lane == wcur
        packed = trace_in_ref[j]  # [TB, SEG]: (char+1)*SEG + parent
        v = jnp.sum(jnp.where(onehot, packed, 0), axis=1, keepdims=True)
        out_ref[j] = jnp.broadcast_to(v // SEG - 1, (tb, SEG))
        wcur = v % SEG
    w_scr[:] = jnp.broadcast_to(wcur, (tb, SEG))


@functools.partial(
    jax.jit, static_argnames=("beam_width", "batch_tile", "interpret")
)
def beam_search_pallas(
    logits: jnp.ndarray,
    seq_lengths: jnp.ndarray,
    beam_width: int = 30,
    batch_tile: int = 128,
    interpret: bool = False,
):
    """Drop-in replacement for ops.ctc_beam.beam_search_decode on TPU.

    Returns (decoded [B,T] int32 -1-padded, lengths [B], log_prob [B]).
    """
    if beam_width > SEG:
        raise ValueError(f"beam_width must be <= {SEG}")
    bsz, t_max, nclass = logits.shape
    assert nclass == 5
    bp = -(-bsz // batch_tile) * batch_tile
    lp = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.pad(lp, ((0, bp - bsz), (0, 0), (0, 3)), constant_values=_NEG)
    lp = jnp.transpose(lp, (1, 0, 2))  # [T, Bp, 8]
    lens = jnp.pad(seq_lengths.astype(jnp.int32), (0, bp - bsz))
    lens_b = jnp.broadcast_to(lens[:, None], (bp, 128))

    n_tiles = bp // batch_tile

    (pb, pnb, trace) = pl.pallas_call(
        functools.partial(_beam_wrapper, beam_width),
        grid=(n_tiles, t_max),
        in_specs=[
            pl.BlockSpec((batch_tile, 128), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, 8), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((batch_tile, SEG), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, SEG), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch_tile, SEG), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, SEG), jnp.float32),
            jax.ShapeDtypeStruct((bp, SEG), jnp.float32),
            jax.ShapeDtypeStruct((t_max, bp, SEG), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, SEG), jnp.float32),
            pltpu.VMEM((batch_tile, SEG), jnp.float32),
            pltpu.VMEM((batch_tile, SEG), jnp.int32),
            pltpu.VMEM((batch_tile, SEG), jnp.int32),
            pltpu.VMEM((batch_tile, SEG), jnp.int32),
        ],
        interpret=interpret,
    )(lens_b, lp)

    final_score = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (bp, SEG), 1) < beam_width,
        _logaddexp_xla(pb, pnb),
        _NEG,
    )
    best = jnp.argmax(final_score, axis=1).astype(jnp.int32)
    log_prob = jnp.take_along_axis(final_score, best[:, None], axis=1)[:, 0]

    best_b = jnp.broadcast_to(best[:, None], (bp, SEG))
    # pad time to a multiple of TRACE_CHUNK with no-op records
    # (char -1, parent identity) so chunked traceback stays exact
    tc = TRACE_CHUNK
    t_pad = -(-t_max // tc) * tc
    if t_pad != t_max:
        wlane = jax.lax.broadcasted_iota(jnp.int32, (t_pad - t_max, bp, SEG), 2)
        noop = (0) * SEG + wlane  # (char=-1 +1)*SEG + parent=w  == w
        trace = jnp.concatenate([trace, noop], axis=0)
    n_chunks = t_pad // tc
    rev = pl.pallas_call(
        _traceback_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((batch_tile, SEG), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tc, batch_tile, SEG),
                lambda b, t: (n_chunks - 1 - t, b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tc, batch_tile, SEG), lambda b, t: (n_chunks - 1 - t, b, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, bp, SEG), jnp.int32),
        scratch_shapes=[pltpu.VMEM((batch_tile, SEG), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(best_b, trace)

    # rev[t, b, 0] = char emitted at time t (already forward order; padded
    # tail steps emitted -1)
    from chiron_tpu.ops.ctc_greedy import compact_labels

    fwd = rev[:t_max, :, 0].T[:bsz]  # [B, T]
    decoded, lengths = compact_labels(fwd, fwd >= 0)
    return decoded, lengths, log_prob[:bsz]


def _beam_wrapper(w, lens_ref, lp_ref, pb_out, pnb_out, trace_ref,
                  pb_s, pnb_s, h1_s, h2_s, last_s):
    _beam_kernel(w, lens_ref, lp_ref, trace_ref,
                 pb_s, pnb_s, h1_s, h2_s, last_s)
    # expose final state (written every step; last write wins)
    pb_out[:] = pb_s[:]
    pnb_out[:] = pnb_s[:]


def _logaddexp_xla(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return jnp.where(mx <= _NEG / 2, _NEG, mx + jnp.log1p(jnp.exp(mn - mx)))
