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
  following the best beam's parent chain with one-hot sublane selects.

Layout (the key to VPU efficiency): BATCH rides the 128-wide LANE axis and
beams/candidates ride the SUBLANE axis. TPU vregs are (8 sublanes x 128
lanes); a [seg, TB=128] state array packs vregs exactly, whereas the
transposed [TB, seg] form pads seg lanes up to 128 and wastes most of every
VPU op. The candidate axis only needs sublane granularity (multiple of 8),
so the pool is exactly CAND = (nlab+1)*seg rows — no padding to full lanes
(nlab = non-blank label count, 4 for ACGT, 5 for ACGTX methylation) — and
all cross-candidate reductions (top-k max, merge sums, one-hot gathers) are
cheap sublane trees instead of lane shuffles.

The segment height ``seg`` (beam-state rows) is the smallest multiple of 8
covering the beam width, so W=30 runs at seg=32 and the reference's
published beam-50 preset (README.md:146-149) runs at seg=56 instead of
falling off a 40x cliff onto the XLA path. Widths beyond MAX_SEG fall back
to XLA.

Candidate layout per lane (batch element): sublanes [0,seg) hold the W stay
candidates; sublanes [seg*(c+1), seg*(c+2)) hold extend-with-label-c
candidates. Row arithmetic (row//seg, row%seg) recovers (char, parent)
after top-k.

Semantics are identical to ops/ctc_beam.py (same scoring, same rolling-hash
merge, ties broken toward the lowest candidate index). Prefix identity uses
ONE 32-bit rolling hash (r5): the second hash of rounds 1-4 doubled the
int-state gathers and the merge compares — both on the measured [seg, seg,
TB] latency floor — to buy 2^-64 collision odds where 2^-32 (~1 demoted
beam entry per ~30 full batch decodes) is already far below the beam
search's own approximation noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_H1_MULT = np.int32(-1640531535)  # 2654435761 as int32 (same bits)
MAX_SEG = 64  # widest supported beam (merge matrix is [seg, seg, TB])
MAX_CLASS = 8  # classes ride the 8-sublane axis of the [8, TB] lp block


def seg_for(w: int) -> int:
    """Beam-state rows for width w: smallest multiple of 8 >= w."""
    return -(-w // 8) * 8


def _lae(a, b):
    """logaddexp guarded for -1e30 sentinels."""
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return jnp.where(mx <= _NEG / 2, _NEG, mx + jnp.log1p(jnp.exp(mn - mx)))


BEAM_CHUNK = 8


def _beam_kernel(w, seg, nlab, chunk, bonus, topk_mode, lens_ref, lp_ref,
                 trace_ref, pb_s, pnb_s, h_s, last_s, ph_s):
    """``chunk`` search steps per grid iteration.

    Chunking the time axis amortises the per-grid-step bookkeeping and
    lets the beam state live in registers across the unrolled sub-steps
    instead of bouncing through VMEM scratch every step.
    """
    # w, seg, nlab and chunk are STATIC python ints (baked into the program)
    tc = pl.program_id(1)
    tb = pb_s.shape[1]  # lane width = batch tile
    row = jax.lax.broadcasted_iota(jnp.int32, (seg, tb), 0)

    @pl.when(tc == 0)
    def _():
        pb_s[:] = jnp.where(row == 0, 0.0, _NEG)
        pnb_s[:] = jnp.full((seg, tb), _NEG)
        h_s[:] = jnp.where(row == 0, 1, row * 7919 + 3)
        last_s[:] = jnp.full((seg, tb), -1, jnp.int32)
        # hash of the prefix WITHOUT the last char; garbage until a beam
        # holds a non-empty string (never matches a real hash)
        ph_s[:] = row * 15485863 + 17

    state = (pb_s[:], pnb_s[:], h_s[:], last_s[:], ph_s[:])
    for j in range(chunk):
        state = _beam_step(w, seg, nlab, bonus, topk_mode, tc * chunk + j, j,
                           lens_ref, lp_ref, trace_ref, state)
    pb_s[:], pnb_s[:], h_s[:], last_s[:], ph_s[:] = state


def _beam_step(w, seg, nlab, bonus, topk_mode, t, j, lens_ref, lp_ref,
               trace_ref, state):
    pb, pnb, h, last, ph = state
    tb = pb.shape[1]
    cand = seg * (nlab + 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (seg, tb), 0)
    live = row < w  # [seg, TB] valid beam slots

    lp = lp_ref[j]  # [8, TB] (nlab+1 classes padded to 8 sublanes)
    lp_blank = lp[nlab:nlab + 1]  # [1, TB] (blank is the LAST class)
    # lp at each beam's last label via nlab-way select (no gathers on TPU)
    lp_last = jnp.full((seg, tb), 0.0)
    for c in range(nlab):
        lp_last = jnp.where(last == c, lp[c:c + 1], lp_last)

    pb_or_pnb = _lae(pb, pnb)
    stay_pb = pb_or_pnb + lp_blank
    stay_pnb = jnp.where(last >= 0, pnb + lp_last, _NEG)
    stay_pb = jnp.where(live, stay_pb, _NEG)
    stay_pnb = jnp.where(live, stay_pnb, _NEG)

    ext_pnb = []
    for c in range(nlab):
        base = jnp.where(last == c, pb, pb_or_pnb)
        e = lp[c:c + 1] + base + bonus
        ext_pnb.append(jnp.where(live, e, _NEG))

    # ---- merge extends into equal-hash stays (prefix-hash, [seg x seg]) --
    # An extend of parent X with label c produces stay Y's string iff
    # prefix(Y) == string(X) and last[Y] == c, so comparing X's FULL hash
    # against Y's PREFIX hash (carried state) needs only a [seg, seg]
    # matrix -- 4x less work than comparing against all (c, stay) pairs.
    # Every [seg, seg, TB] op here is on the kernel's latency floor (the
    # round-4/5 stub-profiling attribution), so the fabric is ONE equality
    # compare: the live/last validity masks are folded into the hash
    # operands as per-row sentinels BEFORE broadcast (cheap [seg, TB]
    # selects), instead of 4 extra [seg, seg, TB] mask ANDs.
    hx_m = jnp.where(live, h, row + jnp.int32(0x5a000001))
    phy_m = jnp.where(live & (last >= 0), ph, row + jnp.int32(0x2b0000c9))
    last_y = last[None, :, :]
    eq = hx_m[:, None, :] == phy_m[None, :, :]
    # contribution value: the extend (X, c=last[Y]) non-blank mass.
    # Beam strings are pairwise distinct (duplicate extends are killed the
    # step they appear), so each stay Y matches AT MOST ONE parent X — the
    # log-sum-exp accumulation over X collapses to a masked sum (no
    # exp/log transcendentals over the [seg, seg, TB] matrix) and the
    # per-label killed[] any-reductions collapse to ONE bitmask pass.
    # (A shifted-sum fold of the any-reduction into raw_y was tried and
    # reverted: length_bonus makes scores positive-unbounded, so no
    # constant shift keeps matched terms sign-separable without f32
    # cancellation breaking exact XLA-twin parity.)
    # Distinctness is enforced via the 32-bit rolling string hash: on a
    # hash collision two parents would match one stay and their LOG-probs
    # ADD (-5 + -7 = -12), corrupting that beam score. Collision odds per
    # compared pair are ~2^-32 (~1 corrupted BEAM ENTRY per ~30 full
    # B=400/T=400 decodes); a corrupted entry only demotes one beam. The
    # second hash of rounds 1-4 bought ~2^-64 at the price of two extra
    # state gathers + a second [seg, seg, TB] compare per step — measured
    # fabric cost, not worth 1e-9 -> 1e-18 on a per-window error that the
    # W-wide beam absorbs.
    lp_y = jnp.full((seg, tb), 0.0)         # lp at last[Y], per stay row
    for c in range(nlab):
        lp_y = jnp.where(last == c, lp[c:c + 1], lp_y)
    base_xy = jnp.where(
        last[:, None, :] == last_y, pb[:, None, :], pb_or_pnb[:, None, :]
    )
    raw_y = jnp.sum(jnp.where(eq, base_xy, 0.0), axis=0)       # [seg, TB]
    any_y = jnp.any(eq, axis=0)                                # [seg, TB]
    # bonus: the merged mass is an EXTEND's value (lp + base + bonus), same
    # as ext_pnb above — the XLA twin adds the bonus before merging too
    merged_total = jnp.where(any_y, lp_y + raw_y + bonus, _NEG)
    # extend (X, c) is killed iff it merged into some stay with last == c;
    # bit c of the per-X merge mask records that in one [seg,seg,TB] pass
    bits_x = jnp.sum(
        jnp.where(eq, jnp.left_shift(1, jnp.maximum(last_y, 0)), 0), axis=1
    )  # [seg, TB] over stays Y
    killed = [(bits_x >> c) & 1 > 0 for c in range(nlab)]
    stay_pnb = _lae(stay_pnb, merged_total)

    # ---- assemble candidate rows [cand, TB] ------------------------------
    # Extend rows have no blank mass, so their score IS cand_pnb: the _lae
    # exp/log pair only runs over the seg stay rows, not all (nlab+1)*seg
    # candidate rows.
    cand_pnb = jnp.concatenate(
        [stay_pnb]
        + [jnp.where(killed[c], _NEG, ext_pnb[c]) for c in range(nlab)],
        axis=0,
    )
    score = jnp.concatenate(
        [_lae(stay_pb, stay_pnb)] + [cand_pnb[seg * (c + 1):seg * (c + 2)]
                                     for c in range(nlab)],
        axis=0,
    )

    cl = jax.lax.broadcasted_iota(jnp.int32, (cand, tb), 0)

    # ---- top-k phase 1: collect the k-th argmax indices ------------------
    # Iterative extract-max is inherently sequential but each iteration is
    # only ~5 ops over sublane trees; all state gathering is deferred to one
    # vectorized pass. w is static, so exactly w iterations are emitted.
    if topk_mode == "stub":
        # PROFILING ONLY (never semantically valid): slot k takes candidate
        # k verbatim. Isolates the extract-max loop's cost so the on-chip
        # floor of the REST of the kernel (merge, phase-2 gathers,
        # traceback) can be measured — the beam-50 latency analysis.
        idx_all = row
        picked_live = live
    elif topk_mode == "packed":
        # Index-carrying extract-max: candidate index rides the low 9
        # mantissa bits of a monotone int32 image of the score, so each
        # iteration is ONE max-tree + invalidate (~half the exact mode's
        # max + masked-argmin + invalidate). Semantics: scores compare at
        # 2^-14 relative granularity — candidates within that of each
        # other tie-break by lowest index (the exact mode compares full
        # f32). Measured r5 at B=400/T=400/W=50: the exact top-k loop is
        # 8.8 ms of the 14.8 ms kernel; this mode trades exactness for
        # ~2x on that loop. Opt-in (never the default): near-ties at
        # 2^-14 pick a different-but-equal-scored beam order vs the XLA
        # twin, so the exact-parity guarantee is relaxed to "equal up to
        # score quantization".
        bits = jax.lax.bitcast_convert_type(score, jnp.int32)
        mono = jnp.where(bits >= 0, bits, bits ^ jnp.int32(0x7FFFFFFF))
        key = (mono & jnp.int32(~511)) | (511 - cl)
        live_key = int(
            np.int32(
                np.float32(_NEG / 2).view(np.int32) ^ np.int32(0x7FFFFFFF)
            ) & ~511
        )
        idx_rows = []
        live_rows = []
        for k in range(w):
            m = jnp.max(key, axis=0, keepdims=True)  # [1, TB] int32
            idx = 511 - (m & 511)
            idx_rows.append(idx)
            live_rows.append((m > live_key).astype(jnp.int32))
            key = jnp.where(cl == idx, jnp.int32(-2147483648), key)
        if w < seg:
            idx_rows.append(jnp.zeros((seg - w, tb), jnp.int32))
            live_rows.append(jnp.zeros((seg - w, tb), jnp.int32))
        idx_all = jnp.concatenate(idx_rows, axis=0)
        picked_live = jnp.concatenate(live_rows, axis=0) > 0
    else:
        idx_rows = []
        live_rows = []
        for k in range(w):
            m = jnp.max(score, axis=0, keepdims=True)  # [1, TB]
            idx = jnp.min(jnp.where(score >= m, cl, cand), axis=0, keepdims=True)
            idx_rows.append(idx)
            live_rows.append((m > _NEG / 2).astype(jnp.int32))  # i1 concat unsupported
            score = jnp.where(cl == idx, _NEG, score)
        if w < seg:  # inert tail slots
            idx_rows.append(jnp.zeros((seg - w, tb), jnp.int32))
            live_rows.append(jnp.zeros((seg - w, tb), jnp.int32))
        idx_all = jnp.concatenate(idx_rows, axis=0)    # [seg, TB]
        picked_live = jnp.concatenate(live_rows, axis=0) > 0  # [seg, TB]

    # ---- top-k phase 2: beam-domain one-hot gathers --------------------
    # Each slot's (parent, char) come straight from phase 1; every state
    # value is either the parent's (stay) or recomputable from the
    # parent's state (extend), so all gathers run over the seg beam
    # rows instead of the 5*seg candidate rows (5x less VPU work). A slot
    # with no live candidate receives a FRESH garbage hash (derived from
    # (t, k)) -- otherwise it would copy beam 0's hash and a later merge
    # could resurrect a duplicate prefix.
    kcol = jax.lax.broadcasted_iota(jnp.int32, (seg, tb), 0)
    valid = live & picked_live  # live == (row < w)
    parents = jnp.where(valid, idx_all % seg, kcol)
    chars = jnp.where(valid, idx_all // seg - 1, -1)

    onehot_p = parents[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (seg, seg, tb), 1
    )  # [slot, parent, TB]

    def gat_f(arr):
        return jnp.sum(jnp.where(onehot_p, arr[None], 0.0), axis=1)

    def gat_i(arr):
        return jnp.sum(jnp.where(onehot_p, arr[None], 0), axis=1)

    p_h = gat_i(h)
    p_ph = gat_i(ph)
    p_last = gat_i(last)
    is_stay = chars < 0
    lp_c = jnp.full((seg, tb), 0.0)
    for c in range(nlab):
        lp_c = jnp.where(chars == c, lp[c:c + 1], lp_c)
    # One fused gather serves both pnb cases: per (slot, parent) the source
    # is the parent's stay_pnb for stay slots and the extend BASE (the
    # parent's pb / pb-or-pnb keyed on last[parent] == chars[slot]) for
    # extend slots — the extend value is then recomputed post-gather as
    # lp_c + base + bonus (killed extends can never be selected: their
    # candidate score is _NEG). Replaces three separate [seg, seg, TB]
    # gathers (stay_pnb, pb, pb_or_pnb) of the rounds-1-4 kernel.
    pnb_src = jnp.where(
        is_stay[:, None, :],
        stay_pnb[None],
        jnp.where(last[None] == chars[:, None, :], pb[None],
                  pb_or_pnb[None]),
    )
    fused = jnp.sum(jnp.where(onehot_p, pnb_src, 0.0), axis=1)

    garbage1 = (t * 131 + kcol) * 7919 + 1000003
    new_pb = jnp.where(valid & is_stay, gat_f(stay_pb), _NEG)
    new_pnb = jnp.where(
        valid, jnp.where(is_stay, fused, lp_c + fused + bonus), _NEG
    )
    new_h = jnp.where(
        valid, jnp.where(is_stay, p_h, p_h * _H1_MULT + chars + 1), garbage1
    )
    new_last = jnp.where(valid, jnp.where(is_stay, p_last, chars), -1)
    # prefix hash: stays keep theirs; an extend's prefix IS the parent
    new_ph = jnp.where(
        valid, jnp.where(is_stay, p_ph, p_h), kcol * 15485863 + 17
    )

    # ---- freeze past each row's length -----------------------------------
    active = lens_ref[:1, :] > t  # [1, TB]
    out_parent = jnp.where(active, parents, row)
    out_char = jnp.where(active, chars, -1)
    # pack (char, parent) into one int32 word: (char+1)*seg + parent
    trace_ref[j] = (out_char + 1) * seg + out_parent
    # NOTE: final beam scores are rematerialised outside from pb/pnb outputs
    return (
        jnp.where(active, new_pb, pb),
        jnp.where(active, new_pnb, pnb),
        jnp.where(active, new_h, h),
        jnp.where(active, new_last, last),
        jnp.where(active, new_ph, ph),
    )


TRACE_CHUNK = 16


def _traceback_kernel(seg, best_ref, trace_in_ref, out_ref, w_scr):
    """Follow the best beam's parent chain, TRACE_CHUNK steps per grid step.

    The per-step work is a handful of tiny selects, so the grid is chunked
    along time to amortise grid-iteration overhead (4x fewer steps ~= 4x
    faster end-to-end traceback).
    """
    t = pl.program_id(1)  # chunk index; chunk covers reverse-time order
    tb = w_scr.shape[1]

    @pl.when(t == 0)
    def _():
        w_scr[:] = best_ref[:]

    row = jax.lax.broadcasted_iota(jnp.int32, (seg, tb), 0)
    wcur = w_scr[:1, :]  # [1, TB] current beam per lane
    # the input block holds TRACE_CHUNK steps in FORWARD time order; walk
    # them backwards (the index map already reversed the chunk order)
    for j in range(TRACE_CHUNK - 1, -1, -1):
        onehot = row == wcur
        packed = trace_in_ref[j]  # [seg, TB]: (char+1)*seg + parent
        v = jnp.sum(jnp.where(onehot, packed, 0), axis=0, keepdims=True)
        out_ref[j] = jnp.broadcast_to(v // seg - 1, (8, tb))
        wcur = v % seg
    w_scr[:] = jnp.broadcast_to(wcur, (8, tb))


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "batch_tile", "interpret", "length_bonus",
                     "topk_mode"),
)
def beam_search_pallas(
    logits: jnp.ndarray,
    seq_lengths: jnp.ndarray,
    beam_width: int = 30,
    batch_tile: int = 128,
    interpret: bool = False,
    length_bonus: float = 0.0,
    topk_mode: str = "exact",
):
    """Drop-in replacement for ops.ctc_beam.beam_search_decode on TPU.

    ``length_bonus``: additive log-score per emitted label (see
    ops/ctc_beam.py — the ASR word-insertion-bonus analog for rebalancing
    the deletion-heavy CTC operating point); 0.0 = exact reference
    semantics.

    ``topk_mode``: "exact" (default) | "stub" — PROFILING ONLY: "stub"
    replaces the top-k extract-max loop with a pass-through so its share
    of kernel latency can be measured in isolation. A static jit arg (not
    a module global) so each mode gets its own compiled program — a
    global flag was silently ignored by the jit cache (ADVICE r4 #1).

    Returns (decoded [B,T] int32 -1-padded, lengths [B], log_prob [B]).
    """
    if beam_width > MAX_SEG:
        raise ValueError(f"beam_width must be <= {MAX_SEG}")
    seg = seg_for(beam_width)
    bsz, t_max, nclass = logits.shape
    if nclass > MAX_CLASS:
        raise ValueError(f"nclass must be <= {MAX_CLASS}")
    nlab = nclass - 1  # blank is the LAST class (config.BLANK convention)
    bp = -(-bsz // batch_tile) * batch_tile
    # pad time to a multiple of lcm(BEAM_CHUNK, TRACE_CHUNK): padded steps
    # are inactive for every row (lens <= t_max), so the freeze logic emits
    # the no-op trace records the chunked traceback needs
    tmul = max(BEAM_CHUNK, TRACE_CHUNK)
    t_pad = -(-t_max // tmul) * tmul
    lp = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.transpose(lp, (1, 2, 0))  # [T, nclass, B]
    lp = jnp.pad(lp, ((0, t_pad - t_max), (0, 8 - nclass), (0, bp - bsz)),
                 constant_values=_NEG)
    lens = jnp.pad(seq_lengths.astype(jnp.int32), (0, bp - bsz))
    lens_b = jnp.broadcast_to(lens[None, :], (8, bp))

    n_tiles = bp // batch_tile

    (pb, pnb, trace) = pl.pallas_call(
        functools.partial(_beam_wrapper, beam_width, seg, nlab, BEAM_CHUNK,
                          float(length_bonus), topk_mode),
        grid=(n_tiles, t_pad // BEAM_CHUNK),
        in_specs=[
            pl.BlockSpec((8, batch_tile), lambda b, t: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BEAM_CHUNK, 8, batch_tile), lambda b, t: (t, 0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((seg, batch_tile), lambda b, t: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, batch_tile), lambda b, t: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((BEAM_CHUNK, seg, batch_tile), lambda b, t: (t, 0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seg, bp), jnp.float32),
            jax.ShapeDtypeStruct((seg, bp), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, seg, bp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((seg, batch_tile), jnp.float32),
            pltpu.VMEM((seg, batch_tile), jnp.float32),
            pltpu.VMEM((seg, batch_tile), jnp.int32),
            pltpu.VMEM((seg, batch_tile), jnp.int32),
            pltpu.VMEM((seg, batch_tile), jnp.int32),
        ],
        interpret=interpret,
    )(lens_b, lp)

    final_score = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (seg, bp), 0) < beam_width,
        _logaddexp_xla(pb, pnb),
        _NEG,
    )
    best = jnp.argmax(final_score, axis=0).astype(jnp.int32)  # [Bp]
    log_prob = jnp.max(final_score, axis=0)

    best_b = jnp.broadcast_to(best[None, :], (8, bp))
    # trace is already padded to a TRACE_CHUNK multiple with no-op records
    # (char -1, parent identity) emitted by the freeze logic
    tc = TRACE_CHUNK
    n_chunks = t_pad // tc
    rev = pl.pallas_call(
        functools.partial(_traceback_kernel, seg),
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((8, batch_tile), lambda b, t: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tc, seg, batch_tile),
                lambda b, t: (n_chunks - 1 - t, 0, b),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tc, 8, batch_tile), lambda b, t: (n_chunks - 1 - t, 0, b),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, 8, bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, batch_tile), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(best_b, trace)

    # rev[t, 0, b] = char emitted at time t (already forward order; padded
    # tail steps emitted -1)
    from chiron_tpu.ops.ctc_greedy import compact_labels

    fwd = rev[:t_max, 0, :].T[:bsz]  # [B, T]
    decoded, lengths = compact_labels(fwd, fwd >= 0)
    return decoded, lengths, log_prob[:bsz]


def _beam_wrapper(w, seg, nlab, chunk, bonus, topk_mode, lens_ref, lp_ref,
                  pb_out, pnb_out, trace_ref, pb_s, pnb_s, h_s, last_s,
                  ph_s):
    _beam_kernel(w, seg, nlab, chunk, bonus, topk_mode, lens_ref, lp_ref,
                 trace_ref, pb_s, pnb_s, h_s, last_s, ph_s)
    # expose final state (written every step; last write wins)
    pb_out[:] = pb_s[:]
    pnb_out[:] = pnb_s[:]


def _logaddexp_xla(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return jnp.where(mx <= _NEG / 2, _NEG, mx + jnp.log1p(jnp.exp(mn - mx)))
