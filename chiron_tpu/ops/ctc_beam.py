"""Batched CTC prefix beam search, designed for TPU execution.

Replaces ``tf.nn.ctc_beam_search_decoder(merge_repeated=False)`` as used at
chiron/chiron_eval.py:489-494 (standard CTC prefix-search semantics: each
beam keeps separate blank-ending / non-blank-ending probabilities; extending
a beam with its own last label only draws from the blank-ending mass).

TPU-first design decisions (vs. the reference's C++ per-sequence decoder):

* The whole batch advances in lockstep through a single ``lax.scan`` over
  time — beams are [B, W] arrays, candidate scoring/merging/top-k are all
  dense vector ops on the VPU.
* Beams are identified by a 32-bit rolling hash instead of materialised
  label strings. Prefix merging (an extend-candidate colliding with an
  existing beam) is detected with a [4W, W] hash-equality matrix
  (accidental collisions ~2^-32 per compared pair — far below the beam
  search's own approximation noise; mirrors the Pallas kernel's r5
  single-hash state so both twins carry the same identity scheme).
* Decoded sequences are NOT carried through the scan. Each step emits a
  compact (parent, char) traceback record; sequences are reconstructed on
  device afterwards by a cheap reverse scan over the chosen beam's chain.

A key structural fact keeps merging cheap: live beams always represent
distinct label strings, and an extend of X by c equals an extend of Y by d
only if X==Y and c==d. Hence merges can only occur between an extend
candidate and a *stay* candidate — a [4W, W] comparison, not [5W, 5W].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


_NEG_INF = -1e30
_H1_MULT = np.uint32(2654435761)  # Knuth multiplicative hash


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    return jnp.where(mx <= _NEG_INF, _NEG_INF, mx + jnp.log1p(jnp.exp(mn - mx)))


@partial(jax.jit, static_argnames=("beam_width",))
def beam_search_decode(
    logits: jnp.ndarray,
    seq_lengths: jnp.ndarray,
    beam_width: int = 30,
    length_bonus: float = 0.0,
):
    """CTC prefix beam search over a batch.

    Args:
      logits: [B, T, C] unnormalised logits (softmax applied internally,
        matching tf.nn.ctc_beam_search_decoder).
      seq_lengths: [B] valid frame counts.
      beam_width: number of beams kept per step.
      length_bonus: additive log-score per emitted label. CTC basecallers
        systematically under-emit short-dwell bases (measured deletion
        0.10-0.11 vs insertion 0.02-0.03 on the bundled models); a small
        positive bonus rebalances the operating point, like the word
        insertion bonus of classical ASR decoders. 0.0 = exact
        tf.nn.ctc_beam_search_decoder semantics (the reference's decoder).
    Returns:
      decoded: [B, T] int32 best-path labels front-packed, -1 padded.
      lengths: [B] int32 decoded lengths.
      log_prob: [B] log probability of the best beam.
    """
    bsz, t_max, nclass = logits.shape
    blank = nclass - 1  # blank is the last class (TF convention)
    w = beam_width
    nlab = nclass - 1  # non-blank labels
    lp = jax.nn.log_softmax(logits, axis=-1)  # [B, T, C]

    # ---- initial beam state: beam 0 = empty prefix, rest inactive --------
    p_b0 = jnp.full((bsz, w), _NEG_INF).at[:, 0].set(0.0)
    p_nb0 = jnp.full((bsz, w), _NEG_INF)
    widx = jnp.arange(w, dtype=jnp.uint32)
    # distinct garbage hashes for inactive beams so they never merge
    h1_0 = jnp.where(widx == 0, jnp.uint32(1), widx * np.uint32(7919) + 3)
    h1_0 = jnp.broadcast_to(h1_0, (bsz, w))
    last0 = jnp.full((bsz, w), -1, jnp.int32)

    lp_t = jnp.transpose(lp, (1, 0, 2))  # [T, B, C]

    def step(carry, inp):
        p_b, p_nb, h1, last = carry
        lp_cur, t = inp  # lp_cur: [B, C]

        lp_blank = lp_cur[:, blank][:, None]  # [B, 1]
        # lp at each beam's own last label (repeat emission); -inf for empty
        lp_last = jnp.take_along_axis(
            lp_cur, jnp.clip(last, 0, nlab - 1), axis=1
        )  # [B, W]

        # ---- stay candidates (same prefix), [B, W] -----------------------
        stay_pb = _logaddexp(p_b, p_nb) + lp_blank
        stay_pnb = jnp.where(last >= 0, p_nb + lp_last, _NEG_INF)

        # ---- extend candidates (prefix + c), laid out [B, nlab, W] -------
        lp_ext = lp_cur[:, :nlab, None]  # [B, nlab, 1]
        same_as_last = jnp.arange(nlab)[None, :, None] == last[:, None, :]
        base = jnp.where(same_as_last, p_b[:, None, :], _logaddexp(p_b, p_nb)[:, None, :])
        ext_pnb = lp_ext + base + length_bonus  # [B, nlab, W]

        ext_h1 = h1[:, None, :] * _H1_MULT + jnp.arange(1, nlab + 1, dtype=jnp.uint32)[None, :, None]

        # ---- merge extends into equal-hash stays -------------------------
        # eq[b, c, w_ext, w_stay]: extend (c, w_ext) produces stay w_stay's prefix
        eq = ext_h1[..., None] == h1[:, None, None, :]
        ext_flat = ext_pnb.reshape(bsz, nlab * w)
        eq_flat = eq.reshape(bsz, nlab * w, w)
        # contribution of merging extends to each stay's non-blank mass
        contrib = jnp.where(eq_flat, ext_flat[..., None], _NEG_INF)
        mmax = jnp.max(contrib, axis=1)  # [B, W]
        msum = jnp.sum(jnp.exp(jnp.where(eq_flat, contrib - mmax[:, None, :], _NEG_INF)), axis=1)
        merged = jnp.where(mmax > _NEG_INF / 2, mmax + jnp.log(jnp.maximum(msum, 1e-37)), _NEG_INF)
        stay_pnb = _logaddexp(stay_pnb, merged)
        # kill merged extend candidates
        ext_merged = jnp.any(eq_flat, axis=-1)  # [B, nlab*W]
        ext_flat = jnp.where(ext_merged, _NEG_INF, ext_flat)

        # ---- assemble candidate pool: [B, W + nlab*W] --------------------
        cand_pb = jnp.concatenate([stay_pb, jnp.full((bsz, nlab * w), _NEG_INF)], axis=1)
        cand_pnb = jnp.concatenate([stay_pnb, ext_flat], axis=1)
        cand_score = _logaddexp(cand_pb, cand_pnb)

        top_score, top_idx = lax.top_k(cand_score, w)  # [B, W]

        is_stay = top_idx < w
        parent = jnp.where(is_stay, top_idx, (top_idx - w) % w).astype(jnp.int32)
        newchar = jnp.where(is_stay, -1, (top_idx - w) // w).astype(jnp.int32)

        gather = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
        new_pb = jnp.take_along_axis(cand_pb, top_idx, axis=1)
        new_pnb = jnp.take_along_axis(cand_pnb, top_idx, axis=1)
        new_h1 = jnp.where(
            is_stay,
            gather(h1),
            gather(h1) * _H1_MULT + (newchar + 1).astype(jnp.uint32),
        )
        new_last = jnp.where(is_stay, gather(last), newchar)

        # ---- freeze beams past each example's seq length -----------------
        active = (t < seq_lengths)[:, None]
        out_parent = jnp.where(active, parent, jnp.arange(w, dtype=jnp.int32)[None, :])
        out_char = jnp.where(active, newchar, -1)
        keep = lambda new, old: jnp.where(active, new, old)
        carry = (
            keep(new_pb, p_b),
            keep(new_pnb, p_nb),
            keep(new_h1, h1),
            keep(new_last, last),
        )
        return carry, (out_parent.astype(jnp.int8), out_char.astype(jnp.int8))

    (p_b, p_nb, _, _), (parents, chars) = lax.scan(
        step, (p_b0, p_nb0, h1_0, last0), (lp_t, jnp.arange(t_max))
    )
    # parents/chars: [T, B, W] int8
    final_score = _logaddexp(p_b, p_nb)  # [B, W]
    best = jnp.argmax(final_score, axis=1).astype(jnp.int32)  # [B]
    log_prob = jnp.take_along_axis(final_score, best[:, None], axis=1)[:, 0]

    # ---- traceback: reverse scan over the chosen beam chain --------------
    parents_bt = jnp.transpose(parents, (1, 0, 2)).astype(jnp.int32)  # [B, T, W]
    chars_bt = jnp.transpose(chars, (1, 0, 2)).astype(jnp.int32)

    def trace_step(wcur, t):
        # t runs T-1 .. 0
        c = jnp.take_along_axis(chars_bt[:, t, :], wcur[:, None], axis=1)[:, 0]
        wprev = jnp.take_along_axis(parents_bt[:, t, :], wcur[:, None], axis=1)[:, 0]
        return wprev, c

    _, rev_chars = lax.scan(trace_step, best, jnp.arange(t_max - 1, -1, -1))
    rev_chars = rev_chars.T  # [B, T], chars in reverse emission order (-1 = none)

    # front-pack in forward order: forward chars = reverse of rev_chars
    from chiron_tpu.ops.ctc_greedy import compact_labels

    fwd = rev_chars[:, ::-1]
    decoded, lengths = compact_labels(fwd, fwd >= 0)
    return decoded, lengths, log_prob
