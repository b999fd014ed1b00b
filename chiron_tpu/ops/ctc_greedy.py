"""Greedy (best-path) CTC decoding, fully on-device with static shapes.

Replaces ``tf.nn.ctc_greedy_decoder(merge_repeated=True)`` as used at
chiron/chiron_eval.py:486-487: per-frame argmax, collapse repeats, drop
blanks — but vectorized over the batch and emitting a fixed-size padded
[B, T] int32 matrix plus per-example decoded lengths, so only two small
dense arrays cross the device->host boundary (no sparse tensors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def greedy_decode(
    logits: jnp.ndarray, seq_lengths: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best-path decode.

    Args:
      logits: [B, T, C].
      seq_lengths: [B] valid frame counts.
    Returns:
      decoded: [B, T] int32, class ids packed to the front, -1 padded.
      lengths: [B] int32 decoded lengths.
      neg_sum_logits: [B] decoder score (sum of max logit over used frames,
        negated — matches the TF greedy decoder's log_probability output).
    """
    b, t, n_class = logits.shape
    blank = n_class - 1  # blank is the last class (TF convention)
    classes = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    max_logits = jnp.max(logits, axis=-1)  # [B, T]

    tidx = jnp.arange(t)[None, :]
    valid = tidx < seq_lengths[:, None]  # [B, T]

    prev = jnp.pad(classes, ((0, 0), (1, 0)), constant_values=-1)[:, :t]
    keep = valid & (classes != blank) & (classes != prev)
    decoded, lengths = compact_labels(classes, keep)

    neg_sum = -jnp.sum(jnp.where(valid, max_logits, 0.0), axis=1)
    return decoded, lengths, neg_sum


def compact_labels(classes: jnp.ndarray, keep: jnp.ndarray):
    """Front-pack kept labels, -1 padded; returns (decoded, lengths).

    Sort-based: a stable argsort of (kept? t : T+t) keys is considerably
    faster on TPU than a scatter (~2ms vs ~19ms at [400, 400]).
    """
    b, t = classes.shape
    tidx = jnp.arange(t)[None, :]
    key = jnp.where(keep, tidx, t + tidx)
    order = jnp.argsort(key, axis=1)
    decoded = jnp.take_along_axis(classes.astype(jnp.int32), order, axis=1)
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    decoded = jnp.where(tidx < lengths[:, None], decoded, -1)
    return decoded, lengths


greedy_decode_jit = jax.jit(greedy_decode)
