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

from chiron_tpu.config import BLANK


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
    b, t, _ = logits.shape
    classes = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    max_logits = jnp.max(logits, axis=-1)  # [B, T]

    tidx = jnp.arange(t)[None, :]
    valid = tidx < seq_lengths[:, None]  # [B, T]

    prev = jnp.pad(classes, ((0, 0), (1, 0)), constant_values=-1)[:, :t]
    keep = valid & (classes != BLANK) & (classes != prev)

    # Stable compaction: position of each kept element in the output row.
    pos = jnp.cumsum(keep, axis=1) - 1  # [B, T]
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)

    decoded = jnp.full((b, t), -1, dtype=jnp.int32)
    bidx = jnp.arange(b)[:, None].repeat(t, axis=1)
    # Masked-out elements scatter to column index t, which is out of range
    # and dropped; kept elements compact stably to the front.
    scatter_pos = jnp.where(keep, pos, t)
    decoded = decoded.at[bidx, scatter_pos].set(classes, mode="drop")

    neg_sum = -jnp.sum(jnp.where(valid, max_logits, 0.0), axis=1)
    return decoded, lengths, neg_sum


greedy_decode_jit = jax.jit(greedy_decode)
