"""CTC loss (forward algorithm) with optional focal-loss modulation.

XLA-native replacement for ``tf.nn.ctc_loss`` as used by the reference
(chiron/chiron_model.py:50-74): dense [B, U] labels + lengths instead of
sparse tensors (static shapes for TPU), ``ctc_merge_repeated=True``
semantics, ``ignore_longer_outputs_than_inputs=True`` parity (zero loss and
zero gradient for examples whose label is longer than the logit sequence).

The forward recursion runs as a ``lax.scan`` over time on the standard
blank-interleaved label expansion; everything is batched (no vmap needed:
the recursion is written batch-first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


_NEG_INF = -1e30


def _expand_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[B, U] -> [B, 2U+1] blank-interleaved: b l0 b l1 ... b lU-1 b."""
    b, u = labels.shape
    ex = jnp.full((b, 2 * u + 1), blank, dtype=labels.dtype)
    return ex.at[:, 1::2].set(labels)


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Per-example negative log-likelihood, shape [B].

    Args:
      logits: [B, T, C] unnormalised (softmax applied internally, like TF).
      logit_lengths: [B] valid frames per example.
      labels: [B, U] int labels in [0, C-2], padded arbitrarily past length.
      label_lengths: [B] valid labels per example.
    """
    bsz, t_max, n_class = logits.shape
    blank = n_class - 1  # blank is the last class (TF convention)
    u_max = labels.shape[1]
    s = 2 * u_max + 1

    lp = jax.nn.log_softmax(logits, axis=-1)  # [B, T, C]
    ex = _expand_labels(labels.astype(jnp.int32), blank)  # [B, S]

    # Transition-allowed mask for the skip (s-2) connection: target must be
    # a non-blank that differs from the label two slots back.
    ex_prev2 = jnp.pad(ex, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    skip_ok = (ex != blank) & (ex != ex_prev2)  # [B, S]
    skip_add = jnp.where(skip_ok, 0.0, _NEG_INF)

    # Emission log-probs per slot per time, [B, T, S]. Expressed as a
    # one-hot einsum rather than a gather: the gather's GRADIENT is a
    # scatter-add over [B, T, S] (hundreds of ms on TPU), while the
    # einsum's gradient is another batched matmul. Values are bitwise
    # identical (each sum has exactly one nonzero term).
    onehot = (ex[:, :, None] == jnp.arange(n_class)[None, None, :]).astype(lp.dtype)
    emit = jnp.einsum("btc,bsc->bts", lp, onehot)

    s_idx = jnp.arange(s)[None, :]  # [1, S]
    # Slots beyond 2*label_len(+1) are invalid.
    valid_slot = s_idx < (2 * label_lengths[:, None] + 1)
    slot_mask = jnp.where(valid_slot, 0.0, _NEG_INF)

    alpha0 = jnp.full((bsz, s), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if u_max > 0:
        first_label = jnp.where(label_lengths > 0, emit[:, 0, 1], _NEG_INF)
        alpha0 = alpha0.at[:, 1].set(first_label)
    alpha0 = alpha0 + slot_mask

    def shift(x, n):
        return jnp.pad(x, ((0, 0), (n, 0)), constant_values=_NEG_INF)[:, :s]

    def step(alpha, t):
        stay = alpha
        diag = shift(alpha, 1)
        skip = shift(alpha, 2) + skip_add
        merged = jnp.logaddexp(jnp.logaddexp(stay, diag), skip)
        new_alpha = merged + emit[:, t, :] + slot_mask
        # Freeze past each example's logit length.
        active = (t < logit_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = lax.scan(step, alpha0, jnp.arange(1, t_max))

    # Final prob: sum of the last two valid slots (last blank + last label).
    last = 2 * label_lengths  # slot of the final blank
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.where(
        label_lengths > 0,
        jnp.take_along_axis(
            alpha, jnp.maximum(last - 1, 0)[:, None], axis=1
        )[:, 0],
        _NEG_INF,
    )
    nll = -jnp.logaddexp(a_last, a_prev)

    # ignore_longer_outputs_than_inputs=True parity: zero loss (and grad).
    ignore = label_lengths > logit_lengths
    return jnp.where(ignore, 0.0, nll)


def ctc_focal_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    fl_gamma: float = 0.0,
) -> jnp.ndarray:
    """Mean CTC loss with focal modulation (chiron/chiron_model.py:62-70)."""
    loss = ctc_loss(logits, logit_lengths, labels, label_lengths)
    if fl_gamma > 0:
        loss = jnp.power(1.0 - jnp.exp(-loss), fl_gamma) * loss
    return jnp.mean(loss)
