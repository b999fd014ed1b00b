"""CTC loss (forward algorithm) with optional focal-loss modulation.

XLA-native replacement for ``tf.nn.ctc_loss`` as used by the reference
(chiron/chiron_model.py:50-74): dense [B, U] labels + lengths instead of
sparse tensors (static shapes for TPU), ``ctc_merge_repeated=True``
semantics, ``ignore_longer_outputs_than_inputs=True`` parity (zero loss and
zero gradient for examples whose label is longer than the logit sequence).

The forward recursion runs as a ``lax.scan`` over time on the standard
blank-interleaved label expansion; everything is batched (no vmap needed:
the recursion is written batch-first).

The loss carries a custom VJP with the classic alpha-beta analytic
gradient: dL/d(emission[t,s]) = -posterior[t,s], computed by one backward
(beta) scan symmetric to the forward one. Differentiating the forward scan
with autodiff instead costs ~4x (measured 165ms vs ~45ms for the full
value+grad at B=300, T=400 on v5e): the reverse-mode scan body is much
heavier than the plain beta recursion.
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


def _ctc_setup(logits, logit_lengths, labels, label_lengths):
    """Shared tensors for the alpha/beta recursions."""
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
    return lp, ex, onehot, skip_add, emit, slot_mask, s, blank


def _shift_down(x, n, s):
    """Shift slots toward higher index (alpha direction)."""
    return jnp.pad(x, ((0, 0), (n, 0)), constant_values=_NEG_INF)[:, :s]


def _shift_up(x, n):
    """Shift slots toward lower index (beta direction)."""
    return jnp.pad(x, ((0, 0), (0, n)), constant_values=_NEG_INF)[:, n:]


def _ctc_forward(logits, logit_lengths, labels, label_lengths):
    """Returns (nll [B], alphas [T, B, S], setup aux)."""
    bsz, t_max, _ = logits.shape
    lp, ex, onehot, skip_add, emit, slot_mask, s, blank = _ctc_setup(
        logits, logit_lengths, labels, label_lengths
    )
    u_max = labels.shape[1]

    alpha0 = jnp.full((bsz, s), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if u_max > 0:
        first_label = jnp.where(label_lengths > 0, emit[:, 0, 1], _NEG_INF)
        alpha0 = alpha0.at[:, 1].set(first_label)
    alpha0 = alpha0 + slot_mask

    def step(alpha, t):
        stay = alpha
        diag = _shift_down(alpha, 1, s)
        skip = _shift_down(alpha, 2, s) + skip_add
        merged = jnp.logaddexp(jnp.logaddexp(stay, diag), skip)
        new_alpha = merged + emit[:, t, :] + slot_mask
        # Freeze past each example's logit length.
        active = (t < logit_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, new_alpha

    alpha_last, alphas_rest = lax.scan(step, alpha0, jnp.arange(1, t_max))
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # [T, B, S]

    # Final prob: sum of the last two valid slots (last blank + last label).
    last = 2 * label_lengths  # slot of the final blank
    a_last = jnp.take_along_axis(alpha_last, last[:, None], axis=1)[:, 0]
    a_prev = jnp.where(
        label_lengths > 0,
        jnp.take_along_axis(
            alpha_last, jnp.maximum(last - 1, 0)[:, None], axis=1
        )[:, 0],
        _NEG_INF,
    )
    nll = -jnp.logaddexp(a_last, a_prev)

    # ignore_longer_outputs_than_inputs=True parity: zero loss (and grad).
    ignore = label_lengths > logit_lengths
    loss = jnp.where(ignore, 0.0, nll)
    aux = (lp, onehot, skip_add, emit, slot_mask, nll, ignore)
    return loss, alphas, aux


@jax.custom_vjp
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
    loss, _, _ = _ctc_forward(logits, logit_lengths, labels, label_lengths)
    return loss


def _ctc_loss_fwd(logits, logit_lengths, labels, label_lengths):
    loss, alphas, aux = _ctc_forward(logits, logit_lengths, labels, label_lengths)
    return loss, (alphas, aux, logit_lengths, label_lengths)


def _ctc_loss_bwd(res, g):
    alphas, aux, logit_lengths, label_lengths = res
    lp, onehot, skip_add, emit, slot_mask, nll, ignore = aux
    t_max, bsz, s = alphas.shape

    # Beta recursion (reverse time); beta[t, s] excludes emit at t, so
    # alpha[t, s] + beta[t, s] = log p(paths through slot s at time t).
    last = 2 * label_lengths  # [B] final blank slot
    s_idx = jnp.arange(s)[None, :]
    beta_init = jnp.where(
        (s_idx == last[:, None])
        | ((s_idx == last[:, None] - 1) & (label_lengths[:, None] > 0)),
        0.0,
        _NEG_INF,
    )  # [B, S]

    def bstep(beta, t):
        # recursion target: beta[t] from beta[t+1] + emit[t+1]
        nxt = beta + emit[:, jnp.minimum(t + 1, t_max - 1), :] + slot_mask
        stay = nxt
        diag = _shift_up(nxt, 1)
        skip = _shift_up(nxt + skip_add, 2)  # skip INTO s+2 needs skip_ok[s+2]
        rec = jnp.logaddexp(jnp.logaddexp(stay, diag), skip)
        at_end = (t == logit_lengths - 1)[:, None]
        new_beta = jnp.where(at_end, beta_init, rec)
        # past the end (t >= len): value unused, keep init for stability
        new_beta = jnp.where((t >= logit_lengths)[:, None], beta_init, new_beta)
        return new_beta, new_beta

    _, betas_rev = lax.scan(
        bstep, beta_init, jnp.arange(t_max - 1, -1, -1)
    )
    betas = betas_rev[::-1]  # [T, B, S]

    # posterior over slots; -dL/demit = posterior
    t_idx = jnp.arange(t_max)[:, None, None]
    active = t_idx < logit_lengths[None, :, None]
    gamma = alphas + betas + nll[None, :, None]  # log post (nll = -log p)
    post = jnp.where(
        active & ~ignore[None, :, None] & (gamma > _NEG_INF / 2),
        jnp.exp(jnp.minimum(gamma, 0.0)),
        0.0,
    )  # [T, B, S]
    demit = -jnp.transpose(post, (1, 0, 2))  # [B, T, S]
    dlp = jnp.einsum("bts,bsc->btc", demit, onehot)
    # log_softmax VJP: dlogits = dlp - softmax * sum_c dlp
    dlogits = dlp - jnp.exp(lp) * jnp.sum(dlp, axis=-1, keepdims=True)
    dlogits = dlogits * g[:, None, None]
    return dlogits, None, None, None


ctc_loss.defvjp(_ctc_loss_fwd, _ctc_loss_bwd)


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
