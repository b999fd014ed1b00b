"""Experimental attention decode head (parity: chiron/utils/attention.py).

The reference carries an unused seq2seq attention decoder experiment
(utils/attention.py:13-203, never wired into the main path). This is the
TPU-native equivalent: a Bahdanau-attention GRU decoder over the encoder
features, trained with teacher forcing, decoding with greedy argmax. Kept
out of the main basecall path, exactly like the reference.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from chiron_tpu.config import NUM_CLASSES
from chiron_tpu.models.initializers import xavier_uniform

Params = Dict[str, Any]

GO_TOKEN = NUM_CLASSES  # decoder input vocabulary adds a <go> symbol


def init_attention_decoder(
    key, enc_dim: int, hidden: int, class_n: int = NUM_CLASSES
) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "embed": xavier_uniform(ks[0], (class_n + 1, hidden)),
        # Bahdanau score: v^T tanh(W_e e + W_h h)
        "att_we": xavier_uniform(ks[1], (enc_dim, hidden)),
        "att_wh": xavier_uniform(ks[2], (hidden, hidden)),
        "att_v": xavier_uniform(ks[3], (hidden, 1)),
        # GRU over [embed, context]
        "gru_wx": xavier_uniform(ks[4], (hidden + enc_dim, 3 * hidden)),
        "gru_wh": xavier_uniform(ks[5], (hidden, 3 * hidden)),
        "gru_b": jnp.zeros((3 * hidden,)),
        "out_w": xavier_uniform(ks[6], (hidden + enc_dim, class_n)),
        "out_b": jnp.zeros((class_n,)),
    }


def _gru_cell(params: Params, x, h):
    gates = x @ params["gru_wx"][:, : 2 * h.shape[-1]] + \
        h @ params["gru_wh"][:, : 2 * h.shape[-1]] + params["gru_b"][: 2 * h.shape[-1]]
    r, u = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
    hd = h.shape[-1]
    cand = jnp.tanh(
        x @ params["gru_wx"][:, 2 * hd:] + (r * h) @ params["gru_wh"][:, 2 * hd:]
        + params["gru_b"][2 * hd:]
    )
    return u * h + (1 - u) * cand


def _attend(params: Params, enc, enc_mask, h):
    # enc: [B, T, E]; h: [B, H] -> context [B, E], weights [B, T]
    score = jnp.tanh(enc @ params["att_we"] + (h @ params["att_wh"])[:, None, :])
    logits = (score @ params["att_v"])[..., 0]  # [B, T]
    logits = jnp.where(enc_mask, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1)
    context = jnp.einsum("bt,bte->be", weights, enc)
    return context, weights


def attention_decode(
    params: Params,
    encodings: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    max_steps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy attention decoding.

    Returns (tokens [B, max_steps] int32, logits [B, max_steps, C]).
    """
    b, t, e = encodings.shape
    hidden = params["att_wh"].shape[0]
    enc_mask = jnp.arange(t)[None, :] < enc_lengths[:, None]
    h0 = jnp.zeros((b, hidden))
    tok0 = jnp.full((b,), GO_TOKEN, jnp.int32)

    def step(carry, _):
        h, tok = carry
        emb = params["embed"][tok]
        context, _ = _attend(params, encodings, enc_mask, h)
        h = _gru_cell(params, jnp.concatenate([emb, context], -1), h)
        logits = jnp.concatenate([h, context], -1) @ params["out_w"] + params["out_b"]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (h, nxt), (nxt, logits)

    _, (tokens, logits) = lax.scan(step, (h0, tok0), None, length=max_steps)
    return jnp.transpose(tokens), jnp.transpose(logits, (1, 0, 2))


def attention_teacher_forcing_loss(
    params: Params,
    encodings: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Cross-entropy with teacher forcing (training objective)."""
    b, u = targets.shape
    hidden = params["att_wh"].shape[0]
    t = encodings.shape[1]
    enc_mask = jnp.arange(t)[None, :] < enc_lengths[:, None]
    h0 = jnp.zeros((b, hidden))
    inputs = jnp.concatenate(
        [jnp.full((b, 1), GO_TOKEN, jnp.int32), targets[:, :-1].astype(jnp.int32)],
        axis=1,
    )

    def step(h, tok):
        emb = params["embed"][tok]
        context, _ = _attend(params, encodings, enc_mask, h)
        h = _gru_cell(params, jnp.concatenate([emb, context], -1), h)
        logits = jnp.concatenate([h, context], -1) @ params["out_w"] + params["out_b"]
        return h, logits

    _, logits = lax.scan(step, h0, jnp.transpose(inputs))
    logits = jnp.transpose(logits, (1, 0, 2))  # [B, U, C]
    logp = jax.nn.log_softmax(logits)
    tgt = jnp.clip(targets, 0, NUM_CLASSES - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = jnp.arange(u)[None, :] < target_lengths[:, None]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
