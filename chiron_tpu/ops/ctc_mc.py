"""Experimental CTC decoders: Monte-Carlo, exact enumeration, sections.

Reference parity: chiron/utils/easy_assembler.py:69-206 implements three
experimental decoders (``section_decoding``, ``best_path``, ``mc_path`` /
``mc_decoding``) as per-window numpy loops (300 sequential path samples per
window, Python ``mapping`` collapse per sample). TPU-first re-design:

* ``mc_decode``: ALL paths for ALL windows are sampled in one device
  program (``jax.random.categorical`` over [S, B, T]), CTC-collapsed with
  the same vectorized sort-based compaction the greedy decoder uses, and
  returned as one packed label matrix; the host only computes per-window
  mode counts (np.unique) and the 10*log10(p1/p2) quality score.
* ``best_path_decode``: the reference's base_num**T Python loop becomes a
  vectorized mixed-radix enumeration; per-label-sequence probability mass
  is aggregated with np.unique + bincount (an exact marginalisation over
  alignments, i.e. exact CTC decoding for tiny T).
* ``section_decoding``: windows are cut where blank probability exceeds
  the threshold; the variable-length sections are padded into ONE batch
  and decoded with a single ``mc_decode`` call instead of per-section
  loops.

Deviations from the reference (documented, intentional):
* path probabilities use softmax probabilities; the reference's
  ``best_path`` multiplies raw logits as if they were probabilities
  (easy_assembler.py:104-106) which is not a probability model.
* the reference's ``mc_path`` crashes when all samples agree (indexes
  most_common(2)[1]); here p2 falls back to 1/sample_n, giving a finite
  quality ceiling.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu.ops.ctc_greedy import compact_labels

_ALPHABET = "ACGT"


def _collapse_paths(paths: jnp.ndarray, lengths: jnp.ndarray, blank: int):
    """CTC-collapse sampled paths [N, T] (merge repeats, drop blanks)."""
    n, t = paths.shape
    tidx = jnp.arange(t)[None, :]
    valid = tidx < lengths[:, None]
    prev = jnp.pad(paths, ((0, 0), (1, 0)), constant_values=-1)[:, :t]
    keep = valid & (paths != blank) & (paths != prev)
    return compact_labels(paths, keep)


@functools.partial(jax.jit, static_argnames=("sample_n",))
def _sample_and_collapse(logits, seq_lengths, key, sample_n: int):
    s = sample_n
    b, t, c = logits.shape
    paths = jax.random.categorical(
        key, logits[None], axis=-1, shape=(s, b, t)
    ).astype(jnp.int32)
    flat = paths.reshape(s * b, t)
    lens = jnp.tile(seq_lengths.astype(jnp.int32), (s,))
    decoded, dlens = _collapse_paths(flat, lens, c - 1)
    return decoded.reshape(s, b, t), dlens.reshape(s, b)


def _mode_and_qs(decoded: np.ndarray, sample_n: int) -> Tuple[np.ndarray, int, float]:
    """Most-common row of [S, T'] + 10*log10(p1/p2) quality score."""
    uniq, inv = np.unique(decoded, axis=0, return_inverse=True)
    counts = np.bincount(inv)
    order = np.argsort(counts)[::-1]
    p1 = counts[order[0]] / sample_n
    p2 = (counts[order[1]] if len(order) > 1 else 1) / sample_n
    p2 = max(p2, 1.0 / sample_n)
    return uniq[order[0]], int(counts[order[0]]), 10.0 * math.log10(p1 / p2)


def mc_decode(
    logits,
    seq_lengths,
    key=None,
    sample_n: int = 300,
    alphabet: str = _ALPHABET,
) -> Tuple[List[str], List[float]]:
    """Monte-Carlo CTC decode (parity: easy_assembler.py:122-206).

    Samples ``sample_n`` alignment paths per window from the per-frame
    posterior, CTC-collapses them on device, and returns the most frequent
    label string per window plus a 10*log10(p1/p2) confidence score.

    Args:
      logits: [B, T, C] or [T, C] raw logits.
      seq_lengths: [B] valid frame counts ([T]*1 for the 2D form).
      key: jax PRNG key (default: PRNGKey(0)).
      sample_n: Monte-Carlo sample count.
    Returns:
      (decoded strings [B], quality scores [B]).
    """
    logits = jnp.asarray(logits)
    if logits.ndim == 2:
        logits = logits[None]
    b, t, _ = logits.shape
    if seq_lengths is None:
        seq_lengths = jnp.full((b,), t, jnp.int32)
    seq_lengths = jnp.asarray(seq_lengths, jnp.int32)
    if key is None:
        key = jax.random.PRNGKey(0)
    decoded, dlens = _sample_and_collapse(logits, seq_lengths, key, sample_n)
    decoded = np.asarray(decoded)
    dlens = np.asarray(dlens)
    strings, scores = [], []
    for i in range(b):
        # compare full padded rows: equal strings have equal padding
        best, _, qs = _mode_and_qs(decoded[:, i, :], sample_n)
        n = int((best >= 0).sum())
        strings.append("".join(alphabet[x] for x in best[:n]))
        scores.append(qs)
    return strings, scores


def best_path_decode(
    logits, alphabet: str = _ALPHABET, max_frames: int = 9
) -> str:
    """Exact CTC decode by full path enumeration (easy_assembler.py:101-119).

    Marginalises alignment probability over every possible path (C**T of
    them) and returns the label string with the largest total mass — the
    exact MAP label sequence. Exponential: guarded to T <= ``max_frames``.
    """
    logits = np.asarray(logits, np.float32)
    t, c = logits.shape
    if t > max_frames:
        raise ValueError(
            f"best_path_decode enumerates {c}**T paths; T={t} > {max_frames}"
        )
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)

    n = c ** t
    idx = np.arange(n, dtype=np.int64)
    digits = (idx[:, None] // c ** np.arange(t, dtype=np.int64)[None, :]) % c
    path_p = np.ones(n, np.float64)
    for j in range(t):
        path_p *= probs[j, digits[:, j]]
    # CTC collapse (merge repeats then drop blanks), vectorized
    blank = c - 1
    prev = np.concatenate([np.full((n, 1), -1, np.int64), digits[:, :-1]], 1)
    keep = (digits != blank) & (digits != prev)
    order = np.argsort(np.where(keep, np.arange(t), t + np.arange(t)), axis=1)
    packed = np.take_along_axis(digits, order, axis=1)
    lens = keep.sum(axis=1)
    packed = np.where(np.arange(t)[None, :] < lens[:, None], packed, -1)
    uniq, inv = np.unique(packed, axis=0, return_inverse=True)
    mass = np.bincount(inv, weights=path_p)
    best = uniq[np.argmax(mass)]
    return "".join(alphabet[x] for x in best[: (best >= 0).sum()])


def section_decoding(
    logits,
    blank_thres: float = 0.6,
    key=None,
    sample_n: int = 300,
    alphabet: str = _ALPHABET,
) -> List[str]:
    """Cut windows at blank-dominated frames, MC-decode each section
    (easy_assembler.py:69-98).

    All sections from all windows are padded into ONE [n_sections, L, C]
    batch (heavily-blank pad frames decode to nothing) and decoded with a
    single device call, then re-joined per window in order.
    """
    logits = np.asarray(logits, np.float32)
    if logits.ndim == 2:
        logits = logits[None]
    b, t, c = logits.shape
    probs = np.exp(logits - logits.max(axis=2, keepdims=True))
    probs /= probs.sum(axis=2, keepdims=True)
    nonblank = probs[:, :, c - 1] < blank_thres

    spans: List[Tuple[int, int, int]] = []  # (window, start, stop)
    for i in range(b):
        on = np.flatnonzero(nonblank[i])
        if len(on) == 0:
            continue
        breaks = np.flatnonzero(np.diff(on) > 1)
        starts = np.concatenate([[0], breaks + 1])
        stops = np.concatenate([breaks, [len(on) - 1]])
        spans.extend((i, int(on[s]), int(on[e]) + 1) for s, e in zip(starts, stops))

    if not spans:
        return [""] * b
    max_len = max(stop - start for _, start, stop in spans)
    batch = np.zeros((len(spans), max_len, c), np.float32)
    # pad frames get a strong blank logit so they contribute no labels
    batch[:, :, c - 1] = 30.0
    lens = np.zeros(len(spans), np.int32)
    for k, (i, start, stop) in enumerate(spans):
        batch[k, : stop - start] = logits[i, start:stop]
        lens[k] = stop - start
    strings, _ = mc_decode(batch, lens, key=key, sample_n=sample_n,
                           alphabet=alphabet)
    out = [""] * b
    for k, (i, _, _) in enumerate(spans):
        out[i] += strings[k]
    return out
