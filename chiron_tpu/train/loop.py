"""Unified data-parallel trainer (replaces all three reference trainers).

One jitted train step over a data-parallel mesh supersedes
chiron_rcnn_train.py (feed-dict), chiron_train.py (queue input), and
chiron_multi_gpu_train.py (in-graph towers + CPU gradient averaging): the
batch is sharded on the mesh's 'data' axis, parameters are replicated, and
XLA GSPMD inserts the gradient all-reduce over ICI — the TPU-native
equivalent of ``average_gradients`` (chiron_multi_gpu_train.py:48-72).

Optimisation parity with chiron/chiron_model.py:20-99:
  * piecewise-constant LR at 66% / 83% of max_steps x {1, 0.1, 0.01}
  * Adam / SGD / RMSProp / Momentum(nesterov 0.9)
  * optional per-gradient norm clipping
  * exponential moving average of weights (decay 0.9999)
  * CTC loss with focal modulation (fl_gamma)
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chiron_tpu import config as C
from chiron_tpu.io.labels import read_raw_data_sets
from chiron_tpu.models import apply_model, init_model, model_ratio
from chiron_tpu.ops.ctc_greedy import greedy_decode
from chiron_tpu.ops.ctc_loss import ctc_focal_loss
from chiron_tpu.parallel.mesh import (
    local_rows,
    make_mesh,
    replicate,
    shard_batch,
)
from chiron_tpu.train.checkpoint import restore_latest, save_checkpoint

MOVING_AVERAGE_DECAY = 0.9999
LR_BOUNDARY = [0.66, 0.83]
LR_DECAY = [1e-1, 1e-2]
MOMENTUM = 0.9


def make_lr_schedule(init_rate: float, max_steps: int):
    boundaries = {
        int(max_steps * LR_BOUNDARY[0]): LR_DECAY[0],
        int(max_steps * LR_BOUNDARY[1]): LR_DECAY[1] / LR_DECAY[0],
    }
    return optax.piecewise_constant_schedule(init_rate, boundaries)


def make_optimizer(
    opt_name: str, init_rate: float, max_steps: int, clip_norm: Optional[float] = None
):
    schedule = make_lr_schedule(init_rate, max_steps)
    opts = {
        "Adam": lambda: optax.adam(schedule),
        "SGD": lambda: optax.sgd(schedule),
        "RMSProp": lambda: optax.rmsprop(schedule),
        "Momentum": lambda: optax.sgd(schedule, momentum=MOMENTUM, nesterov=True),
    }
    if opt_name not in opts:
        raise ValueError(f"Unknown optimizer {opt_name}")
    tx = opts[opt_name]()
    if clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def make_train_step(config: Dict[str, Any], tx, fl_gamma: float):
    """Jitted step: (params, ema, opt_state, batch) -> (..., loss)."""

    def loss_fn(params, batch):
        logits = apply_model(params, config, batch["signal"], batch["seq_len"],
                             training=True)
        return ctc_focal_loss(
            logits,
            batch["seq_len"],
            batch["label"],
            batch["label_len"],
            fl_gamma=fl_gamma,
        )

    @jax.jit
    def step(params, ema_params, opt_state, batch, n_updates):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # tf.train.ExponentialMovingAverage's num_updates ramp: without it
        # a warm-started or short run's EMA is dominated by its first steps
        # (measured: an EMA poisoned this way decoded ZERO bases while the
        # raw weights sat at 0.38 edit distance)
        decay = jnp.minimum(
            MOVING_AVERAGE_DECAY, (1.0 + n_updates) / (10.0 + n_updates)
        )
        ema_params = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            ema_params,
            params,
        )
        return params, ema_params, opt_state, loss

    return step


def make_eval_step(config: Dict[str, Any]):
    @jax.jit
    def step(params, batch):
        logits = apply_model(params, config, batch["signal"], batch["seq_len"])
        return greedy_decode(logits, batch["seq_len"])

    return step


def edit_distance(a, b) -> int:
    """Levenshtein distance between two int sequences."""
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (np.asarray(b) != ca)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[-1])


def batched_edit_distance(hyps, hyp_lens, refs, ref_lens) -> np.ndarray:
    """Levenshtein distance for a batch of padded int sequences.

    One 2-D DP wavefront over the whole batch: row ``i`` of every pair's DP
    table is computed at once, with the in-row insertion recurrence
    (``cur[j] = min(cand[j], cur[j-1]+1)``) resolved as a min-plus prefix
    scan (``min.accumulate(cand[j]-j)+j``) instead of a Python ``j`` loop.
    Each pair's result is captured when the wavefront passes its hypothesis
    length.
    """
    hyps = np.asarray(hyps)
    refs = np.asarray(refs)
    hyp_lens = np.asarray(hyp_lens, np.int64)
    ref_lens = np.asarray(ref_lens, np.int64)
    b = len(hyp_lens)
    max_h = int(hyp_lens.max(initial=0))
    max_r = int(ref_lens.max(initial=0))
    cols = np.arange(max_r + 1)
    prev = np.broadcast_to(cols, (b, max_r + 1)).copy()
    out = np.where(hyp_lens == 0, ref_lens, 0)
    ref_mat = refs[:, :max_r] if refs.size else refs.reshape(b, 0)
    for i in range(1, max_h + 1):
        ca = hyps[:, i - 1:i]
        sub = prev[:, :-1] + (ref_mat != ca)
        cand = np.minimum(prev[:, 1:] + 1, sub)
        e = np.concatenate([np.full((b, 1), i, np.int64), cand], axis=1) - cols
        cur = np.minimum.accumulate(e, axis=1) + cols
        done = hyp_lens == i
        if done.any():
            out[done] = cur[done, ref_lens[done]]
        prev = cur
    return out


def mean_edit_distance(decoded, dec_lens, labels, label_lens) -> float:
    """Mean normalized edit distance (chiron/chiron_model.py:124-130).

    Vectorized over the batch (one wavefront DP instead of a per-pair
    Python O(n*m) loop).
    """
    n = len(decoded)
    if n == 0:
        return 0.0
    dec_lens = np.asarray(dec_lens, np.int64)
    label_lens = np.asarray(label_lens, np.int64)
    d = batched_edit_distance(np.asarray(decoded), dec_lens,
                              np.asarray(labels), label_lens)
    return float(np.mean(d / np.maximum(label_lens, 1)))


class Dataset:
    """Shuffled epoch batcher over dense training arrays."""

    def __init__(self, events, event_lens, labels, label_lens, seed=0):
        self.events = events
        self.event_lens = event_lens
        self.labels = labels
        self.label_lens = label_lens
        self.n = len(events)
        self.rng = np.random.RandomState(seed)
        self._perm = self.rng.permutation(self.n)
        self._pos = 0
        self.epochs_completed = 0

    def next_batch(self, batch_size: int, shuffle: bool = True):
        idx = []
        while len(idx) < batch_size:
            take = min(batch_size - len(idx), self.n - self._pos)
            idx.extend(self._perm[self._pos:self._pos + take])
            self._pos += take
            if self._pos >= self.n:
                self.epochs_completed += 1
                self._pos = 0
                if shuffle:
                    self._perm = self.rng.permutation(self.n)
        idx = np.asarray(idx)
        return {
            "signal": self.events[idx],
            "seq_len": self.event_lens[idx],
            "label": self.labels[idx],
            "label_len": self.label_lens[idx],
        }


def load_dataset(
    data_dir, seq_len, k_mer=1, max_segments=None, skip_start=10, sig_norm=None,
    tfrecord=None, cache_dir=None, file_shard=None,
):
    """Load training segments from .signal/.label pairs, a .bin folder, OR
    a TFRecord file.

    A folder with a ``data.meta`` descriptor is the fixed-record .bin batch
    layout (file_batch output, chiron_queue_input's source); ``tfrecord``
    selects the reference's TFRecord training layout (chiron_input.py:318);
    anything else is walked for .signal/.label pairs. ``cache_dir`` selects
    the out-of-core path (io/cache.py — the biglist spill equivalent,
    chiron_input.py:42-120): windows stream to disk shards and batches are
    served by positioned reads in bounded RSS.

    ``file_shard=(index, count)`` restricts loading to a disjoint file
    subset — under multi-process training each process materialises only
    its shard of the corpus (.bin/tfrecord sources instead keep every
    count-th row, since their read IS the materialisation).
    """
    if cache_dir:
        from chiron_tpu.io.cache import cached_dataset

        return cached_dataset(
            data_dir, cache_dir, seq_len, k_mer=k_mer, skip_start=skip_start,
            sig_norm=sig_norm, max_segments=max_segments,
            file_shard=file_shard,
        )
    if not tfrecord and os.path.isfile(data_dir) and data_dir.endswith(
        (".tfrecord", ".tfrecords")
    ):
        # a tfrecord FILE given directly (e.g. the --validation flag takes a
        # validation tfrecord in the reference, entry.py:115)
        tfrecord = os.path.abspath(data_dir)
    if tfrecord:
        from chiron_tpu.io.tfrecord import read_tfrecord_data_sets

        path = tfrecord if os.path.isabs(tfrecord) else os.path.join(
            data_dir, tfrecord
        )
        arrays = read_tfrecord_data_sets(
            path, seq_length=seq_len, k_mer=k_mer,
            max_segments_num=max_segments, skip_start=skip_start,
            sig_norm=sig_norm,
        )
        if file_shard is not None:
            idx, count = file_shard
            arrays = tuple(a[idx::count] for a in arrays)
        return Dataset(*arrays)
    if os.path.exists(os.path.join(data_dir, "data.meta")):
        from chiron_tpu.io.binfmt import read_bin_folder

        events, event_lens, labels, label_lens = read_bin_folder(data_dir)
        if events.shape[1] != seq_len:
            raise ValueError(
                f".bin records have signal_length {events.shape[1]}; "
                f"--sequence_len {seq_len} must match"
            )
        if file_shard is not None:
            idx, count = file_shard
            events = events[idx::count]
            event_lens = event_lens[idx::count]
            labels = labels[idx::count]
            label_lens = label_lens[idx::count]
        if max_segments:
            events = events[:max_segments]
            event_lens = event_lens[:max_segments]
            labels = labels[:max_segments]
            label_lens = label_lens[:max_segments]
        return Dataset(events, event_lens, labels, label_lens)
    arrays = read_raw_data_sets(
        data_dir, seq_length=seq_len, k_mer=k_mer,
        max_segments_num=max_segments, skip_start=skip_start, sig_norm=sig_norm,
        file_shard=file_shard,
    )
    return Dataset(*arrays)


def train(hparams) -> Dict[str, Any]:
    """Main training loop (parity: chiron/chiron_rcnn_train.py:66-136)."""
    model_dir = os.path.join(hparams.log_dir, hparams.model_name)
    os.makedirs(model_dir, exist_ok=True)
    # params are replicated, so only process 0 writes checkpoints/metrics
    # (hosts may share a filesystem)
    is_writer = jax.process_index() == 0
    config_path = os.path.join(model_dir, "model.json")
    if getattr(hparams, "retrain", False) and os.path.exists(config_path):
        config = C.read_config(config_path)
    else:
        config = C.read_config(getattr(hparams, "configure", None))
    if is_writer:
        C.save_config(config_path, config)
        # dump the run flags beside the model (chiron_rcnn_train.py:77-81)
        with open(os.path.join(model_dir, "train_config"), "w") as f:
            json.dump({k: str(v) for k, v in vars(hparams).items()}, f,
                      indent=2)

    mesh = make_mesh(getattr(hparams, "n_devices", 0))
    n_dev = len(mesh.devices.ravel())
    n_proc = jax.process_count()
    batch_size = hparams.batch_size
    lcm = n_dev * n_proc // math.gcd(n_dev, n_proc) if n_proc > 1 else n_dev
    if batch_size % lcm:
        batch_size += lcm - batch_size % lcm
        print(f"Rounded batch size up to {batch_size} for {n_dev} devices "
              f"x {n_proc} processes")
    # under jax.distributed each process loads a disjoint file shard and
    # feeds only its slice of the global batch (mesh.shard_batch assembles
    # the global array from per-process local rows)
    local_batch = batch_size // n_proc
    file_shard = (jax.process_index(), n_proc) if n_proc > 1 else None

    seq_len = hparams.sequence_len
    ratio = model_ratio(config, seq_len)

    sig_norm = getattr(hparams, "sig_norm", None)

    def _shard_cache(cache_dir):
        # each process's cache holds only its file shard (build params embed
        # (process_index, n_proc)); on a shared filesystem every process
        # must therefore write a DISJOINT cache dir or they would race to
        # rebuild/invalidate the same one with different shards
        if cache_dir and n_proc > 1:
            return os.path.join(cache_dir, f"shard{jax.process_index()}")
        return cache_dir

    train_cache = _shard_cache(getattr(hparams, "train_cache", None))
    valid_cache = _shard_cache(getattr(hparams, "valid_cache", None))
    dataset = load_dataset(
        hparams.data_dir,
        seq_len,
        k_mer=int(getattr(hparams, "k_mer", 1)),
        max_segments=getattr(hparams, "segments_num", None),
        sig_norm=sig_norm,
        tfrecord=getattr(hparams, "tfrecord", None),
        cache_dir=train_cache,
        file_shard=file_shard,
    )
    if dataset.n == 0:
        raise ValueError(f"No training segments found under {hparams.data_dir}")
    print(f"Loaded {dataset.n} training segments")
    valid = None
    if getattr(hparams, "validation", None):
        valid = load_dataset(hparams.validation, seq_len, sig_norm=sig_norm,
                             cache_dir=valid_cache,
                             file_shard=file_shard)

    params, start_step = (None, None)
    if getattr(hparams, "retrain", False):
        params, start_step = restore_latest(model_dir)
    if params is None:
        params = init_model(jax.random.PRNGKey(0), config)
        start_step = 0
    start_step = start_step or 0
    params = replicate(mesh, params)
    ema_params = params

    tx = make_optimizer(
        config.get("opt_method", "Adam"), hparams.step_rate, hparams.max_steps
    )
    opt_state = replicate(mesh, tx.init(jax.device_get(params)))
    step_fn = make_train_step(config, tx, float(config.get("fl_gamma", 0)))
    eval_fn = make_eval_step(config)

    # Host-RSS guard: the axon remote-TPU client pins every uploaded host
    # buffer for the life of the process (measured: exactly one batch of
    # bytes leaked per step, with/without explicit Array.delete, via
    # device_put or numpy-staged args alike — a client-side pin, not a
    # framework leak; the CPU backend is flat). Long runs on that backend
    # would otherwise die by OOM-kill mid-schedule (observed at 130 GB /
    # 28k steps). When RSS crosses the limit the loop checkpoints and
    # returns restart=True so a wrapper can relaunch with --retrain.
    max_rss_gb = float(getattr(hparams, "max_rss_gb", 0) or 64.0)

    def _rss_gb() -> float:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    metrics_path = os.path.join(model_dir, "metrics.jsonl")
    lr_schedule = make_lr_schedule(hparams.step_rate, hparams.max_steps)
    save_every = int(getattr(hparams, "save_every", 10))
    # periodic EMA side snapshot (rolling, pointer untouched): long
    # schedules on shared hardware get stopped mid-run; without this the
    # EMA lives only in process memory until the final step and a killed
    # run has no installable ema-<step>.npz (stage_install needs one)
    ema_save_every = int(getattr(hparams, "ema_save_every", 2000) or 0)
    resample_every = int(getattr(hparams, "resample_after_epoch", 0) or 0)
    offset_inc = int(getattr(hparams, "offset_increment", 3))
    skip_start = 10
    losses = []
    t0 = time.time()
    last_loss = None
    for i in range(start_step, hparams.max_steps):
        if (
            resample_every > 0
            and dataset.epochs_completed > 0
            and dataset.epochs_completed % resample_every == 0
            and dataset._pos == 0
        ):
            skip_start += offset_inc
            if hasattr(dataset, "close"):
                dataset.close()
            dataset = load_dataset(
                hparams.data_dir, seq_len,
                k_mer=int(getattr(hparams, "k_mer", 1)),
                max_segments=getattr(hparams, "segments_num", None),
                skip_start=skip_start,
                sig_norm=sig_norm,
                tfrecord=getattr(hparams, "tfrecord", None),
                cache_dir=train_cache,
                file_shard=file_shard,
            )
        batch = dataset.next_batch(local_batch)
        batch["seq_len"] = np.round(batch["seq_len"] / ratio).astype(np.int32)
        batch = shard_batch(mesh, batch)
        params, ema_params, opt_state, loss = step_fn(
            params, ema_params, opt_state, batch,
            np.float32(i - start_step),  # EMA updates since (re)init
        )
        if (i + 1) % save_every == 0 or (i + 1) == hparams.max_steps:
            last_loss = float(loss)
            losses.append(last_loss)
            err = None
            if valid is not None:
                vbatch = valid.next_batch(local_batch)
                vbatch["seq_len"] = np.round(vbatch["seq_len"] / ratio).astype(np.int32)
                dec, dlens, _ = eval_fn(params, shard_batch(mesh, vbatch))
                # only this process's rows are addressable under
                # multi-process meshes — score the local shard (they are
                # exactly the rows this process fed)
                err = mean_edit_distance(
                    local_rows(dec), local_rows(dlens),
                    vbatch["label"], vbatch["label_len"],
                )
            if is_writer:
                save_checkpoint(model_dir, params, i + 1)
            dt = time.time() - t0
            msg = f"step {i + 1} loss {last_loss:.4f} {dt / save_every:.3f}s/step"
            if err is not None:
                msg += f" valid_edit_dist {err:.4f}"
            print(msg)
            # metrics stream (the reference's TensorBoard scalars analog,
            # chiron_model.py:73,131): one JSON object per evaluation point
            if is_writer:
                with open(metrics_path, "a") as mf:
                    mf.write(json.dumps({
                        "step": i + 1,
                        "loss": last_loss,
                        "learning_rate": float(lr_schedule(i + 1)),
                        "valid_edit_distance": err,
                        "seconds_per_step": dt / save_every,
                    }) + "\n")
            t0 = time.time()
            if (is_writer and ema_save_every
                    and (i + 1) % ema_save_every == 0
                    and (i + 1) != hparams.max_steps):
                save_checkpoint(model_dir, ema_params, i + 1, prefix="ema",
                                update_state=False, max_to_keep=2)
            if max_rss_gb and _rss_gb() > max_rss_gb:
                # checkpoint state is already on disk (save above); save
                # the EMA too so even an un-resumed run has usable weights
                if is_writer:
                    # update_state=False: the restart chain must resume
                    # from the raw model-<step> params saved above, not
                    # this EMA side snapshot (ADVICE r4 #2)
                    save_checkpoint(model_dir, ema_params, i + 1,
                                    prefix="rss-ema", update_state=False)
                print(f"RSS {_rss_gb():.1f} GB > {max_rss_gb} GB limit "
                      f"(axon client buffer pinning) at step {i + 1}; "
                      f"exiting for --retrain restart")
                return {"final_loss": last_loss, "losses": losses,
                        "model_dir": model_dir, "restart": True,
                        "step": i + 1}
    # final checkpoint includes the EMA weights separately (side snapshot:
    # the pointer must name the raw final params, even if the process dies
    # between the two saves)
    if is_writer:
        save_checkpoint(model_dir, ema_params, hparams.max_steps, prefix="ema",
                        update_state=False)
        save_checkpoint(model_dir, params, hparams.max_steps, prefix="final")
    return {"final_loss": last_loss, "losses": losses, "model_dir": model_dir}


def run(args):
    return train(args)
