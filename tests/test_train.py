import os
import types

import jax
import numpy as np

from synth import make_training_dir


def _hparams(tmp_path, **kw):
    h = types.SimpleNamespace(
        data_dir=os.path.join(str(tmp_path), "train"),
        log_dir=os.path.join(str(tmp_path), "log"),
        model_name="test_model",
        validation=None,
        sequence_len=200,
        batch_size=16,
        step_rate=2e-3,
        max_steps=60,
        segments_num=None,
        configure=None,
        k_mer=1,
        retrain=False,
        resample_after_epoch=0,
        offset_increment=3,
        n_devices=1,
        save_every=20,
    )
    for k, v in kw.items():
        setattr(h, k, v)
    return h


def _tiny_config(tmp_path):
    import json

    cfg = {
        "cnn": {"model": "custom"},
        "rnn": {"layer_num": 1, "hidden_num": 32, "cell_type": "LSTM",
                "layer_type": "normal"},
        "opt_method": "Adam",
        "fl_gamma": 0,
    }
    path = os.path.join(str(tmp_path), "config.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def test_training_reduces_loss_and_learns(tmp_path):
    from chiron_tpu.train import loop

    make_training_dir(os.path.join(str(tmp_path), "train"), n_files=3,
                      n_bases=400, seed=0)
    h = _hparams(tmp_path, configure=_tiny_config(tmp_path), max_steps=120,
                 step_rate=4e-3)
    result = loop.train(h)
    losses = result["losses"]
    assert len(losses) >= 3
    # must fall substantially on this trivially learnable mapping
    assert losses[-1] < losses[0] * 0.7, losses
    # checkpoints + model.json written
    mdir = result["model_dir"]
    assert os.path.exists(os.path.join(mdir, "model.json"))
    assert os.path.exists(os.path.join(mdir, "checkpoint"))
    assert any(f.startswith("final-") for f in os.listdir(mdir))
    assert any(f.startswith("ema-") for f in os.listdir(mdir))


def test_training_with_out_of_core_cache(tmp_path):
    # --train_cache routes batches through the on-disk window cache
    from chiron_tpu.train import loop

    make_training_dir(os.path.join(str(tmp_path), "train"), n_files=2,
                      n_bases=300, seed=2)
    h = _hparams(tmp_path, configure=_tiny_config(tmp_path), max_steps=20,
                 train_cache=os.path.join(str(tmp_path), "cache"))
    result = loop.train(h)
    assert result["final_loss"] is not None
    assert os.path.exists(os.path.join(str(tmp_path), "cache",
                                       "cache.meta.json"))


def test_retrain_restores(tmp_path):
    from chiron_tpu.train import loop

    make_training_dir(os.path.join(str(tmp_path), "train"), n_files=2,
                      n_bases=200, seed=1)
    h = _hparams(tmp_path, configure=_tiny_config(tmp_path), max_steps=20)
    loop.train(h)
    h2 = _hparams(tmp_path, configure=_tiny_config(tmp_path), max_steps=30,
                  retrain=True)
    result = loop.train(h2)
    assert result["final_loss"] is not None


def test_data_parallel_matches_single_device(tmp_path):
    # The same batch stepped on a 1-device and an 8-device mesh must give
    # (numerically close) identical parameters — GSPMD psum == big batch.
    from chiron_tpu import config as C
    from chiron_tpu.models import init_model
    from chiron_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from chiron_tpu.train.loop import make_optimizer, make_train_step

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = C.default_config()
    cfg["cnn"]["model"] = "custom"
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 8, "cell_type": "LSTM",
                  "layer_type": "normal"}
    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "signal": rng.randn(16, 64).astype(np.float32),
        "seq_len": np.full(16, 64, np.int32),
        "label": rng.randint(0, 4, (16, 10)).astype(np.int32),
        "label_len": np.full(16, 10, np.int32),
    }
    results = {}
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        tx = make_optimizer("Adam", 1e-3, 100)
        step = make_train_step(cfg, tx, 0.0)
        p = replicate(mesh, params)
        ema = p
        opt = replicate(mesh, tx.init(jax.device_get(p)))
        b = shard_batch(mesh, batch)
        for it in range(3):
            p, ema, opt, loss = step(p, ema, opt, b, np.float32(it))
        results[ndev] = (jax.device_get(p), float(loss))
    p1, l1 = results[1]
    p8, l8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_edit_distance():
    from chiron_tpu.train.loop import edit_distance

    assert edit_distance([0, 1, 2], [0, 1, 2]) == 0
    assert edit_distance([0, 1, 2], [0, 2]) == 1
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([0, 1], [1, 0]) == 2


def test_batched_edit_distance_matches_scalar():
    from chiron_tpu.train.loop import batched_edit_distance, edit_distance

    rng = np.random.RandomState(7)
    for _ in range(10):
        b = rng.randint(1, 8)
        max_h, max_r = rng.randint(0, 24), rng.randint(0, 20)
        hyps = rng.randint(0, 4, (b, max(max_h, 1)))
        refs = rng.randint(0, 4, (b, max(max_r, 1)))
        hl = rng.randint(0, max_h + 1, b)
        rl = rng.randint(0, max_r + 1, b)
        got = batched_edit_distance(hyps, hl, refs, rl)
        want = [
            edit_distance(list(hyps[i][: hl[i]]), list(refs[i][: rl[i]]))
            for i in range(b)
        ]
        assert got.tolist() == want


def test_training_writes_metrics_jsonl(tmp_path):
    import json

    from chiron_tpu.train import loop

    make_training_dir(os.path.join(str(tmp_path), "train"), n_files=2,
                      n_bases=150, seed=5)
    h = _hparams(tmp_path, configure=_tiny_config(tmp_path), max_steps=20,
                 save_every=10)
    result = loop.train(h)
    path = os.path.join(result["model_dir"], "metrics.jsonl")
    assert os.path.exists(path)
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 2
    assert {"step", "loss", "learning_rate", "seconds_per_step"} <= set(rows[0])


def test_checkpoint_rolling_window(tmp_path):
    # tf.train.Saver max_to_keep parity: only the newest 5 model-* kept;
    # ema/final prefixes are never pruned
    import numpy as np

    from chiron_tpu.train.checkpoint import latest_checkpoint, save_checkpoint

    d = str(tmp_path)
    params = {"w": np.zeros(3)}
    save_checkpoint(d, params, 0, prefix="ema")
    for s in range(1, 9):
        save_checkpoint(d, params, s)
    kept = sorted(f for f in os.listdir(d) if f.startswith("model-"))
    assert kept == [f"model-{s}.npz" for s in range(4, 9)]
    assert os.path.exists(os.path.join(d, "ema-0.npz"))
    assert latest_checkpoint(d).endswith("model-8.npz")


def test_rss_guard_checkpoints_and_requests_restart(tmp_path):
    """With a tiny max_rss_gb the loop must checkpoint, write an rss-ema
    snapshot, and return restart=True at the first save point instead of
    running to max_steps (axon-client buffer-pinning mitigation)."""
    from chiron_tpu.train.loop import train

    make_training_dir(os.path.join(str(tmp_path), "train"), n_files=2,
                      n_bases=120, seed=0)
    h = _hparams(tmp_path, configure=_tiny_config(tmp_path),
                 max_rss_gb=0.001, max_steps=200)
    result = train(h)
    assert result["restart"] is True
    assert result["step"] == 20  # first save point (save_every=20)
    model_dir = result["model_dir"]
    names = os.listdir(model_dir)
    assert any(n.startswith("model-20") for n in names)
    assert any(n.startswith("rss-ema-20") for n in names)
    # and a retrain resumes from the guard checkpoint
    h2 = _hparams(tmp_path, configure=_tiny_config(tmp_path),
                  max_steps=40, retrain=True)
    result2 = train(h2)
    assert "restart" not in result2
