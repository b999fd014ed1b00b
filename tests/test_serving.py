import json
import os
import types

import numpy as np
import pytest

from synth import make_fast5_dir


def _make_model_dir(path):
    import jax

    from chiron_tpu import config as C
    from chiron_tpu.models import init_model
    from chiron_tpu.train.checkpoint import save_checkpoint

    cfg = C.default_config()
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 16, "cell_type": "LSTM",
                  "layer_type": "normal"}
    cfg["cnn"] = {"model": "custom"}
    os.makedirs(path, exist_ok=True)
    C.save_config(os.path.join(path, "model.json"), cfg)
    params = init_model(jax.random.PRNGKey(0), cfg)
    save_checkpoint(path, params, 1)
    return cfg


def test_export_bundle(tmp_path):
    from chiron_tpu.serve.export import export_model, latest_bundle

    model_dir = os.path.join(str(tmp_path), "model")
    _make_model_dir(model_dir)
    export_dir = os.path.join(str(tmp_path), "export")
    bundle = export_model(model_dir, export_dir, segment_len=100, beam=0)
    assert bundle.endswith("/1")
    for f in ("model.json", "serving.json", "checkpoint"):
        assert os.path.exists(os.path.join(bundle, f))
    # second export bumps the version
    bundle2 = export_model(model_dir, export_dir)
    assert bundle2.endswith("/2")
    assert latest_bundle(export_dir) == bundle2
    sig = json.load(open(os.path.join(bundle, "serving.json")))
    assert "x" in sig["signature"]["inputs"]


def test_server_client_roundtrip(tmp_path):
    from chiron_tpu.serve.export import export_model
    from chiron_tpu.serve.server import serve
    from chiron_tpu.serve.client import PredictionClient

    model_dir = os.path.join(str(tmp_path), "model")
    _make_model_dir(model_dir)
    bundle = export_model(model_dir, os.path.join(str(tmp_path), "export"),
                          segment_len=64, beam=0)
    server = serve(bundle, port=0, batch_size=8, block=False)
    port = server.server_address[1]
    try:
        client = PredictionClient(port=port)
        rng = np.random.RandomState(0)
        x = rng.randn(20, 64).astype(np.float32)  # not a batch multiple
        sl = np.full(20, 64, np.int32)
        result = client.predict(x, sl, request_id=7)
        assert result["decoded"].shape[0] == 20
        assert result["decoded_length"].shape == (20,)
        assert int(result["request_id"]) == 7
        assert np.all(result["decoded_length"] >= 0)
        client.close()
    finally:
        server.shutdown()


def test_remote_basecall_end_to_end(tmp_path):
    from chiron_tpu.serve.export import export_model
    from chiron_tpu.serve.server import serve
    from chiron_tpu.serve import client as client_mod

    model_dir = os.path.join(str(tmp_path), "model")
    _make_model_dir(model_dir)
    bundle = export_model(model_dir, os.path.join(str(tmp_path), "export"),
                          segment_len=100, beam=0)
    f5dir = os.path.join(str(tmp_path), "fast5")
    make_fast5_dir(f5dir, n_files=2, n_bases=80, seed=0)
    server = serve(bundle, port=0, batch_size=8, block=False)
    port = server.server_address[1]
    try:
        flags = types.SimpleNamespace(
            input=f5dir, output=os.path.join(str(tmp_path), "out"),
            host="127.0.0.1", port=port, batch_size=8, segment_len=100,
            jump=95, start=0, extension="fastq", mode="dna",
            reverse_fast5=False, concise=False, model="remote",
        )
        result = client_mod.run_call(flags)
        assert result["n_files"] == 2
        fastqs = os.listdir(os.path.join(flags.output, "result"))
        assert len(fastqs) == 2
    finally:
        server.shutdown()


def test_predict_decoded_padding_is_minus_one(tmp_path):
    """Beyond each decoded length the decoded matrix is -1-padded
    (the 2-bit packed readback zeroes it; the serving signature says -1)."""
    import jax

    from chiron_tpu.config import default_config, save_config
    from chiron_tpu.models import init_model
    from chiron_tpu.serve.export import export_model
    from chiron_tpu.serve.server import InferenceEngine
    from chiron_tpu.train.checkpoint import save_checkpoint

    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    cfg = default_config()
    cfg["cnn"] = {"model": "custom"}
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 8, "cell_type": "LSTM",
                  "layer_type": "normal"}
    save_config(os.path.join(model_dir, "model.json"), cfg)
    save_checkpoint(model_dir, init_model(jax.random.PRNGKey(0), cfg), 0)
    bundle = export_model(model_dir, str(tmp_path / "export"), segment_len=64)
    eng = InferenceEngine(bundle, segment_len=64, beam=0, batch_size=4)
    x = np.random.RandomState(0).randn(4, 64).astype(np.float32)
    r = eng.predict(x, np.full(4, 64, np.int32))
    dec, dlen = r["decoded"], r["decoded_length"]
    for i in range(4):
        assert (dec[i, dlen[i]:] == -1).all()
        assert (dec[i, :dlen[i]] >= 0).all()
