import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from synth import make_fast5_dir

from chiron_tpu.parallel.dist import make_sharded_decode_step, shard_files
from chiron_tpu.parallel.mesh import make_mesh


def test_shard_files_partition():
    files = [f"read{i}.fast5" for i in range(57)]
    shards = [shard_files(files, 4, i) for i in range(4)]
    merged = sorted(sum(shards, []))
    assert merged == sorted(files)  # disjoint + complete
    # deterministic
    assert shards[0] == shard_files(files, 4, 0)


def test_sharded_decode_step_matches_single_device():
    from chiron_tpu import config as C
    from chiron_tpu.eval.pipeline import make_decode_step

    cfg = C.default_config()
    cfg["cnn"] = {"model": "custom"}
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 16, "cell_type": "LSTM",
                  "layer_type": "normal"}
    from chiron_tpu.models import init_model

    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 64), jnp.float32)
    sl = jnp.full((16,), 64, jnp.int32)
    step1 = make_decode_step(cfg, 64, 0, 16, n_devices=1)
    step8 = make_decode_step(cfg, 64, 0, 16, n_devices=8)
    buf1 = np.asarray(step1(params, x, sl))
    buf8 = np.asarray(step8(params, x, sl))
    assert buf1.shape == buf8.shape
    # decoded + lengths must be bit-identical across sharding; score/prob
    # floats may differ in the last ulp from reduction order
    from chiron_tpu.eval.pipeline import unpack_step_outputs

    dec1, len1, sc1, pr1 = unpack_step_outputs(buf1)
    dec8, len8, sc8, pr8 = unpack_step_outputs(buf8)
    np.testing.assert_array_equal(dec1, dec8)
    np.testing.assert_array_equal(len1, len8)
    np.testing.assert_allclose(sc1, sc8, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pr1, pr8, rtol=1e-5, atol=1e-6)


def test_sharded_beam_step():
    from chiron_tpu import config as C
    from chiron_tpu.eval.pipeline import make_decode_step
    from chiron_tpu.models import init_model

    cfg = C.default_config()
    cfg["cnn"] = {"model": "custom"}
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 8, "cell_type": "LSTM",
                  "layer_type": "normal"}
    params = init_model(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 32), jnp.float32)
    sl = jnp.full((16,), 32, jnp.int32)
    buf1 = np.asarray(make_decode_step(cfg, 32, 5, 16, n_devices=1)(params, x, sl))
    buf8 = np.asarray(make_decode_step(cfg, 32, 5, 16, n_devices=8)(params, x, sl))
    from chiron_tpu.eval.pipeline import unpack_step_outputs

    dec1, len1, sc1, _ = unpack_step_outputs(buf1)
    dec8, len8, sc8, _ = unpack_step_outputs(buf8)
    np.testing.assert_array_equal(dec1, dec8)
    np.testing.assert_array_equal(len1, len8)
    np.testing.assert_allclose(sc1, sc8, rtol=1e-5, atol=1e-6)


def test_pipeline_with_n_devices(tmp_path):
    import json

    from chiron_tpu.eval import pipeline

    f5 = os.path.join(str(tmp_path), "fast5")
    make_fast5_dir(f5, n_files=2, n_bases=80, seed=0)
    model = os.path.join(str(tmp_path), "model")
    os.makedirs(model)
    json.dump(
        {"cnn": {"model": "custom"},
         "rnn": {"layer_num": 1, "hidden_num": 8, "cell_type": "LSTM",
                 "layer_type": "normal"},
         "opt_method": "Adam", "fl_gamma": 0},
        open(os.path.join(model, "model.json"), "w"),
    )
    flags = types.SimpleNamespace(
        input=f5, output=os.path.join(str(tmp_path), "out"), model=model,
        start=0, batch_size=8, segment_len=100, jump=95, threads=0, beam=0,
        extension="fastq", concise=False, mode="dna", reverse_fast5=False,
        recursive=True, n_devices=8,
    )
    result = pipeline.run(flags)
    assert result["n_files"] == 2
    assert len(os.listdir(os.path.join(flags.output, "result"))) == 2
