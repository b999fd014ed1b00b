"""Model assembly: CNN zoo + BiLSTM stack -> per-timestep CTC logits.

Re-designs chiron/chiron_model.py:134-172 (inference) and the CNN model zoo
(chiron/cnn.py:350-623) as pure JAX functions. A model is a (params, config)
pair; ``apply_model(params, config, signal, seq_len)`` returns logits
[B, T_out, 5]. The input-length/logit-length downsampling ``ratio`` is a
static Python number derived from the conv stack's stride product, replacing
the reference's graph-shape probing (chiron/chiron_model.py:150-152).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from chiron_tpu.config import NUM_CLASSES, class_n as _class_n
from chiron_tpu.models import layers as L
from chiron_tpu.models import rnn as R
from chiron_tpu.models.initializers import xavier_normal

Params = Dict[str, Any]

# Registry: name -> (init(key, c_in, cnn_config) -> (params, c_out, stride),
#                    apply(params, x, cnn_config) -> y)
CNN_ZOO: Dict[str, Tuple[Callable, Callable]] = {}


def register(name: str):
    def deco(pair):
        CNN_ZOO[name] = pair
        return pair
    return deco


# -- dna_model1: 3x residual(256) (chiron/cnn.py:380-389) -------------------

def _init_dna_model1(key, c_in, cnn_config):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "res1": L.init_residual(k1, c_in, 256, i_bn=True),
        "res2": L.init_residual(k2, 256, 256),
        "res3": L.init_residual(k3, 256, 256),
    }
    return params, 256, 1


def _apply_dna_model1(params, x, cnn_config):
    x = L.residual(params["res1"], x)
    x = L.residual(params["res2"], x)
    return L.residual(params["res3"], x)


CNN_ZOO["dna_model1"] = (_init_dna_model1, _apply_dna_model1)


# -- res_x: N x residual(256) (chiron/cnn.py:373-378) -----------------------

def _init_res_x(key, c_in, cnn_config):
    layer_num = int(cnn_config.get("layer_num", 10))
    keys = jax.random.split(key, layer_num)
    blocks = []
    c = c_in
    for i in range(layer_num - 1):
        blocks.append(L.init_residual(keys[i], c, 256, i_bn=True))
        c = 256
    return {"blocks": blocks}, 256 if layer_num > 1 else c_in, 1


def _apply_res_x(params, x, cnn_config):
    for block in params["blocks"]:
        x = L.residual(block, x)
    return x


CNN_ZOO["res_x"] = (_init_res_x, _apply_res_x)


# -- rna_model1: stride-2 pool + strided res + 2x res (chiron/cnn.py:391-401)

def _init_rna_model1(key, c_in, cnn_config):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "res1": L.init_residual(k1, c_in, 256, i_bn=True),
        "res2": L.init_residual(k2, 256, 256),
        "res3": L.init_residual(k3, 256, 256),
    }
    return params, 256, 4  # avg-pool stride 2 * residual stride 2


def _apply_rna_model1(params, x, cnn_config):
    x = L.avg_pool(x, ksize=3, stride=2)
    x = L.residual(params["res1"], x, stride=2)
    x = L.residual(params["res2"], x)
    return L.residual(params["res3"], x)


CNN_ZOO["rna_model1"] = (_init_rna_model1, _apply_rna_model1)


# -- rna_model2 / rna_model3: strided front conv + 3x res (cnn.py:454-476) --

def _make_rna_front(kw: int, stride: int):
    def init(key, c_in, cnn_config):
        k0, k1, k2, k3 = jax.random.split(key, 4)
        params = {
            "front": L.init_conv(k0, kw, c_in, 256),
            "res1": L.init_residual(k1, 256, 256, i_bn=True),
            "res2": L.init_residual(k2, 256, 256),
            "res3": L.init_residual(k3, 256, 256),
        }
        return params, 256, stride

    def apply(params, x, cnn_config):
        x = L.conv(params["front"], x, stride=stride)
        x = L.residual(params["res1"], x)
        x = L.residual(params["res2"], x)
        return L.residual(params["res3"], x)

    return init, apply


CNN_ZOO["rna_model2"] = _make_rna_front(kw=9, stride=5)
CNN_ZOO["rna_model3"] = _make_rna_front(kw=14, stride=7)
# framework extension (no reference counterpart): the DNA slow-translocation
# front. Stride 4 instead of rna_model2's 5 because sub-stride dwells delete
# bases structurally — two base transitions inside one output frame leave
# CTC only one emittable label; at mean dwell 24 (geometric, min 2),
# P(dwell < 5) ~ 0.11 matched the measured 0.10-0.12 deletion rate of a
# stride-5 model, while P(dwell < 4) ~ 0.085.
CNN_ZOO["slow_model1"] = _make_rna_front(kw=8, stride=4)


# -- rna_test: 5x residual(256) (chiron/cnn.py:555-566) ---------------------

def _init_rna_test(key, c_in, cnn_config):
    keys = jax.random.split(key, 5)
    blocks = [L.init_residual(keys[0], c_in, 256, i_bn=True)]
    for i in range(1, 5):
        blocks.append(L.init_residual(keys[i], 256, 256))
    return {"blocks": blocks}, 256, 1


def _apply_rna_test(params, x, cnn_config):
    for block in params["blocks"]:
        x = L.residual(block, x)
    return x


CNN_ZOO["rna_test"] = (_init_rna_test, _apply_rna_test)


# -- variant_wavnet: res + dilated wavenet stack (chiron/cnn.py:570-581) ----

def _init_variant_wavnet(key, c_in, cnn_config):
    res_layer = int(cnn_config.get("res_layer", 1))
    dilate_layer = int(cnn_config.get("dilate_layer", 7))
    dilate_repeat = int(cnn_config.get("dilate_repeat", 1))
    n = res_layer + dilate_repeat * dilate_layer
    keys = jax.random.split(key, n)
    res_blocks = [L.init_residual(keys[0], c_in, 256, i_bn=True)]
    for i in range(1, res_layer):
        res_blocks.append(L.init_residual(keys[i], 256, 256))
    wave_blocks = []
    for j in range(dilate_repeat * dilate_layer):
        wave_blocks.append(L.init_wavenet(keys[res_layer + j], 256, 256))
    return (
        {"res": res_blocks, "wave": wave_blocks, "dilate_layer": dilate_layer},
        256,
        1,
    )


def _apply_variant_wavnet(params, x, cnn_config):
    for block in params["res"]:
        x = L.residual(block, x)
    dilate_layer = params["dilate_layer"]
    for j, block in enumerate(params["wave"]):
        x = L.wavenet(block, x, dilation=2 ** (j % dilate_layer))
    return x


CNN_ZOO["variant_wavnet"] = (_init_variant_wavnet, _apply_variant_wavnet)


# -- incp_v2: conv x4 + inception x9 + pools (chiron/cnn.py:583-619) --------

def _init_incp_v2(key, c_in, cnn_config):
    keys = jax.random.split(key, 13)
    params = {
        "conv1": L.init_conv(keys[0], 3, c_in, 64),
        "conv2": L.init_conv(keys[1], 3, 64, 128),
        "conv3": L.init_conv(keys[2], 3, 128, 256),
        "conv4": L.init_conv(keys[3], 5, 256, 256),
        "incp": [],
    }
    c = 256
    for i in range(9):
        params["incp"].append(L.init_inception(keys[4 + i], c, times=16))
        c = 16 * 3 * 6  # six branches of 3*times channels each
    return params, c, 4  # two stride-2 max pools


def _apply_incp_v2(params, x, cnn_config):
    x = L.conv(params["conv1"], x)
    x = L.conv(params["conv2"], x)
    x = L.conv(params["conv3"], x)
    x = L.conv(params["conv4"], x)
    for i, block in enumerate(params["incp"]):
        x = L.inception(block, x)
        if i == 1 or i == 6:
            x = L.max_pool(x, ksize=3, stride=2)
    return x


CNN_ZOO["incp_v2"] = (_init_incp_v2, _apply_incp_v2)


# -- gate_conv_net family (chiron/cnn.py:478-553) ---------------------------

def _make_gate_conv(arch):
    def init(key, c_in, cnn_config):
        keys = jax.random.split(key, 5)
        params = {
            "res1": L.init_residual(keys[0], c_in, arch["hu"][0], k=arch["kw"][0]),
            "gates": [],
        }
        c = arch["hu"][0]
        for i in range(1, 5):
            params["gates"].append(L.init_gated_conv(keys[i], c, arch["hu"][i], arch["kw"][i]))
            c = arch["hu"][i]
        return params, c, arch["strides"][0]

    def apply(params, x, cnn_config):
        x = L.residual(params["res1"], x, stride=arch["strides"][0])
        for i, block in enumerate(params["gates"]):
            x = L.gated_conv(block, x, dilation=arch["strides"][i + 1])
        return x

    return init, apply


CNN_ZOO["gate_conv_net"] = _make_gate_conv(
    {"hu": [256] * 5, "kw": [13, 3, 5, 5, 5], "strides": [5, 1, 2, 4, 8]}
)
CNN_ZOO["gate_conv_net_low"] = _make_gate_conv(
    {"hu": [256] * 5, "kw": [13, 3, 3, 3, 3], "strides": [5, 1, 3, 6, 9]}
)
# gate_conv_net_high declares 11-element arch lists but gate_conv_kernal
# consumes only the first five (chiron/cnn.py:489-531, :548-553); these are
# the effective values. Its nonzero dropouts are training-only and omitted
# like the rest of the family.
CNN_ZOO["gate_conv_net_high"] = _make_gate_conv(
    {"hu": [200, 200, 400, 600, 800], "kw": [17, 7, 11, 15, 19],
     "strides": [9, 1, 1, 1, 1]}
)


# -- dynamic_net: config-driven layer stack (chiron/cnn.py:403-452) ---------

def _init_dynamic_net(key, c_in, cnn_config):
    tps = cnn_config["tp"]
    hus = cnn_config["hu"]
    kws = cnn_config["kw"]
    sts = cnn_config["st"]
    pds = cnn_config["pd"]
    assert len(hus) == len(kws) == len(sts) == len(tps) == len(pds)
    keys = jax.random.split(key, max(len(tps), 1))
    blocks = []
    c = c_in
    stride = 1
    for i, tp in enumerate(tps):
        if tp == "res":
            blocks.append(L.init_residual(keys[i], c, hus[i], k=kws[i]))
            c = hus[i]
        elif tp == "conv":
            blocks.append(L.init_conv(keys[i], kws[i], c, hus[i]))
            c = hus[i]
        else:  # pooling layers hold no params
            blocks.append({})
        stride *= max(int(sts[i]), 1)
    return {"blocks": blocks}, c, stride


def _apply_dynamic_net(params, x, cnn_config):
    tps = cnn_config["tp"]
    kws = cnn_config["kw"]
    sts = cnn_config["st"]
    pds = cnn_config["pd"]
    for i, (block, tp) in enumerate(zip(params["blocks"], tps)):
        if tp == "res":
            x = L.residual(block, x, stride=max(int(sts[i]), 1))
        elif tp == "conv":
            x = L.conv(block, x, stride=max(int(sts[i]), 1), padding=pds[i])
        elif tp == "p_avg":
            x = L.avg_pool(x, ksize=kws[i], stride=max(int(sts[i]), 1), padding=pds[i])
        elif tp == "p_max":
            x = L.max_pool(x, ksize=kws[i], stride=max(int(sts[i]), 1), padding=pds[i])
    return x


CNN_ZOO["dynamic_net"] = (_init_dynamic_net, _apply_dynamic_net)


# -- custom: identity passthrough (chiron/cnn.py:621-623) -------------------

CNN_ZOO["custom"] = (
    lambda key, c_in, cnn_config: ({}, c_in, 1),
    lambda params, x, cnn_config: x,
)


# --------------------------------------------------------------------------
# CNN-only logit head (chiron/cnn.py:625-645), used when rnn.layer_num == 0
# --------------------------------------------------------------------------

def init_cnn_logit(key, c_in: int, class_n: int = NUM_CLASSES) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "w": xavier_normal(k1, (c_in, class_n)),
        "b": xavier_normal(k2, (class_n,)),
    }


def cnn_logit(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


# --------------------------------------------------------------------------
# full-model assembly
# --------------------------------------------------------------------------

def model_stride(config: Dict[str, Any]) -> int:
    """Static time-downsampling factor of the configured CNN."""
    name = config["cnn"]["model"]
    init_fn, _ = CNN_ZOO[name]
    _, _, stride = init_fn(jax.random.PRNGKey(0), 1, config["cnn"])
    return stride


def output_len(config: Dict[str, Any], seg_len: int) -> int:
    """Logit sequence length for an input window of seg_len samples."""
    stride = model_stride(config)
    return -(-seg_len // stride)  # SAME padding: ceil


def model_ratio(config: Dict[str, Any], seg_len: int) -> float:
    """Input-samples-per-logit ratio (chiron/chiron_model.py:150-152)."""
    return seg_len / output_len(config, seg_len)


def init_model(key, config: Dict[str, Any], seg_len: int | None = None) -> Params:
    """Initialise all model parameters for the given config."""
    name = config["cnn"]["model"]
    if name not in CNN_ZOO:
        raise ValueError(f"Unknown CNN model: {name}")
    init_fn, _ = CNN_ZOO[name]
    k_cnn, k_rnn = jax.random.split(key)
    cnn_params, c_out, _ = init_fn(k_cnn, 1, config["cnn"])
    params: Params = {"cnn": cnn_params}
    rnn_cfg = config["rnn"]
    n_class = _class_n(config)
    if rnn_cfg["layer_num"] == 0:
        params["cnn_logit"] = init_cnn_logit(k_rnn, c_out, n_class)
    else:
        params["rnn"] = R.init_rnn_layers(
            k_rnn,
            c_out,
            rnn_cfg["hidden_num"],
            rnn_cfg["layer_num"],
            n_class,
            rnn_cfg["cell_type"],
            rnn_cfg["layer_type"],
        )
    return params


def apply_model(
    params: Params,
    config: Dict[str, Any],
    signal: jnp.ndarray,
    seq_len: jnp.ndarray,
    training: bool = False,
) -> jnp.ndarray:
    """Forward pass: raw signal windows -> CTC logits.

    Args:
      signal: [B, T] float32 raw signal windows.
      seq_len: [B] int32 valid length of each window IN LOGIT FRAMES
        (i.e. already divided by the model ratio, matching the reference's
        feed of round(len/ratio), chiron/chiron_eval.py:337).
    Returns:
      logits [B, T_out, NUM_CLASSES].
    """
    name = config["cnn"]["model"]
    _, apply_fn = CNN_ZOO[name]
    x = signal[..., None]  # [B, T, 1]
    # bf16 inference mode (config["bf16"]): matmul/conv inputs in bfloat16
    # with f32 accumulation; off during training and by default.
    from chiron_tpu.models.layers import bf16_compute, fused_cnn, materialize
    from chiron_tpu.models.rnn import _use_pallas

    with bf16_compute(bool(config.get("bf16")) and not training), \
            fused_cnn(not training and _use_pallas()):
        fea = materialize(apply_fn(params["cnn"], x, config["cnn"]))
        rnn_cfg = config["rnn"]
        if rnn_cfg["layer_num"] == 0:
            return cnn_logit(params["cnn_logit"], fea)
        return R.rnn_layers(
            params["rnn"],
            fea,
            seq_len,
            rnn_cfg["cell_type"],
            rnn_cfg["layer_type"],
            training=training,
        )
