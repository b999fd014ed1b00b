"""Convert reference TF1 checkpoints into chiron_tpu parameter pytrees.

The reference ships `model/DNA_default` / `model/RNA_default` as TF1
`tf.train.Saver` checkpoints (chiron_eval.py:272-276). This module maps the
TF variable names produced by the reference graph (cnn.py/rnn.py scoping)
onto chiron_tpu's pytree paths and repacks the tensors:

* conv kernels [1, k, c_in, c_out] -> [k, c_in, c_out]
* fused LSTM kernels [c_in + H, 4H] -> split (wx [c_in, 4H], wh [H, 4H]);
  TF's gate order (i, j, f, o) equals ours (i, g, f, o), and both apply the
  +1 forget bias at run time, so no gate permutation is needed.

Reading the TF tensor bundle requires TensorFlow (`tf.train.load_checkpoint`)
— not bundled in this image, and the reference mount is missing the
checkpoint data blobs anyway (.MISSING_LARGE_BLOBS) — so ``load_tf_reader``
accepts any name->ndarray mapping, which the tests exercise with synthetic
checkpoints shaped exactly like the reference graph's variables.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from chiron_tpu import config as C


def _conv_entries(tf_scope: str, our_path: str, bn: bool, conv_name: str):
    out = {f"{tf_scope}/{conv_name}/weights": (f"{our_path}/w", "conv")}
    if bn:
        bn_scope = f"{tf_scope}/{conv_name}_bn/{conv_name}_bn"
        out[f"{bn_scope}_scale"] = (f"{our_path}/bn_scale", "copy")
        out[f"{bn_scope}_offset"] = (f"{our_path}/bn_offset", "copy")
    return out


def _residual_entries(tf_scope: str, our_path: str, i_bn: bool):
    out = {}
    out.update(_conv_entries(f"{tf_scope}/branch1", f"{our_path}/branch1", i_bn, "conv1"))
    out.update(_conv_entries(f"{tf_scope}/branch2", f"{our_path}/conv2a", True, "conv2a"))
    out.update(_conv_entries(f"{tf_scope}/branch2", f"{our_path}/conv2b", True, "conv2b"))
    out.update(_conv_entries(f"{tf_scope}/branch2", f"{our_path}/conv2c", True, "conv2c"))
    return out


def build_name_map(config: Dict) -> Dict[str, tuple]:
    """TF variable name -> (pytree path, transform) for a model config."""
    name_map: Dict[str, tuple] = {}
    cnn_model = config["cnn"]["model"]
    if cnn_model == "dna_model1":
        name_map.update(_residual_entries("res_layer1", "cnn/res1", True))
        name_map.update(_residual_entries("res_layer2", "cnn/res2", False))
        name_map.update(_residual_entries("res_layer3", "cnn/res3", False))
    elif cnn_model in ("rna_model2", "rna_model3"):
        name_map.update(_conv_entries("conv_layer", "cnn/front", True, "conv1"))
        name_map.update(_residual_entries("res_layer1", "cnn/res1", True))
        name_map.update(_residual_entries("res_layer2", "cnn/res2", False))
        name_map.update(_residual_entries("res_layer3", "cnn/res3", False))
    else:
        raise NotImplementedError(
            f"No TF name mapping for cnn model {cnn_model!r}"
        )
    rnn_cfg = config["rnn"]
    layer_num = rnn_cfg["layer_num"]
    if rnn_cfg.get("layer_type") == "rna":
        # bidirectional_dynamic_rnn over MultiRNNCell (chiron/rnn.py:140-145)
        for i in range(layer_num):
            for d, dname in (("fw", "fw"), ("bw", "bw")):
                base = (
                    f"BDGRU_rnn/{dname}/multi_rnn_cell/cell_{i}/lstm_cell"
                )
                name_map[f"{base}/kernel"] = (
                    f"rnn/stack/layers/[{i}]/{d}", "lstm_kernel")
                name_map[f"{base}/bias"] = (
                    f"rnn/stack/layers/[{i}]/{d}/b", "copy")
    else:
        # stack_bidirectional_dynamic_rnn (chiron/rnn.py:63-65)
        for i in range(layer_num):
            for d, dname in (("fw", "fw"), ("bw", "bw")):
                base = (
                    f"BDLSTM_rnn/stack_bidirectional_rnn/cell_{i}/"
                    f"bidirectional_rnn/{dname}/lstm_cell"
                )
                name_map[f"{base}/kernel"] = (
                    f"rnn/stack/layers/[{i}]/{d}", "lstm_kernel")
                name_map[f"{base}/bias"] = (
                    f"rnn/stack/layers/[{i}]/{d}/b", "copy")
    name_map["rnn_fnn_layer/weights"] = ("rnn/head/w_dir", "copy")
    name_map["rnn_fnn_layer/bias"] = ("rnn/head/b_dir", "copy")
    name_map["rnn_fnn_layer/weights_class"] = ("rnn/head/w_class", "copy")
    name_map["rnn_fnn_layer/bias_class"] = ("rnn/head/b_class", "copy")
    return name_map


def _set_path(tree: dict, path: str, value):
    parts = path.split("/")
    node = tree
    for i, p in enumerate(parts[:-1]):
        nxt = parts[i + 1]
        if p.startswith("[") and p.endswith("]"):
            idx = int(p[1:-1])
            while len(node) <= idx:
                node.append({})
            node = node[idx]
        else:
            if p not in node:
                node[p] = [] if nxt.startswith("[") else {}
            node = node[p]
    node[parts[-1]] = value


def convert(
    get_tensor: Callable[[str], np.ndarray],
    config: Dict,
    hidden: int | None = None,
) -> dict:
    """Convert a TF checkpoint (via a name->tensor getter) to a pytree."""
    hidden = hidden or config["rnn"]["hidden_num"]
    name_map = build_name_map(config)
    params: dict = {}
    for tf_name, (path, transform) in name_map.items():
        tensor = np.asarray(get_tensor(tf_name))
        if transform == "conv":
            assert tensor.ndim == 4 and tensor.shape[0] == 1, tensor.shape
            _set_path(params, path, tensor[0])
        elif transform == "lstm_kernel":
            c_in = tensor.shape[0] - hidden
            _set_path(params, path + "/wx", tensor[:c_in])
            _set_path(params, path + "/wh", tensor[c_in:])
        else:
            _set_path(params, path, tensor)
    return params


def convert_checkpoint_dir(model_dir: str, out_dir: str | None = None) -> str:
    """Convert a reference model folder (requires TensorFlow to read it)."""
    import os

    try:
        import tensorflow as tf  # type: ignore
    except ImportError as e:
        raise ImportError(
            "Converting real TF checkpoints requires tensorflow "
            "(pip install tensorflow) to read the tensor bundle. "
            "Note: the reference mount's checkpoint data blobs are absent "
            "(.MISSING_LARGE_BLOBS), so only externally obtained "
            "checkpoints can be converted."
        ) from e
    config = C.read_config(os.path.join(model_dir, "model.json"))
    ckpt = tf.train.latest_checkpoint(model_dir)
    reader = tf.train.load_checkpoint(ckpt)
    params = convert(reader.get_tensor, config)
    from chiron_tpu.train.checkpoint import save_checkpoint

    out_dir = out_dir or model_dir
    path = save_checkpoint(out_dir, params, 0, prefix="converted")
    C.save_config(os.path.join(out_dir, "model.json"), config)
    return path


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        description="Convert a reference TF model folder (checkpoint + "
        "model.json) into this framework's npz checkpoint format."
    )
    parser.add_argument("-m", "--model_dir", required=True,
                        help="Reference model folder (TF checkpoint + model.json).")
    parser.add_argument("-o", "--out_dir", default=None,
                        help="Output folder (default: alongside the input).")
    args = parser.parse_args(argv)
    out = convert_checkpoint_dir(args.model_dir, args.out_dir)
    print(f"Converted checkpoint written to: {out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
