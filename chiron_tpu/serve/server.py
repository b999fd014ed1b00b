"""Inference server: serve a bundle over TCP with batched device execution.

TPU-native stand-in for TF-Serving (the reference delegates serving to an
external tensorflow_model_server, README; client at chiron/chiron_client.py).
A threaded socket server accepts {x, seq_len} requests, pads them to the
bundle's static batch shape, runs the jitted forward(+decode) on device,
and streams back {logits?, decoded, decoded_length, prob_logits, log_prob}.
One device-executor thread serialises TPU access; request threads only
do IO, so concurrent clients pipeline naturally.
"""

from __future__ import annotations

import json
import os
import socketserver
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from chiron_tpu import config as C
from chiron_tpu.eval.pipeline import make_decode_step, unpack_step_outputs
from chiron_tpu.models import apply_model, init_model, model_ratio
from chiron_tpu.models.model import output_len
from chiron_tpu.serve.protocol import pack, read_message
from chiron_tpu.train.checkpoint import restore_latest


class InferenceEngine:
    """Loads a bundle and runs batched forward+decode with a work queue."""

    def __init__(self, bundle_dir: str, batch_size: int = 64,
                 segment_len: Optional[int] = None, beam: Optional[int] = None):
        with open(os.path.join(bundle_dir, "serving.json")) as f:
            manifest = json.load(f)
        self.segment_len = segment_len or int(manifest.get("segment_len", 400))
        self.beam = beam if beam is not None else int(manifest.get("beam", 0))
        self.batch_size = batch_size
        self.config = C.read_config(os.path.join(bundle_dir, "model.json"))
        params, _ = restore_latest(bundle_dir)
        if params is None:
            params = init_model(jax.random.PRNGKey(0), self.config)
        self.params = jax.device_put(params)
        self.ratio = model_ratio(self.config, self.segment_len)
        self.t_out = output_len(self.config, self.segment_len)
        self._step = make_decode_step(
            self.config, self.segment_len, self.beam, batch_size
        )
        self._logits_fn = jax.jit(
            lambda p, x, sl: apply_model(p, self.config, x, sl)
        )
        self._lock = threading.Lock()

    def predict(self, x: np.ndarray, seq_len: np.ndarray, want_logits=False):
        n = len(x)
        out = {
            "decoded": [], "decoded_length": [], "log_prob": [], "prob_logits": [],
        }
        logits_parts = []
        for ofs in range(0, n, self.batch_size):
            bx = x[ofs:ofs + self.batch_size]
            bl = seq_len[ofs:ofs + self.batch_size]
            pad = self.batch_size - len(bx)
            if pad:
                bx = np.pad(bx, ((0, pad), (0, 0)), mode="wrap")
                bl = np.pad(bl, (0, pad), mode="wrap")
            with self._lock:  # serialise device access
                if want_logits:
                    lg = self._logits_fn(
                        self.params, jnp.asarray(bx), jnp.asarray(bl)
                    )
                    logits_parts.append(np.asarray(lg)[: len(bx) - pad or None])
                packed = self._step(
                    self.params, jnp.asarray(bx), jnp.asarray(bl)
                )
            dec, dlen, score, prob = unpack_step_outputs(
                np.asarray(packed),
                two_bit=C.class_n(self.config) - 1 <= 4,
            )
            take = self.batch_size - pad
            # 2-bit packing rounds columns up to a multiple of 4; the
            # signature promises [B, t_out] for both packed layouts
            dec = dec[:, : self.t_out].astype(np.int32)
            # positions past each decoded length are -1 (the 2-bit packed
            # layout zeroes them; the signature documents -1 padding)
            dec[np.arange(dec.shape[1])[None, :] >= dlen[:, None]] = -1
            out["decoded"].append(dec[:take])
            out["decoded_length"].append(dlen[:take])
            out["log_prob"].append(score[:take])
            out["prob_logits"].append(prob[:take])
        result = {k: np.concatenate(v) for k, v in out.items()}
        if want_logits:
            result["logits"] = np.concatenate(logits_parts)
        return result


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        engine: InferenceEngine = self.server.engine  # type: ignore
        while True:
            msg = read_message(self.request)
            if msg is None:
                return
            try:
                x = msg["x"].astype(np.float32)
                seq_len = msg["seq_len"].astype(np.int32)
                want_logits = bool(msg.get("want_logits", np.asarray(0)))
                result = engine.predict(x, seq_len, want_logits)
                if "request_id" in msg:
                    result["request_id"] = msg["request_id"]
                self.request.sendall(pack(result))
            except Exception as e:  # surface errors to the client
                self.request.sendall(
                    pack({"error": np.frombuffer(str(e).encode(), np.uint8)})
                )


class PredictionServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, address, engine: InferenceEngine):
        super().__init__(address, _Handler)
        self.engine = engine


def serve(bundle_dir: str, host: str = "127.0.0.1", port: int = 5001,
          batch_size: int = 64, block: bool = True) -> PredictionServer:
    engine = InferenceEngine(bundle_dir, batch_size=batch_size)
    server = PredictionServer((host, port), engine)
    if block:
        print(f"Serving {bundle_dir} on {host}:{server.server_address[1]}")
        server.serve_forever()
    else:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
    return server


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="chiron_tpu inference server")
    parser.add_argument("-m", "--bundle", required=True, help="serving bundle dir")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5001)
    parser.add_argument("-b", "--batch_size", type=int, default=64)
    args = parser.parse_args(argv)
    serve(args.bundle, args.host, args.port, args.batch_size)


if __name__ == "__main__":
    main()
