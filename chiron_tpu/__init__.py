"""chiron_tpu — a TPU-native nanopore basecalling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Chiron
basecaller (reference: haotianteng/Chiron, see /root/reference). Raw pA
current signal from .fast5 files is sliced into overlapping fixed-length
windows, run through a CNN->BiLSTM->FC network producing per-timestep
5-class logits (A,C,G,T,CTC-blank), CTC-decoded (greedy or beam search),
and stitched back into one consensus read with quality scores.

Layering (bottom-up):
  io/        fast5/.signal readers, windowing, normalization, writers
  models/    conv/residual/BiLSTM blocks as pure init/apply functions
  ops/       CTC loss + greedy/beam-search decoders (XLA + Pallas)
  assembly/  overlap-consensus stitching + phred quality scores
  parallel/  jax.sharding Mesh construction + data-parallel helpers
  train/     single unified trainer (pjit + psum DP, EMA, checkpoints)
  eval/      the `call` pipeline: host producer -> device decode -> writer
  utils/     progress bars, timing
  tools/     training-label prep (fast5 extraction, resquiggling)
  cli.py     `chiron call/export/train` compatible argparse surface
"""

__version__ = "0.1.0"

from chiron_tpu.config import read_config, save_config, default_config  # noqa: F401
