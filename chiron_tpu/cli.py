"""`chiron`-compatible CLI: call / export / train subcommands.

Flag surface and preset behaviour mirror chiron/entry.py:62-155; the `call`
flow extracts fast5s to <output>/raw/*.signal then basecalls them, exactly
like the reference's extract->eval wiring (entry.py:19-47).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from os import path

import chiron_tpu
from chiron_tpu.config import PRESETS


def _set_paras(args, p):
    args.start = p["start"] if args.start is None else args.start
    args.batch_size = p["batch_size"] if args.batch_size is None else args.batch_size
    args.segment_len = p["segment_len"] if args.segment_len is None else args.segment_len
    args.jump = p["jump"] if args.jump is None else args.jump
    args.threads = p["threads"] if args.threads is None else args.threads
    args.beam = p["beam"] if args.beam is None else args.beam
    return args


def evaluation(args):
    from chiron_tpu.eval import pipeline
    from chiron_tpu.tools.extract_sig import extract

    if args.preset is None:
        default_p = PRESETS["default"]
    elif args.preset == "dna-pre":
        default_p = PRESETS["dna-pre"]
        if args.mode == "rna":
            raise ValueError("Try to use the DNA preset parameter setting in RNA mode.")
    elif args.preset == "dna-slow-pre":
        default_p = PRESETS["dna-slow-pre"]
        if args.mode == "rna":
            raise ValueError("Try to use the DNA preset parameter setting in RNA mode.")
        if args.model is None:
            # the slow preset implies the slow-regime bundled model unless
            # the user picked one explicitly; -m defaults to None so an
            # explicit -m <DNA_default dir> is distinguishable from the
            # unset default (ADVICE r4 #4)
            args.model = path.join(
                path.abspath(path.dirname(__file__)), "model", "DNA_slow"
            )
    elif args.preset == "rna-pre":
        default_p = PRESETS["rna-pre"]
        if args.mode == "dna":
            raise ValueError(
                "Attempt to use the RNA preset parameter setting in DNA mode, "
                "enable RNA basecalling by --mode rna"
            )
    else:
        raise ValueError(f"Unknown presetting {args.preset} undifiend")
    if args.model is None:
        args.model = path.join(
            path.abspath(path.dirname(__file__)), "model", "DNA_default"
        )
    args = _set_paras(args, default_p)
    args.input_dir = args.input
    args.output_dir = args.output
    args.unit = False
    args.recursive = True
    args.polya = None
    args.idname = False
    args.delimiter = "\n"
    args.reverse_fast5 = args.mode == "rna"
    if os.path.isdir(args.input):
        extract(args)
        args.input = args.output + "/raw/"
    return pipeline.run(args)


def export(args):
    from chiron_tpu.tools import raw_extract

    return raw_extract.run(args)


def train(args):
    from chiron_tpu.train import loop

    return loop.run(args)


def main(arguments=None):
    if arguments is None:
        arguments = sys.argv[1:]
    parser = argparse.ArgumentParser(
        prog="chiron", description="A deep neural network basecaller (TPU-native)."
    )
    parser.add_argument(
        "-v",
        "--version",
        action="version",
        version="chiron_tpu version " + chiron_tpu.__version__,
        help="Print out the version.",
    )
    subparsers = parser.add_subparsers(title="sub command", help="sub command help")

    # ---- call ------------------------------------------------------------
    parser_call = subparsers.add_parser(
        "call", description="Perform basecalling", help="Perform basecalling."
    )
    parser_call.add_argument("-i", "--input", required=True,
                             help="File path or Folder path to the fast5 file.")
    parser_call.add_argument("-o", "--output", required=True, help="Output folder path")
    parser_call.add_argument("-m", "--model", type=str, default=None,
                             help="model folder path (default: the bundled "
                                  "DNA_default; the dna-slow-pre preset "
                                  "defaults to DNA_slow)")
    parser_call.add_argument("-s", "--start", type=int, default=None,
                             help="Start index of the signal file.")
    parser_call.add_argument("-b", "--batch_size", type=int, default=None,
                             help="Batch size for run, bigger batch_size will increase the processing speed but require larger RAM load")
    parser_call.add_argument("-l", "--segment_len", type=int, default=None,
                             help="Segment length to be divided into.")
    parser_call.add_argument("-j", "--jump", type=int, default=None,
                             help="Step size for segment")
    parser_call.add_argument("-t", "--threads", type=int, default=None,
                             help="Threads number, default is 0, which use all the available threads.")
    parser_call.add_argument("-e", "--extension", default="fastq",
                             help="Output file type.")
    parser_call.add_argument("--beam", type=int, default=None,
                             help="Beam width used in beam search decoder, set to 0 to use a greedy decoder.")
    parser_call.add_argument("--length_bonus", type=float, default=None,
                             help="Additive log-score per emitted label in "
                                  "the beam decoder: >0 trades the CTC "
                                  "deletion-heavy operating point for "
                                  "insertions. Default: the model's "
                                  "calibrated value from model.json, else "
                                  "0.0 (reference semantics).")
    parser_call.add_argument("--concise", action="store_true",
                             help="Concisely output the result, the meta and segments files will not be output.")
    parser_call.add_argument("--mode", default="dna",
                             help="Output mode, can be chosen from dna or rna.")
    parser_call.add_argument("--test_number", default=None, type=int,
                             help="Extract test_number reads, default is None, extract all reads.")
    parser_call.add_argument("--bf16", action="store_true",
                             help="bfloat16 matmul/conv inputs at inference "
                                  "(f32 accumulation); ~same accuracy, "
                                  "higher MXU throughput.")
    parser_call.add_argument("-p", "--preset", default=None,
                             help="Preset evaluation parameters: dna-pre, rna-pre")
    parser_call.add_argument("--n_devices", type=int, default=0,
                             help="Shard each batch across this many chips (0 = single device).")
    parser_call.add_argument("--sig_norm", type=int, default=None,
                             help="Signal normalization: None raw (default), 0 median/mad, 1 mean/std.")
    parser_call.add_argument("--profile", action="store_true",
                             help="Write a jax.profiler trace under <output>/profile.")
    parser_call.set_defaults(func=evaluation)

    # ---- export ----------------------------------------------------------
    parser_export = subparsers.add_parser(
        "export",
        description="Export signal and label from the fast5 file.",
        help="Extract signal and label in the fast5 file.",
    )
    parser_export.add_argument("-i", "--input", required=True,
                               help="Input folder contain fast5 files.")
    parser_export.add_argument("-o", "--output", required=True, help="Output folder.")
    parser_export.add_argument("--basecall_group", default="Basecall_1D_000",
                               help="Basecall group Nanoraw resquiggle into.")
    parser_export.add_argument("--basecall_subgroup", default="BaseCalled_template",
                               help="Basecall subgroup Nanoraw resquiggle into.")
    parser_export.add_argument("-b", "--batch", type=int, default=4000,
                               help="Number of files per batches.")
    parser_export.add_argument("--unit", dest="unit", action="store_true",
                               help="Use the pA unit instead of the original digital signal.")
    parser_export.add_argument("--mode", default="dna",
                               help="Type of data to basecall: dna or rna.")
    parser_export.add_argument("--min_bps", default=0, type=int,
                               help="The minimum number of labels that has to be in each read.")
    parser_export.add_argument("--n_errors", default=5, type=int,
                               help="The number of errors that are going to be recorded.")
    parser_export.add_argument("-f", "--tffile", default=None,
                               help="Also bundle the extracted reads into this "
                                    "TFRecord file (reference flag entry.py:99, "
                                    "implemented here).")
    parser_export.set_defaults(func=export)

    # ---- train -----------------------------------------------------------
    parser_train = subparsers.add_parser(
        "train", description="Model training", help="Train a model."
    )
    parser_train.add_argument("-i", "--data_dir", required=True,
                              help="Directory that stores .signal/.label training pairs.")
    parser_train.add_argument("-o", "--log_dir", required=True,
                              help="log directory that store the training model.")
    parser_train.add_argument("-m", "--model_name", required=True, help="model_name")
    parser_train.add_argument("-v", "--validation", default=None,
                              help="validation data directory; default None (no validation)")
    parser_train.add_argument("--train_cache", default=None,
                              help="Cache file for training dataset.")
    parser_train.add_argument("--valid_cache", default=None,
                              help="Cache file for validation dataset.")
    parser_train.add_argument("-s", "--sequence_len", type=int, default=400,
                              help="the length of sequence")
    parser_train.add_argument("-b", "--batch_size", type=int, default=300,
                              help="Batch size")
    parser_train.add_argument("-t", "--step_rate", type=float, default=4e-3,
                              help="Step rate")
    parser_train.add_argument("-x", "--max_steps", type=int, default=10000,
                              help="Maximum step")
    parser_train.add_argument("-n", "--segments_num", type=int, default=None,
                              help="Maximum number of training segments to read.")
    parser_train.add_argument("--configure", default=None,
                              help="Model structure configure json file.")
    parser_train.add_argument("-k", "--k_mer", default=1, type=int,
                              help="Output k-mer size")
    parser_train.add_argument("-f", "--tfrecord", default=None,
                              help="Train from a TFRecord file (relative to "
                                   "data_dir) instead of .signal/.label pairs "
                                   "(reference: entry.py:116-117).")
    parser_train.add_argument("--retrain", dest="retrain", action="store_true",
                              help="Set retrain to true")
    parser_train.add_argument("--resample_after_epoch", type=int, default=0,
                              help="Resample the reads data every n epochs with an increasing initial offset.")
    parser_train.add_argument("--offset_increment", type=int, default=3,
                              help="Increment of initial offset per resample.")
    parser_train.add_argument("--n_devices", type=int, default=0,
                              help="Data-parallel devices (0 = all available).")
    parser_train.add_argument("--sig_norm", type=int, default=None,
                              help="Signal normalization: None raw (default), "
                                   "0 median/mad, 1 mean/std.")
    parser_train.set_defaults(func=train)

    args = parser.parse_args(arguments)
    if hasattr(args, "func"):
        return args.func(args)
    parser.print_help()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
