"""Synthetic nanopore-like data generation for tests.

Mirrors the role of the reference's dummy-input self test
(chiron/chiron_input.py:732-817): each base maps to a distinctive signal
level with small jitter, fast5 files carry /Raw plus Corrected_000 events,
so the full extract -> train -> call loop can be exercised hermetically.
"""

from __future__ import annotations

import os

import h5py
import numpy as np

BASE_SIGNAL = {"A": 100.0, "C": 200.0, "G": 300.0, "T": 400.0}
BASES = "ACGT"

DATA_FORMAT = np.dtype([("start", "<i4"), ("length", "<i4"), ("base", "S1")])


def synth_read(rng, n_bases=200, dwell_lo=5, dwell_hi=15, noise=5.0):
    """A random base string + per-base event table + noisy signal."""
    bases = [BASES[i] for i in rng.randint(0, 4, n_bases)]
    starts, lengths, signal = [], [], []
    pos = 0
    for b in bases:
        dwell = rng.randint(dwell_lo, dwell_hi)
        starts.append(pos)
        lengths.append(dwell)
        level = BASE_SIGNAL[b]
        signal.extend(level + rng.randn(dwell) * noise)
        pos += dwell
    # trailing signal so events never touch the signal end (read_raw asserts)
    signal.extend(BASE_SIGNAL[bases[-1]] + rng.randn(20) * noise)
    return "".join(bases), np.asarray(starts), np.asarray(lengths), np.asarray(
        signal, np.float32
    )


BASECALL_EVENT_FORMAT = np.dtype(
    [("mean", "<f8"), ("stdv", "<f8"), ("start", "<f8"), ("length", "<f8")]
)


def write_fast5(path, signal, starts=None, lengths=None, bases=None,
                read_id="read0", basecall_events=False, sampling_rate=4000):
    """Write a single-read fast5 with optional Corrected_000 events.

    With ``basecall_events``, also writes an Analyses/Basecall_1D_000
    event table (times in seconds) where every 3rd base event is split in
    two segments — exercising get_label_segment's move annotation.
    """
    with h5py.File(path, "w") as root:
        raw = root.create_dataset(
            f"/Raw/Reads/Read_0/Signal", shape=(len(signal),), dtype=np.int16
        )
        raw[...] = np.asarray(signal, np.int16)
        root["/Raw/Reads/Read_0"].attrs["read_id"] = read_id.encode()
        root["/Raw/Reads/Read_0"].attrs["start_time"] = 0
        ch = root.create_dataset(
            "/UniqueGlobalKey/channel_id", shape=[], dtype=np.int16
        )
        ch.attrs["offset"] = 0.0
        ch.attrs["range"] = 1.0
        ch.attrs["digitisation"] = 1.0
        ch.attrs["sampling_rate"] = sampling_rate
        if basecall_events and starts is not None:
            rows = []
            for i, (s, l) in enumerate(zip(starts, lengths)):
                pieces = (
                    [(s, l // 2), (s + l // 2, l - l // 2)]
                    if (i % 3 == 0 and l >= 2) else [(s, l)]
                )
                for ps, pl in pieces:
                    chunk = np.asarray(signal[ps:ps + pl], np.float64)
                    rows.append(
                        (chunk.mean(), chunk.std(), ps / sampling_rate,
                         pl / sampling_rate)
                    )
            ev = root.create_dataset(
                "/Analyses/Basecall_1D_000/BaseCalled_template/Events",
                shape=(len(rows),), dtype=BASECALL_EVENT_FORMAT,
            )
            ev[...] = np.asarray(rows, dtype=BASECALL_EVENT_FORMAT)
        if starts is not None:
            events = np.asarray(
                list(zip(starts, lengths, [b.encode() for b in bases])),
                dtype=DATA_FORMAT,
            )
            ev = root.create_dataset(
                "/Analyses/Corrected_000/BaseCalled_template/Events",
                shape=(len(events),),
                maxshape=(None,),
                dtype=DATA_FORMAT,
            )
            ev[...] = events
            ev.attrs["read_start_rel_to_raw"] = 0


def make_training_dir(tmpdir, n_files=4, n_bases=200, seed=0, noise=5.0):
    """Write .signal/.label pairs directly (post-export layout)."""
    rng = np.random.RandomState(seed)
    os.makedirs(tmpdir, exist_ok=True)
    reads = []
    for i in range(n_files):
        seq, starts, lengths, signal = synth_read(rng, n_bases, noise=noise)
        with open(os.path.join(tmpdir, f"read{i}.signal"), "w") as f:
            f.write("\n".join(str(float(x)) for x in signal))
        with open(os.path.join(tmpdir, f"read{i}.label"), "w") as f:
            for s, l, b in zip(starts, lengths, seq):
                f.write(f"{s} {s + l} {b}\n")
        reads.append((seq, signal))
    return reads


def make_fast5_dir(tmpdir, n_files=3, n_bases=150, seed=0, with_events=True, noise=5.0):
    rng = np.random.RandomState(seed)
    os.makedirs(tmpdir, exist_ok=True)
    reads = []
    for i in range(n_files):
        seq, starts, lengths, signal = synth_read(rng, n_bases, noise=noise)
        path = os.path.join(tmpdir, f"synth{i}.fast5")
        if with_events:
            write_fast5(path, signal, starts, lengths, seq, read_id=f"read{i}")
        else:
            write_fast5(path, signal, read_id=f"read{i}")
        reads.append((seq, signal))
    return reads
