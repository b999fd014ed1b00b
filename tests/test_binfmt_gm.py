import os

import numpy as np

from chiron_tpu.io.binfmt import (
    format_string,
    read_bin,
    read_bin_folder,
    read_meta,
    write_bin,
    write_meta,
)
from chiron_tpu.tools.genome_model import GenomeModel, build, read_sequences


def test_bin_roundtrip(tmp_path):
    length = 32
    events = [np.arange(length, dtype=np.float32), np.ones(length, np.float32)]
    event_lens = [30, 32]
    labels = [[0, 1, 2], [3, 3]]
    label_lens = [3, 2]
    path = os.path.join(str(tmp_path), "data_batch_1.bin")
    n = write_bin(path, events, event_lens, labels, label_lens)
    assert n == 2
    e, el, lb, ll = read_bin(path, length)
    np.testing.assert_array_equal(e[0], events[0])
    np.testing.assert_array_equal(el, event_lens)
    np.testing.assert_array_equal(lb[0][:3], [0, 1, 2])
    np.testing.assert_array_equal(ll, label_lens)
    # struct layout matches the reference's format string byte-for-byte
    import struct

    rec_size = struct.calcsize(format_string(length))
    assert os.path.getsize(path) == 2 * rec_size
    first = struct.unpack(format_string(length), open(path, "rb").read(rec_size))
    assert first[0] == 30  # event_length
    assert first[1 + length] == 3  # label_length


def test_bin_folder_and_meta(tmp_path):
    length = 16
    write_meta(str(tmp_path), length, 100, "median", "RawGenomeCorrected_000",
               "BaseCalled_template", "dna")
    meta = read_meta(str(tmp_path))
    assert meta["signal_length"] == "16"
    assert meta["format"] == format_string(16)
    write_bin(os.path.join(str(tmp_path), "data_batch_1.bin"),
              [np.zeros(length, np.float32)], [16], [[1]], [1])
    e, el, lb, ll = read_bin_folder(str(tmp_path))
    assert e.shape == (1, 16)


def test_genome_model_counts():
    gm = GenomeModel(k=3)
    gm.count_kmer("ACGTACGT")
    # 1-mers: after every 'A' comes 'C' (x2)
    np.testing.assert_array_equal(gm.get_count("A"), [0, 2, 0, 0])
    # after "AC" comes 'G' twice
    np.testing.assert_array_equal(gm.get_count("AC"), [0, 0, 2, 0])
    # after "ACG" comes 'T' twice
    np.testing.assert_array_equal(gm.get_count("ACG"), [0, 0, 0, 2])
    p = gm.prob("AC", alpha=0.0)
    assert p[2] == 1.0


def test_genome_model_save_load(tmp_path):
    gm = GenomeModel(k=2)
    gm.count_kmer("AACCGGTT")
    path = os.path.join(str(tmp_path), "gm.json")
    gm.save(path)
    gm2 = GenomeModel.load(path)
    np.testing.assert_array_equal(gm.kmer_count, gm2.kmer_count)
    assert gm2.k == 2


def test_read_sequences_fasta_fastq(tmp_path):
    fa = os.path.join(str(tmp_path), "r.fasta")
    open(fa, "w").write(">a\nACGT\nTTAA\n>b\nGGGG\n")
    assert list(read_sequences(fa)) == ["ACGTTTAA", "GGGG"]
    fq = os.path.join(str(tmp_path), "r.fastq")
    open(fq, "w").write("@a\nACGT\n+\nIIII\n@b\nTTTT\n+\nIIII\n")
    assert list(read_sequences(fq)) == ["ACGT", "TTTT"]


def test_genome_model_matches_reference_indexing():
    # reference dict-based counting (gm.py:39-46) on a random sequence
    rng = np.random.RandomState(0)
    seq = "".join("ACGT"[i] for i in rng.randint(0, 4, 200))
    k = 3
    gm = GenomeModel(k=k)
    gm.count_kmer(seq)
    base = ["A", "C", "G", "T"]
    expected = np.zeros_like(gm.kmer_count)
    for i in range(len(seq)):
        for kk in range(min(k, i)):
            kmer = seq[i - kk - 1:i]
            idx = 0
            for b_idx, b in enumerate(kmer):
                idx += (base.index(b) + 1) * 4 ** b_idx
            expected[idx - 1][base.index(seq[i])] += 1
    np.testing.assert_array_equal(gm.kmer_count, expected)
