"""TFRecord reading/writing without TensorFlow (chiron_input.py:318-427)."""

import numpy as np
import pytest

from chiron_tpu.io.tfrecord import (
    crc32c,
    iter_tfrecords,
    make_example,
    parse_example,
    read_tfrecord_data_sets,
    read_tfrecord_pairs,
    write_tfrecord,
    write_training_tfrecord,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_example_roundtrip():
    ex = make_example({"raw_data": b"\x01\x02", "fname": b"read1"})
    parsed = parse_example(ex)
    assert parsed["raw_data"] == [b"\x01\x02"]
    assert parsed["fname"] == [b"read1"]


def test_tfrecord_framing_roundtrip(tmp_path):
    path = str(tmp_path / "t.tfrecords")
    payloads = [b"hello", b"", b"x" * 1000]
    write_tfrecord(path, payloads)
    assert list(iter_tfrecords(path)) == payloads


def test_tfrecord_crc_detects_corruption(tmp_path):
    import pytest

    path = str(tmp_path / "t.tfrecords")
    write_tfrecord(path, [b"hello world"])
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        list(iter_tfrecords(path))


def _synthetic_read(rng, n_events=40, mean_len=8):
    lens = rng.randint(4, mean_len * 2, n_events)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    bases = [rng.choice(list("ACGT")) for _ in range(n_events)]
    signal = rng.randint(-100, 100, int(starts[-1] + lens[-1])).astype(np.int16)
    rows = [
        (int(s), int(s + l), b) for s, l, b in zip(starts, lens, bases)
    ]
    return signal, rows


def test_training_tfrecord_pairs_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    signal, rows = _synthetic_read(rng)
    path = str(tmp_path / "train.tfrecords")
    write_training_tfrecord(path, [("read0", signal, rows)])
    (fname, sig2, rows2), = list(read_tfrecord_pairs(path))
    assert fname == "read0"
    np.testing.assert_array_equal(sig2, signal.astype(np.float32))
    assert rows2 == rows


def test_tfrecord_dataset_matches_signal_label_path(tmp_path):
    """TFRecord windows == the .signal/.label reader's windows."""
    from chiron_tpu.io.labels import read_raw_data_sets

    rng = np.random.RandomState(1)
    reads = []
    sigdir = tmp_path / "sig"
    sigdir.mkdir()
    for i in range(2):
        signal, rows = _synthetic_read(rng, n_events=60)
        reads.append((f"read{i}", signal, rows))
        (sigdir / f"read{i}.signal").write_text(
            " ".join(str(v) for v in signal)
        )
        (sigdir / f"read{i}.label").write_text(
            "\n".join(f"{s} {e} {b}" for s, e, b in rows)
        )
    path = str(tmp_path / "train.tfrecords")
    write_training_tfrecord(path, reads)

    ev_t, evl_t, lb_t, lbl_t = read_tfrecord_data_sets(path, seq_length=64)
    ev_s, evl_s, lb_s, lbl_s = read_raw_data_sets(str(sigdir), seq_length=64)
    assert ev_t.shape == ev_s.shape
    np.testing.assert_array_equal(evl_t, evl_s)
    np.testing.assert_array_equal(lb_t, lb_s)
    np.testing.assert_array_equal(lbl_t, lbl_s)
    np.testing.assert_allclose(ev_t, ev_s, rtol=1e-6)


def test_train_loop_from_tfrecord(tmp_path):
    """load_dataset(tfrecord=...) plugs into the trainer Dataset."""
    from chiron_tpu.train.loop import load_dataset

    rng = np.random.RandomState(2)
    signal, rows = _synthetic_read(rng, n_events=80)
    path = tmp_path / "train.tfrecords"
    write_training_tfrecord(str(path), [("r", signal, rows)])
    ds = load_dataset(str(tmp_path), 64, tfrecord="train.tfrecords")
    assert ds.n > 0
    batch = ds.next_batch(4)
    assert batch["signal"].shape == (4, 64)
    assert (batch["label_len"] > 0).all()


def test_load_dataset_accepts_tfrecord_file_path(tmp_path):
    """-v validation.tfrecords form (reference entry.py:115)."""
    from chiron_tpu.train.loop import load_dataset

    rng = np.random.RandomState(3)
    signal, rows = _synthetic_read(rng, n_events=80)
    path = tmp_path / "valid.tfrecords"
    write_training_tfrecord(str(path), [("r", signal, rows)])
    ds = load_dataset(str(path), 64)
    assert ds.n > 0


def test_truncated_varint_raises_value_error():
    from chiron_tpu.io.tfrecord import _read_varint

    with pytest.raises(ValueError, match="truncated varint"):
        _read_varint(b"\xff\xff", 0)  # continuation bit set on final byte


def test_write_training_tfrecord_rejects_oversized_offsets(tmp_path):
    rng = np.random.RandomState(1)
    signal, rows = _synthetic_read(rng)
    rows[-1] = (rows[-1][0], 123_456_789, rows[-1][2])  # 9 digits > |S8
    with pytest.raises(ValueError, match="S8"):
        write_training_tfrecord(
            str(tmp_path / "t.tfrecords"), [("read0", signal, rows)]
        )
