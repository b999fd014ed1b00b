"""Out-of-core window cache (io/cache.py — the biglist spill equivalent)."""

import os

import numpy as np
import pytest

from synth import make_training_dir


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def test_cached_dataset_matches_in_ram(tmp_path):
    """Same corpus, same seed -> byte-identical batches to Dataset."""
    from chiron_tpu.io.cache import cached_dataset
    from chiron_tpu.io.labels import read_raw_data_sets
    from chiron_tpu.train.loop import Dataset

    data_dir = os.path.join(str(tmp_path), "train")
    make_training_dir(data_dir, n_files=4, n_bases=300)
    seq_len = 200
    ram = Dataset(*read_raw_data_sets(data_dir, seq_length=seq_len), seed=7)
    disk = cached_dataset(data_dir, os.path.join(str(tmp_path), "cache"),
                          seq_len, seed=7)
    assert disk.n == ram.n > 0
    assert disk.u_max == ram.labels.shape[1]
    for _ in range(5):  # crosses an epoch boundary
        a = ram.next_batch(16)
        b = disk.next_batch(16)
        for key in ("signal", "seq_len", "label", "label_len"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert disk.epochs_completed == ram.epochs_completed
    disk.close()


def test_cache_rebuilds_on_param_change(tmp_path):
    from chiron_tpu.io.cache import cached_dataset, read_meta

    data_dir = os.path.join(str(tmp_path), "train")
    make_training_dir(data_dir, n_files=2, n_bases=300)
    cache = os.path.join(str(tmp_path), "cache")
    d1 = cached_dataset(data_dir, cache, 200, skip_start=10)
    n1, meta1 = d1.n, read_meta(cache)
    d1.close()
    # same params -> reuse (meta object unchanged)
    d2 = cached_dataset(data_dir, cache, 200, skip_start=10)
    assert read_meta(cache) == meta1
    d2.close()
    # shifted offset (epoch resampling) -> rebuild with fewer labels kept
    d3 = cached_dataset(data_dir, cache, 200, skip_start=25)
    assert read_meta(cache)["build"]["skip_start"] == 25
    assert d3.n != 0 and d3.n <= n1
    d3.close()


@pytest.mark.slow
def test_million_windows_bounded_rss(tmp_path):
    """>1e6 windows stream to disk and serve batches in bounded memory."""
    from chiron_tpu.io.cache import CachedDataset, CacheWriter

    n_total, seq_len, chunk = 1_050_000, 64, 50_000
    cache = os.path.join(str(tmp_path), "cache")
    writer = CacheWriter(cache, seq_len)
    base = np.zeros((chunk, seq_len), np.float32)
    for start in range(0, n_total, chunk):
        m = min(chunk, n_total - start)
        ev = base[:m].copy()
        ev[:, 0] = np.arange(start, start + m)  # row fingerprint
        labels = np.tile(np.arange(4, dtype=np.int32), (m, 1))
        labels[:, 3] = np.arange(start, start + m) % 4
        writer.append(ev, np.full(m, seq_len, np.int32), labels,
                      np.full(m, 4, np.int32))
    meta = writer.close()
    assert meta["n"] == n_total and meta["u_max"] == 4

    rss_before = _rss_kb()
    ds = CachedDataset(cache, seed=1)
    for _ in range(40):
        batch = ds.next_batch(256)
        rows = batch["signal"][:, 0].astype(np.int64)
        np.testing.assert_array_equal(batch["label"][:, 3], rows % 4)
        assert batch["signal"].shape == (256, seq_len)
        assert batch["label"].shape == (256, 4)
    grown_kb = _rss_kb() - rss_before
    # corpus is ~280 MB on disk; serving must stay well under it
    assert grown_kb < 80_000, f"RSS grew {grown_kb} kB while streaming"
    ds.close()


def test_cache_rebuilds_when_data_regenerated(tmp_path):
    # same path, new content: the signature in the build params goes stale
    from chiron_tpu.io.cache import cached_dataset, read_meta

    data = os.path.join(str(tmp_path), "data")
    cache = os.path.join(str(tmp_path), "c")
    make_training_dir(data, n_files=1, n_bases=300, seed=1)
    ds = cached_dataset(data, cache, 200)
    n1 = ds.n
    ds.close()
    make_training_dir(data, n_files=2, n_bases=300, seed=2)
    ds = cached_dataset(data, cache, 200)
    assert ds.n > n1  # rebuilt with the new read included
    assert read_meta(cache)["build"]["signature"]["n_files"] == 4
    ds.close()
