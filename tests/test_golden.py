"""Golden regression test against the bundled example data.

The repo ships synthetic example fast5 reads plus committed basecall
outputs from the bundled DNA_default model (mirroring the reference's
example_data golden vectors, SURVEY.md §4). Re-running the pipeline on CPU
with the same flags must reproduce the committed fastq byte-for-byte
(global-BN makes outputs batch-composition-dependent, so the flags pin the
batch size).
"""

import os
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(REPO, "chiron_tpu", "example_data", "DNA")
MODEL = os.path.join(REPO, "chiron_tpu", "model", "DNA_default")


@pytest.mark.skipif(not os.path.isdir(EXAMPLE), reason="example data absent")
def test_bundled_example_reproduces_golden(tmp_path):
    from chiron_tpu.eval import pipeline

    out = os.path.join(str(tmp_path), "out")
    flags = types.SimpleNamespace(
        input=EXAMPLE, output=out, model=MODEL,
        start=0, batch_size=16, segment_len=400, jump=390, threads=0,
        beam=0, extension="fastq", concise=False, mode="dna",
        reverse_fast5=False, recursive=False, sig_norm=1,
    )
    result = pipeline.run(flags)
    assert result["n_files"] == 3
    golden_dir = os.path.join(EXAMPLE, "output", "result")
    for f in sorted(os.listdir(golden_dir)):
        golden = open(os.path.join(golden_dir, f)).read()
        fresh = open(os.path.join(out, "result", f)).read()
        assert fresh == golden, f"golden mismatch for {f}"
    seg_dir = os.path.join(EXAMPLE, "output", "segments")
    for f in sorted(os.listdir(seg_dir)):
        golden = open(os.path.join(seg_dir, f)).read()
        fresh = open(os.path.join(out, "segments", f)).read()
        assert fresh == golden, f"segments golden mismatch for {f}"


EXAMPLE_RNA = os.path.join(REPO, "chiron_tpu", "example_data", "RNA")
MODEL_RNA = os.path.join(REPO, "chiron_tpu", "model", "RNA_default")


@pytest.mark.skipif(not os.path.isdir(EXAMPLE_RNA), reason="example data absent")
def test_bundled_rna_example_reproduces_golden(tmp_path):
    from chiron_tpu.eval import pipeline

    out = os.path.join(str(tmp_path), "out")
    flags = types.SimpleNamespace(
        input=EXAMPLE_RNA, output=out, model=MODEL_RNA,
        start=0, batch_size=4, segment_len=2000, jump=1900, threads=0,
        beam=0, extension="fastq", concise=False, mode="rna",
        reverse_fast5=True, recursive=False, sig_norm=1,
    )
    result = pipeline.run(flags)
    assert result["n_files"] == 2
    golden_dir = os.path.join(EXAMPLE_RNA, "output", "result")
    for f in sorted(os.listdir(golden_dir)):
        golden = open(os.path.join(golden_dir, f)).read()
        fresh = open(os.path.join(out, "result", f)).read()
        assert fresh == golden, f"RNA golden mismatch for {f}"
        # RNA mode parity: U, never T
        assert "T" not in golden.splitlines()[1]


EXAMPLE_SLOW = os.path.join(REPO, "chiron_tpu", "example_data", "DNA_SLOW")
MODEL_SLOW = os.path.join(REPO, "chiron_tpu", "model", "DNA_slow")


@pytest.mark.skipif(
    not (os.path.exists(os.path.join(MODEL_SLOW, "checkpoint"))
         and os.path.isdir(os.path.join(EXAMPLE_SLOW, "output"))),
    reason="DNA_slow checkpoint or goldens absent",
)
def test_bundled_slow_example_reproduces_golden(tmp_path):
    """Slow-translocation goldens: DNA_slow model at the dna-slow-pre
    window geometry (seg 2000/jump 1900) on simulated dwell-24 reads."""
    from chiron_tpu.eval import pipeline

    out = os.path.join(str(tmp_path), "out")
    flags = types.SimpleNamespace(
        input=EXAMPLE_SLOW, output=out, model=MODEL_SLOW,
        start=0, batch_size=8, segment_len=2000, jump=1900, threads=0,
        beam=0, extension="fastq", concise=False, mode="dna",
        reverse_fast5=False, recursive=False, sig_norm=1,
    )
    result = pipeline.run(flags)
    assert result["n_files"] == 2
    for sub in ("result", "segments"):
        golden_dir = os.path.join(EXAMPLE_SLOW, "output", sub)
        for f in sorted(os.listdir(golden_dir)):
            golden = open(os.path.join(golden_dir, f)).read()
            fresh = open(os.path.join(out, sub, f)).read()
            assert fresh == golden, f"slow golden mismatch for {sub}/{f}"
