import numpy as np

from chiron_tpu.assembly import (
    consensus_to_bases,
    get_assembler_kernel,
    glue_kernel,
    global_kernel,
    qs,
    simple_assembly,
    simple_assembly_qs,
    stick_kernel,
)


def _random_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.randint(0, 4, n))


def test_kernel_selection():
    # dna-pre: jump 390 / seg 400 -> glue; jump == seg -> stick
    assert get_assembler_kernel(390, 400) == "glue"
    assert get_assembler_kernel(400, 400) == "stick"
    assert get_assembler_kernel(200, 400) == "simple"


def test_glue_kernel_finds_overlap():
    rng = np.random.RandomState(0)
    prev = _random_seq(rng, 200)
    overlap = 12  # < 10% of 200
    cur = prev[-overlap:] + _random_seq(rng, 100)
    disp = glue_kernel(cur, prev)
    assert disp == len(prev) - overlap


def test_stick_kernel():
    assert stick_kernel("ACGT", "TTTT") == 4


def test_global_kernel_displacement():
    rng = np.random.RandomState(1)
    prev = _random_seq(rng, 60)
    # current read = suffix of prev (from position 20) + new tail
    cur = prev[20:] + _random_seq(rng, 15)
    disp = global_kernel(cur, prev)
    assert disp == 20


def test_glue_assembly_reconstructs_read():
    rng = np.random.RandomState(2)
    true_read = _random_seq(rng, 800)
    # windows of 110 bases advancing by 100 (overlap 10 < 10% of 110)
    windows = [true_read[i:i + 110] for i in range(0, 700, 100)]
    consensus = simple_assembly(windows, 100 / 110, kernel="glue")
    recovered = consensus_to_bases(consensus)
    assert recovered == true_read[: len(recovered)]
    assert len(recovered) >= 700


def test_assembly_qs_counts_and_quality():
    windows = ["ACGT", "ACGT"]
    qs_list = np.asarray([[1.0], [2.0]])
    consensus, consensus_qs = simple_assembly_qs(
        windows, qs_list, 1.0, kernel="stick"
    )
    assert consensus.shape[1] == 8
    # every position covered exactly once with the right base
    assert consensus_to_bases(consensus) == "ACGTACGT"
    q = qs(consensus, consensus_qs)
    assert isinstance(q, str) and len(q) == 8


def test_simple_assembly_matches_qs_variant():
    rng = np.random.RandomState(3)
    true_read = _random_seq(rng, 400)
    windows = [true_read[i:i + 110] for i in range(0, 300, 100)]
    qs_list = np.ones((len(windows), 1))
    c1 = simple_assembly(windows, 100 / 110, kernel="glue")
    c2, _ = simple_assembly_qs(windows, qs_list, 100 / 110, kernel="glue")
    np.testing.assert_array_equal(c1, c2)


def test_negative_displacement_clipping():
    # A displacement that lands before position 0 must clip the segment
    # (reference add_count behaviour, easy_assembler.py:381-388).
    consensus = simple_assembly(["AC", "TTACGT"], 1.0, kernel="stick")
    assert consensus.shape[1] >= 2


def test_native_assembly_matches_python():
    """C++ glue/stick assembly is bit-identical to the Python loop."""
    import numpy as np

    from chiron_tpu.assembly import consensus as A

    lib = A._load_native()
    assert lib is not None, "native assembly should build here"
    rng = np.random.RandomState(0)
    bases = "ACGT"
    # overlapping windows from one underlying sequence, with errors
    seq = "".join(bases[i] for i in rng.randint(0, 4, 3000))
    windows = []
    for s in range(0, 2500, 95):
        w = list(seq[s:s + 100])
        for _ in range(3):  # a few random errors
            w[rng.randint(0, len(w))] = bases[rng.randint(0, 4)]
        windows.append("".join(w))
    qs = np.asarray([[float(rng.rand())] for _ in windows])
    for kernel in ("glue", "stick"):
        nat_c, nat_q = A._native_assembly(
            windows, np.asarray([q[0] for q in qs], np.float32), kernel
        )
        # force the python path by stubbing the lib out
        saved = A._native_lib
        A._native_lib = False
        try:
            py_c, py_q = A.simple_assembly_qs(windows, qs, 0.95, kernel=kernel)
            py_c2 = A.simple_assembly(windows, 0.95, kernel=kernel)
        finally:
            A._native_lib = saved
        np.testing.assert_array_equal(nat_c, py_c)
        np.testing.assert_allclose(nat_q, py_q, rtol=1e-6, atol=1e-9)
        np.testing.assert_array_equal(nat_c, py_c2)
