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


def _mutate(rng, seq, err):
    out = []
    for c in seq:
        r = rng.rand()
        if r < err / 3:
            continue
        if r < 2 * err / 3:
            out.append("ACGT"[rng.randint(4)])
        else:
            out.append(c)
            if rng.rand() < err / 3:
                out.append("ACGT"[rng.randint(4)])
    return "".join(out)


def test_matching_blocks_difflib_parity():
    # the native fast path must reproduce difflib block for block
    import difflib

    from chiron_tpu.assembly.consensus import _matching_blocks

    rng = np.random.RandomState(3)
    for _ in range(150):
        a = _random_seq(rng, rng.randint(0, 199))
        b = _mutate(rng, a, rng.choice([0.05, 0.3, 0.9]))[:198]
        got = _matching_blocks(a, b)
        want = [tuple(bl)
                for bl in difflib.SequenceMatcher(a=a, b=b).get_matching_blocks()]
        assert got == want, (a, b)


def test_global_kernel_native_matches_numpy():
    from chiron_tpu.assembly.consensus import (_load_native, _match_blocks,
                                               _nw_align)

    if _load_native() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.RandomState(4)
    for _ in range(60):
        n = rng.randint(3, 220)
        prev = _random_seq(rng, n)
        cur = _mutate(rng, prev[n // 2:] + _random_seq(rng, n // 2),
                      rng.choice([0.05, 0.15, 0.4]))
        if not cur:
            continue
        native = global_kernel(cur, prev)
        ap, ac = _nw_align(prev, cur)
        block = max(_match_blocks(ap, ac), key=lambda x: x[0])
        assert native == block[1] - block[2]


def test_nw_align_scalar_parity():
    # the row-vectorised DP must match a cell-by-cell scalar evaluation
    from chiron_tpu.assembly.consensus import _nw_align

    def scalar(a, b, match=1, mismatch=-3, go=-5, ge=-2):
        n, m = len(a), len(b)
        neg = -1e9
        M = np.full((n + 1, m + 1), neg)
        X = np.full((n + 1, m + 1), neg)
        Y = np.full((n + 1, m + 1), neg)
        M[0, 0] = 0.0
        Y[0, 1:] = go + ge * np.arange(m)
        pM = np.zeros((n + 1, m + 1), np.int8)
        pX = np.zeros((n + 1, m + 1), np.int8)
        pY = np.zeros((n + 1, m + 1), np.int8)
        for i in range(1, n + 1):
            for j in range(0, m + 1):
                xo = M[i - 1, j] + go + ge
                xe = X[i - 1, j] + ge
                X[i, j] = max(xo, xe)
                pX[i, j] = 1 if xe > xo else 0
            for j in range(1, m + 1):
                yo = M[i, j - 1] + go + ge
                ye = Y[i, j - 1] + ge
                if ye > yo:
                    Y[i, j] = ye
                    pY[i, j] = 2
                else:
                    Y[i, j] = yo
                cands = (M[i - 1, j - 1], X[i - 1, j - 1], Y[i - 1, j - 1])
                k = int(np.argmax(cands))
                sub = match if a[i - 1] == b[j - 1] else mismatch
                M[i, j] = cands[k] + sub
                pM[i, j] = k
        state = int(np.argmax((M[n, m], X[n, m], Y[n, m])))
        i, j = n, m
        oa, ob = [], []
        while i > 0 or j > 0:
            if state == 0 and i > 0 and j > 0:
                oa.append(a[i - 1])
                ob.append(b[j - 1])
                state = int(pM[i, j]); i -= 1; j -= 1
            elif state == 1 and i > 0:
                oa.append(a[i - 1]); ob.append("-")
                state = 0 if pX[i, j] == 0 else 1; i -= 1
            elif j > 0:
                oa.append("-"); ob.append(b[j - 1])
                state = 0 if pY[i, j] == 0 else 2; j -= 1
            else:
                break
        return "".join(reversed(oa)), "".join(reversed(ob))

    rng = np.random.RandomState(5)
    for _ in range(25):
        a = _random_seq(rng, rng.randint(1, 60))
        b = _mutate(rng, a, rng.choice([0.1, 0.5]))
        if not b:
            continue
        assert _nw_align(a, b) == scalar(a, b)
