import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from synth import make_fast5_dir, synth_read, write_fast5


def test_attention_decoder_shapes():
    from chiron_tpu.models.attention import (
        attention_decode,
        attention_teacher_forcing_loss,
        init_attention_decoder,
    )

    params = init_attention_decoder(jax.random.PRNGKey(0), enc_dim=16, hidden=8)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    enc_len = jnp.asarray([12, 7])
    tokens, logits = attention_decode(params, enc, enc_len, max_steps=6)
    assert tokens.shape == (2, 6)
    assert logits.shape == (2, 6, 5)
    targets = jnp.asarray([[0, 1, 2, 3], [3, 2, 1, 0]])
    loss = attention_teacher_forcing_loss(
        params, enc, enc_len, targets, jnp.asarray([4, 3])
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: attention_teacher_forcing_loss(
            p, enc, enc_len, targets, jnp.asarray([4, 3])
        )
    )(params)
    assert np.isfinite(float(jnp.sum(g["out_w"])))


def test_bnlstm_model_trains():
    from chiron_tpu import config as C
    from chiron_tpu.models import apply_model, init_model

    cfg = C.default_config()
    cfg["cnn"] = {"model": "custom"}
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 8, "cell_type": "BNLSTM",
                  "layer_type": "normal"}
    params = init_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    logits = apply_model(params, cfg, x, jnp.full((4,), 32, jnp.int32))
    assert logits.shape == (4, 32, 5)
    assert bool(jnp.isfinite(logits).all())


def test_assess_known_alignment():
    from chiron_tpu.tools.assess import assess_read, banded_global_align

    ref = "ACGTACGTACGT"
    # identical
    r = assess_read(ref, ref)
    assert r["identity"] == 1.0 and r["error_rate"] == 0.0
    # one mismatch
    called = "ACGTACGAACGT"
    r = assess_read(called, ref)
    assert r["mismatches"] == 1 and r["matches"] == 11
    # one deletion
    r = assess_read("ACGTCGTACGT"[:11], ref)
    assert r["deletions"] >= 1
    # one insertion
    r = assess_read("ACGGTACGTACGT", ref)
    assert r["insertions"] == 1 and r["matches"] == 12
    # RNA-mode output writes U for T (io/writers.py:44-45); the scorer must
    # canonicalize or every U counts as a mismatch (the round-3
    # synthetic_rna "skill 0.00" artifact)
    r = assess_read("ACGUACGUACGU", ref)
    assert r["identity"] == 1.0 and r["error_rate"] == 0.0
    r = assess_read("acguacguacgu", ref)
    assert r["identity"] == 1.0
    assert r["kmer11_hit_rate"] == 1.0


def test_assess_dir(tmp_path):
    from chiron_tpu.tools.assess import assess_dir

    result = os.path.join(str(tmp_path), "result")
    refdir = os.path.join(str(tmp_path), "reference")
    os.makedirs(result)
    os.makedirs(refdir)
    open(os.path.join(result, "read1.fastq"), "w").write(
        "@read1\nACGTACGT\n+\nIIIIIIII\n"
    )
    open(os.path.join(refdir, "read1_ref.fastq"), "w").write(
        "@read1\nACGTACGT\n+\nIIIIIIII\n"
    )
    out = assess_dir(result, refdir)
    assert out["summary"]["n_reads"] == 1
    assert out["summary"]["identity"] == 1.0


def test_grid_search_generate(tmp_path):
    from chiron_tpu.tools.grid_search import generate_configs, write_configs

    configs = generate_configs()
    assert len(configs) == 16  # 1 cnn x 2 hu x 2 kw x 2 st x 2 rnn
    paths = write_configs(str(tmp_path), configs)
    cfg = json.load(open(paths[0]))
    assert cfg["cnn"]["model"] == "dynamic_net"
    # generated configs must be buildable
    from chiron_tpu.models import init_model

    init_model(jax.random.PRNGKey(0), cfg)


def test_file_batch_tool(tmp_path):
    from chiron_tpu.io.binfmt import read_bin_folder
    from chiron_tpu.tools import file_batch

    rng = np.random.RandomState(0)
    f5dir = os.path.join(str(tmp_path), "fast5")
    os.makedirs(f5dir)
    for i in range(2):
        seq, starts, lengths, signal = synth_read(rng, 300)
        write_fast5(os.path.join(f5dir, f"r{i}.fast5"), signal, starts,
                    lengths, seq)
    out = os.path.join(str(tmp_path), "bins")
    args = types.SimpleNamespace(
        input=f5dir, output=out, basecall_group="Corrected_000",
        basecall_subgroup="BaseCalled_template", length=256, batch=4,
        normalization="median", max=10, mode="dna",
    )
    result = file_batch.run(args)
    assert result["success"] == 2
    assert result["batches"] >= 1
    e, el, lb, ll = read_bin_folder(out)
    assert e.shape[1] == 256
    assert len(e) >= 4
    assert np.all(ll > 0)


def test_labeler_pipeline(tmp_path):
    from chiron_tpu.tools import labeler

    rng = np.random.RandomState(1)
    f5dir = os.path.join(str(tmp_path), "fast5")
    os.makedirs(f5dir)
    seqs = {}
    for i in range(2):
        seq, starts, lengths, signal = synth_read(rng, 120, noise=2.0)
        write_fast5(os.path.join(f5dir, f"r{i}.fast5"), signal,
                    read_id=f"read{i}")
        seqs[f"read{i}"] = seq
    # per-read reference fasta keyed by read id (no aligner available)
    ref_path = os.path.join(str(tmp_path), "refs.fasta")
    with open(ref_path, "w") as f:
        for name, seq in seqs.items():
            f.write(f">{name}\n{seq}\n")
    args = types.SimpleNamespace(
        input=f5dir, ref=ref_path, polya=None, mode=0,
        saving=os.path.join(str(tmp_path), "out"), thread=1,
        pore_model=None, radius=40,
    )
    results = labeler.run(args)
    assert results.get("ok") == 2
    out_files = os.listdir(os.path.join(str(tmp_path), "out", "fast5s"))
    assert len(out_files) == 2
    # written labels must be readable by the export pipeline
    from chiron_tpu.io.labels import get_label_raw

    (raw, label, s, l), _ = get_label_raw(
        os.path.join(str(tmp_path), "out", "fast5s", out_files[0]),
        "Corrected_000", "BaseCalled_template",
    )
    assert len(label) == 120


def test_train_from_bin_folder(tmp_path):
    from chiron_tpu.io.binfmt import write_bin, write_meta
    from chiron_tpu.train import loop

    rng = np.random.RandomState(7)
    data = os.path.join(str(tmp_path), "bins")
    os.makedirs(data)
    n, L = 32, 64
    events = [rng.randn(L).astype(np.float32) for _ in range(n)]
    labels = [list(rng.randint(0, 4, 5)) for _ in range(n)]
    write_bin(os.path.join(data, "data_batch_1.bin"), events, [L] * n,
              labels, [5] * n)
    write_meta(data, L, n, "median", "g", "s", "dna")
    ds = loop.load_dataset(data, L)
    assert ds.n == n
    batch = ds.next_batch(8)
    assert batch["signal"].shape == (8, L)
    assert batch["label_len"][0] == 5


def test_methylation_alphabet_model():
    # 5-letter alphabet (ACGTX) -> 6 CTC classes; loss/greedy/beam must all
    # handle the wider class count (reference marks methylation calling
    # "under construction"; this completes the plumbing).
    from chiron_tpu import config as C
    from chiron_tpu.models import apply_model, init_model
    from chiron_tpu.ops.ctc_greedy import greedy_decode
    from chiron_tpu.ops.ctc_beam import beam_search_decode
    from chiron_tpu.ops.ctc_loss import ctc_loss

    cfg = C.default_config()
    cfg["alphabet"] = 5
    cfg["cnn"] = {"model": "custom"}
    cfg["rnn"] = {"layer_num": 1, "hidden_num": 8, "cell_type": "LSTM",
                  "layer_type": "normal"}
    assert C.class_n(cfg) == 6
    assert C.alphabet(cfg) == "ACGTX"
    params = init_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 24))
    sl = jnp.full((3,), 24, jnp.int32)
    logits = apply_model(params, cfg, x, sl)
    assert logits.shape == (3, 24, 6)
    dec, lens, _ = greedy_decode(logits, sl)
    assert np.all(np.asarray(dec)[np.asarray(dec) >= 0] <= 4)  # X = class 4
    bdec, blens, _ = beam_search_decode(logits, sl, beam_width=4)
    assert bdec.shape == (3, 24)
    # the Pallas fast path must cover 6 classes too (interpreter parity)
    from chiron_tpu.ops.pallas.beam import beam_search_pallas

    pdec, plens, _ = beam_search_pallas(logits, sl, beam_width=4,
                                        batch_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(bdec), np.asarray(pdec))
    np.testing.assert_array_equal(np.asarray(blens), np.asarray(plens))
    labels = jnp.asarray([[0, 4, 2], [1, 1, 3], [4, 4, 4]])
    loss = ctc_loss(logits, sl, labels, jnp.asarray([3, 3, 3]))
    assert np.all(np.isfinite(np.asarray(loss)))


def test_merge_fasta(tmp_path):
    """merge.sh parity: per-read fastas -> one multi-record fasta."""
    import os

    from chiron_tpu.tools.merge_fasta import merge_fasta

    d = tmp_path / "result"
    os.makedirs(str(d))
    (d / "readB.fasta").write_text(">readB\nACGTACGT\n")
    (d / "readA.fasta").write_text(">readA\nTTTT\n")
    (d / "skip.fastq").write_text("@x\nAC\n+\n!!\n")
    out = str(tmp_path / "merged" / "all.fasta")
    n = merge_fasta(str(d), out)
    assert n == 2
    text = open(out).read()
    assert ">sequence1 readA\nTTTT" in text
    assert ">sequence2 readB\nACGTACGT" in text


def test_label_slice(tmp_path):
    """Per-label signal slicing (parity: utils/cmle_training_preprocess.pl)."""
    from chiron_tpu.tools.label_slice import slice_labels

    (tmp_path / "r.signal").write_text("10 20 30 40 50 60\n")
    (tmp_path / "r.label").write_text("0 3 A\n3 5 C\n")
    out = tmp_path / "out.tsv"
    assert slice_labels(str(tmp_path / "r"), str(out)) == 2
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows[0][:5] == ["A", "0", "3", "6", "10,20,30"]
    assert rows[1][:5] == ["C", "3", "5", "6", "40,50"]


def test_dedup_fasta(tmp_path):
    """remove_duplicate.py parity: last record per header wins."""
    from chiron_tpu.tools.dedup_fasta import dedup_fast

    fa = tmp_path / "in.fasta"
    fa.write_text(">r1\nAAAA\n>r2\nCCCC\n>r1\nGGGG\nTTTT\n")
    out = tmp_path / "out.fasta"
    n_in, n_out = dedup_fast(str(fa), str(out))
    assert (n_in, n_out) == (3, 2)
    assert out.read_text() == ">r1\nGGGG\nTTTT\n>r2\nCCCC\n"

    # fastq with a quality line starting with '@' must not split records
    fq = tmp_path / "in.fastq"
    fq.write_text("@r1\nACGT\n+\n@@@@\n@r1\nTTTT\n+\n!!!!\n@r2\nGG\n+\n##\n")
    out2 = tmp_path / "out.fastq"
    n_in, n_out = dedup_fast(str(fq), str(out2))
    assert (n_in, n_out) == (3, 2)
    assert out2.read_text() == "@r1\nTTTT\n+\n!!!!\n@r2\nGG\n+\n##\n"


def test_banded_align_scalar_parity():
    # the row-vectorised banded DP must match a cell-by-cell scalar pass
    import numpy as np

    from chiron_tpu.tools.assess import banded_global_align

    def scalar(a, b, band, match=1, mismatch=-3, go=-2 - 3, ge=-2):
        # affine scores inline: open = -5 (plus extend on first gap char)
        go, ge = -5, -2
        n, m = len(a), len(b)
        if n == 0 or m == 0:
            return 0, 0, n, m
        av = np.frombuffer(a.encode(), np.uint8)
        bv = np.frombuffer(b.encode(), np.uint8)
        neg = -(1 << 30)
        width = 2 * band + 1
        M = np.full(width, neg, np.int64)
        X = np.full(width, neg, np.int64)
        Y = np.full(width, neg, np.int64)
        pM = np.zeros((n + 1, width), np.int8)
        pX = np.zeros((n + 1, width), np.int8)
        pY = np.zeros((n + 1, width), np.int8)

        def rng_(i):
            return max(0, i - band), min(m, i + band) + 1

        lo0, hi0 = rng_(0)
        M[0 - lo0] = 0
        for j in range(1, hi0):
            Y[j - lo0] = go + ge * j
            pY[0, j - lo0] = 2 if j > 1 else 0
        prevM, prevX, prevY, prev_lo = M.copy(), X.copy(), Y.copy(), lo0
        for i in range(1, n + 1):
            lo, hi = rng_(i)
            M = np.full(width, neg, np.int64)
            X = np.full(width, neg, np.int64)
            Y = np.full(width, neg, np.int64)
            for j in range(lo, hi):
                k = j - lo
                pk = j - prev_lo
                if 0 <= pk < width:
                    xo = prevM[pk] + go + ge
                    xe = prevX[pk] + ge
                    if xe > xo:
                        X[k] = xe
                        pX[i, k] = 1
                    else:
                        X[k] = xo
                if j - 1 >= lo:
                    yo = M[k - 1] + go + ge
                    ye = Y[k - 1] + ge
                    if ye > yo:
                        Y[k] = ye
                        pY[i, k] = 2
                    else:
                        Y[k] = yo
                if j >= 1 and 0 <= (j - 1 - prev_lo) < width:
                    pd = j - 1 - prev_lo
                    cands = (prevM[pd], prevX[pd], prevY[pd])
                    kk = int(np.argmax(cands))
                    if cands[kk] > neg:
                        sub = match if av[i - 1] == bv[j - 1] else mismatch
                        M[k] = cands[kk] + sub
                        pM[i, k] = kk
            prevM, prevX, prevY, prev_lo = M, X, Y, lo
        lo, hi = rng_(n)
        k = m - lo
        if not (0 <= k < width):
            return 0, 0, n, m
        state = int(np.argmax((M[k], X[k], Y[k])))
        i, j = n, m
        ma = mi = ins = de = 0
        while i > 0 or j > 0:
            k = j - max(0, i - band)
            if state == 0 and i > 0 and j > 0:
                if av[i - 1] == bv[j - 1]:
                    ma += 1
                else:
                    mi += 1
                state = int(pM[i, k]); i -= 1; j -= 1
            elif state == 1 and i > 0:
                ins += 1
                state = 0 if pX[i, k] == 0 else 1
                i -= 1
            elif j > 0:
                de += 1
                state = 0 if pY[i, k] == 0 else 2
                j -= 1
            else:
                ins += i
                break
        return ma, mi, ins, de

    rng = np.random.RandomState(6)

    def mut(seq, err):
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

    for _ in range(40):
        n = rng.randint(1, 180)
        ref = "".join("ACGT"[i] for i in rng.randint(0, 4, n))
        called = mut(ref, rng.choice([0.0, 0.05, 0.2, 0.5]))
        band = int(rng.choice([2, 4, 8, 64]))
        assert banded_global_align(called, ref, band) == scalar(
            called, ref, band
        ), (called, ref, band)


def test_make_bundled_models_install(tmp_path, monkeypatch):
    # stage_install copies the newest ema/final pair + checkpoint pointer
    import numpy as np

    from chiron_tpu.tools import make_bundled_models as mbm
    from chiron_tpu.train.checkpoint import save_checkpoint

    work = str(tmp_path / "work")
    repo = tmp_path / "repo"
    for name in ("DNA_default", "RNA_default"):
        (repo / "chiron_tpu" / "model" / name).mkdir(parents=True)
    src = os.path.join(work, "models", "DNA_retrain")
    save_checkpoint(src, {"w": np.ones(2)}, 100, prefix="final")
    save_checkpoint(src, {"w": np.ones(2) * 2}, 100, prefix="ema")
    # the config travels with the weights (round-5 net2wide capacity jumps)
    (tmp_path / "work" / "models" / "DNA_retrain" / "model.json").write_text(
        '{"rnn": {"hidden_num": 128}}'
    )
    (tmp_path / "work" / "dna_pore_model.tsv").write_text("kmer\tm\ts\n")
    monkeypatch.setattr(mbm, "REPO", str(repo))
    mbm.stage_install(work)
    dst = repo / "chiron_tpu" / "model" / "DNA_default"
    assert sorted(f for f in os.listdir(dst) if f.endswith(".npz")) == [
        "ema-100.npz", "final-100.npz"
    ]
    assert (dst / "checkpoint").read_text().strip() == "ema-100.npz"
    assert (dst / "pore_model.tsv").exists()
    assert "128" in (dst / "model.json").read_text()
