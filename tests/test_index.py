"""Index construction parity vs the reference oracle.

Covers: SA-IS correctness (brute force), .pac packing, converted-genome
doubling, BWT/occ/L2/primary/sampled-SA equality with oracle-built artifacts.
"""
import subprocess

import numpy as np
import pytest

from biscuit_tpu import native
from biscuit_tpu.index.build import build_index, converted_doubled
from biscuit_tpu.index.fasta import pack_genome, read_pac
from biscuit_tpu.index.fmindex import (
    read_reference_ann, read_reference_bwt, read_reference_sa)


def brute_suffix_array(t: np.ndarray) -> np.ndarray:
    s = bytes(t)
    return np.array(sorted(range(len(s)), key=lambda i: s[i:]), dtype=np.int64)


def test_sais_small_random():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 7, 50, 257, 1000]:
        t = rng.integers(0, 4, size=n).astype(np.uint8)
        sa = native.suffix_array(t)
        np.testing.assert_array_equal(sa, brute_suffix_array(t))


def test_sais_repetitive():
    t = np.frombuffer(b"\x00\x01" * 500 + b"\x02\x00\x00\x01" * 250, dtype=np.uint8).copy()
    np.testing.assert_array_equal(native.suffix_array(t), brute_suffix_array(t))


def test_index_matches_reference(small_dataset):
    d = small_dataset
    fa = str(d / "genome.fa")
    idx = build_index(fa)

    # forward pac parity (.bis.pac)
    ref_pac = read_pac(fa + ".bis.pac")
    np.testing.assert_array_equal(idx.pac, ref_pac)

    # annotations parity (.bis.ann/.bis.amb)
    l_pac, anns, ambs = read_reference_ann(fa)
    assert l_pac == idx.l_pac
    assert [(a.name, a.offset, a.length, a.n_ambs) for a in anns] == \
           [(a.name, a.offset, a.length, a.n_ambs) for a in idx.anns]
    assert [(a.offset, a.length, a.amb) for a in ambs] == \
           [(a.offset, a.length, a.amb) for a in idx.ambs]

    # BWT/occ/SA parity per strand
    for tag, mine in (("par", idx.par), ("dau", idx.dau)):
        ref = read_reference_bwt(f"{fa}.{tag}.bwt")
        read_reference_sa(f"{fa}.{tag}.sa", ref)
        assert mine.primary == ref.primary, tag
        assert mine.seq_len == ref.seq_len, tag
        np.testing.assert_array_equal(mine.L2, ref.L2, err_msg=tag)
        np.testing.assert_array_equal(mine.words, ref.words, err_msg=tag)
        np.testing.assert_array_equal(mine.occ_cp, ref.occ_cp, err_msg=tag)
        # our index may sample the SA denser than the reference's fixed 32
        # (a pure speed/size dial); the rank-32k subset must match exactly
        stride = 32 // mine.sa_intv
        np.testing.assert_array_equal(mine.sa_samples[::stride][1:],
                                      ref.sa_samples[1:], err_msg=tag)


def test_save_load_roundtrip(small_dataset, tmp_path):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa, prefix=str(tmp_path / "g"))
    from biscuit_tpu.index.fmindex import BisIndex
    idx2 = BisIndex.load(str(tmp_path / "g"))
    np.testing.assert_array_equal(idx.pac, idx2.pac)
    np.testing.assert_array_equal(idx.par.words, idx2.par.words)
    np.testing.assert_array_equal(idx.dau.sa_samples, idx2.dau.sa_samples)
    assert idx.par.primary == idx2.par.primary


def test_converted_doubling():
    codes = np.array([0, 1, 2, 3, 1, 2], dtype=np.uint8)  # ACGTCG
    par = converted_doubled(codes, parent=True)
    # fwd C->T: A T G T T G ; revcomp = CGACGT -> C->T: TGATGT
    np.testing.assert_array_equal(par[:6], [0, 3, 2, 3, 3, 2])
    np.testing.assert_array_equal(par[6:], [3, 2, 0, 3, 2, 3])
    dau = converted_doubled(codes, parent=False)
    np.testing.assert_array_equal(dau[:6], [0, 1, 0, 3, 1, 0])
    np.testing.assert_array_equal(dau[6:], [1, 0, 0, 1, 0, 3])


def test_wide_index_layout(tmp_path, monkeypatch):
    """BISCUIT_TPU_WIDE_INDEX=1 forces the int64 SA-sample layout (the
    big-genome path); alignment output must not change."""
    import subprocess
    import sys
    from conftest import REPO
    d = tmp_path
    subprocess.run([sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
                    "--genome-size", "30000", "--n-reads", "60", "--seed", "9"],
                   check=True, capture_output=True)
    fa = str(d / "genome.fa")
    fq = str(d / "reads.fq")

    def run(env_extra):
        import os
        env = dict(os.environ, **env_extra)
        subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "index", fa],
                       check=True, capture_output=True, env=env)
        r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "align",
                            fa, fq], check=True, capture_output=True,
                           text=True, env=env)
        return [l for l in r.stdout.splitlines() if not l.startswith("@PG")]

    narrow = run({})
    import numpy as np
    wide_npz = np.load(fa + ".btidx.npz")
    assert wide_npz["dau_sa"].dtype.itemsize == 4
    wide = run({"BISCUIT_TPU_WIDE_INDEX": "1"})
    assert np.load(fa + ".btidx.npz")["dau_sa"].dtype.itemsize == 8
    assert narrow == wide
