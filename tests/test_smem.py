"""SMEM seeding parity vs the reference bwt_smem1a/bwt_seed_strategy1."""
import numpy as np
import pytest

from biscuit_tpu.config import MemOpt
from biscuit_tpu.index.build import build_index
from biscuit_tpu.ops.fm import FMNumpy
from biscuit_tpu.align import smem

from ref_bindings import RefBWT


@pytest.fixture(scope="module")
def setup(small_dataset):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    return (idx, RefBWT(fa + ".par.bwt", fa + ".par.sa"),
            RefBWT(fa + ".dau.bwt", fa + ".dau.sa"), small_dataset)


def read_seqs(path, limit=50):
    seqs = []
    from biscuit_tpu.index.fasta import NT4
    with open(path) as f:
        lines = f.read().splitlines()
    for i in range(0, min(len(lines), limit * 4), 4):
        seqs.append(NT4[np.frombuffer(lines[i + 1].encode(), dtype=np.uint8)])
    return seqs


def bsconvert(q, parent):
    q = q.copy()
    if parent:
        q[q == 1] = 3
    else:
        q[q == 2] = 0
    return q


def test_smem1a_parity(setup):
    idx, ref_par, ref_dau, d = setup
    par, dau = FMNumpy(idx.par), FMNumpy(idx.dau)
    seqs = read_seqs(d / "reads.fq", 30)
    for parent, fm, fmc, rf, rfc in ((1, par, dau, ref_par, ref_dau),
                                     (0, dau, par, ref_dau, ref_par)):
        for q in seqs[:15]:
            qc = bsconvert(q, parent)
            for x in [0, 5, len(qc) // 2, len(qc) - 1]:
                ret_ref, mem_ref = rf.smem1a(rfc, qc, x, 1)
                ret_mine, mem_mine = smem.smem1a(fm, fmc, qc, x, 1)
                assert ret_mine == ret_ref, f"parent={parent} x={x}"
                assert [tuple(int(v) for v in s) for s in mem_mine] == \
                       [tuple(int(v) for v in s) for s in mem_ref], f"parent={parent} x={x}"


def test_seed_strategy1_parity(setup):
    idx, ref_par, ref_dau, d = setup
    par, dau = FMNumpy(idx.par), FMNumpy(idx.dau)
    seqs = read_seqs(d / "reads.fq", 10)
    for q in seqs:
        qc = bsconvert(q, 1)
        for x in [0, 10, 50]:
            ret_ref, m_ref = ref_par.seed_strategy1(ref_dau, qc, x, 19, 20)
            ret_mine, m_mine = smem.seed_strategy1(par, dau, qc, x, 19, 20)
            assert ret_mine == ret_ref
            if m_mine is None:
                assert m_ref[4] == 0
            else:
                assert (m_mine[0], m_mine[1], m_mine[2], m_mine[3], m_mine[4]) == \
                       (m_ref[0], m_ref[1], m_ref[2], m_ref[3], m_ref[4])


def test_collect_intv_smoke(setup):
    """mem_collect_intv has no direct C entry we can call with caches, so
    cross-check pass-1 seeds are a superset-consistent, sorted list."""
    idx, _, _, d = setup
    par, dau = FMNumpy(idx.par), FMNumpy(idx.dau)
    opt = MemOpt()
    seqs = read_seqs(d / "reads.fq", 5)
    for q in seqs:
        qc = bsconvert(q, 1)
        seeds = smem.collect_intv(opt, par, dau, qc)
        assert seeds, "a simulated read should produce seeds"
        infos = [(s[0] << 32) | s[1] for s in seeds]
        assert infos == sorted(infos)
        for s in seeds:
            assert s[1] - s[0] >= opt.min_seed_len or s[4] > 0
