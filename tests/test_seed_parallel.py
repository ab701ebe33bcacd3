"""Parallel (per-position) device seeder vs host ground truth."""
import numpy as np
import pytest

from biscuit_tpu.config import MemOpt
from biscuit_tpu.index.build import build_index
from biscuit_tpu.index.fasta import NT4
from biscuit_tpu.ops.fm import FMNumpy
from biscuit_tpu.ops.seed_batch import FMPair
from biscuit_tpu.ops.seed_parallel import collect_intv_parallel
from biscuit_tpu.align import smem


@pytest.fixture(scope="module")
def setup(small_dataset):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    return idx, FMPair.from_index(idx), small_dataset


def read_seqs(path, limit):
    seqs = []
    with open(path) as f:
        lines = f.read().splitlines()
    for i in range(0, min(len(lines), limit * 4), 4):
        seqs.append(NT4[np.frombuffer(lines[i + 1].encode(), dtype=np.uint8)])
    return seqs


def bsconvert(qq, parent):
    qq = qq.copy()
    if parent:
        qq[qq == 1] = 3
    else:
        qq[qq == 2] = 0
    return qq


def test_parallel_seeder_parity(setup):
    idx, fmpair, d = setup
    opt = MemOpt()
    par_n, dau_n = FMNumpy(idx.par), FMNumpy(idx.dau)
    raw = read_seqs(d / "reads.fq", 60)
    amb = raw[0].copy()
    amb[10] = 4
    amb[50] = 4
    seqs = raw + [amb, raw[1][:25], raw[2][:19]]
    parents = [i % 2 for i in range(len(seqs))]
    conv = [bsconvert(s, p) for s, p in zip(seqs, parents)]
    L = max(len(s) for s in conv)
    q = np.full((len(conv), L), 4, np.int32)
    lens = np.zeros(len(conv), np.int32)
    for i, s in enumerate(conv):
        q[i, :len(s)] = s
        lens[i] = len(s)
    got, overflow = collect_intv_parallel(fmpair, q, lens,
                                          np.array(parents, np.int32), opt)
    assert not overflow.any()
    for b, (s, p) in enumerate(zip(conv, parents)):
        fm, fmc = (par_n, dau_n) if p else (dau_n, par_n)
        want = smem.collect_intv(opt, fm, fmc, s)
        assert got[b] == want, \
            f"lane {b} parent={p}\n got({len(got[b])})={got[b][:6]}\nwant({len(want)})={want[:6]}"
