"""Device (batched JAX) SMEM seeding vs the host ground truth."""
import numpy as np
import pytest

from biscuit_tpu.config import MemOpt
from biscuit_tpu.index.build import build_index
from biscuit_tpu.index.fasta import NT4
from biscuit_tpu.ops.fm import FMNumpy
from biscuit_tpu.ops import seed_batch
from biscuit_tpu.align import smem


@pytest.fixture(scope="module")
def setup(small_dataset):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    fmpair = seed_batch.FMPair.from_index(idx)
    return idx, fmpair, small_dataset


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


def pad_batch(seqs):
    L = max(len(s) for s in seqs)
    q = np.full((len(seqs), L), 4, dtype=np.int32)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        q[i, :len(s)] = s
        lens[i] = len(s)
    return q, lens


def test_collect_intv_batch_parity(setup):
    idx, fmpair, d = setup
    opt = MemOpt()
    par_n = FMNumpy(idx.par)
    dau_n = FMNumpy(idx.dau)
    raw = read_seqs(d / "reads.fq", 40)
    # include an ambiguous-base read and a short read
    amb = raw[0].copy()
    amb[10] = 4
    amb[50] = 4
    seqs = raw + [amb, raw[1][:25]]
    parents = [i % 2 for i in range(len(seqs))]
    conv = [bsconvert(s, p) for s, p in zip(seqs, parents)]
    q, lens = pad_batch(conv)
    got, overflow = seed_batch.collect_intv_batch(
        fmpair, q, lens, np.array(parents, np.int32), opt)
    assert not overflow.any()
    for b, (s, p) in enumerate(zip(conv, parents)):
        fm, fmc = (par_n, dau_n) if p else (dau_n, par_n)
        want = smem.collect_intv(opt, fm, fmc, s)
        assert got[b] == want, f"lane {b} parent={p}\n got={got[b][:5]}\nwant={want[:5]}"
