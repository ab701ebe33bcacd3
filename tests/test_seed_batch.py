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


@pytest.fixture(scope="module")
def wide_setup(small_dataset, monkeypatch_module):
    """Same genome forced onto the wide (int64 SA / split-count) layout —
    the big-genome path (reference bwtint_t semantics) on a testable size."""
    monkeypatch_module.setenv("BISCUIT_TPU_WIDE_INDEX", "1")
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    assert idx.dau.sa_samples.dtype.itemsize == 8
    fmpair = seed_batch.FMPair.from_index(idx)
    assert fmpair.wide and fmpair.tab.shape[-1] == 12
    return idx, fmpair, small_dataset


def test_collect_intv_wide_parity(wide_setup):
    """Wide (int64-rank) device seeding matches the host ground truth."""
    idx, fmpair, d = wide_setup
    opt = MemOpt()
    par_n = FMNumpy(idx.par)
    dau_n = FMNumpy(idx.dau)
    raw = read_seqs(d / "reads.fq", 24)
    seqs = raw + [raw[1][:25]]
    parents = [i % 2 for i in range(len(seqs))]
    conv = [bsconvert(s, p) for s, p in zip(seqs, parents)]
    q, lens = pad_batch(conv)
    got, overflow = seed_batch.collect_intv_batch(
        fmpair, q, lens, np.array(parents, np.int32), opt)
    assert not overflow.any()
    for b, (s, p) in enumerate(zip(conv, parents)):
        fm, fmc = (par_n, dau_n) if p else (dau_n, par_n)
        want = smem.collect_intv(opt, fm, fmc, s)
        assert got[b] == want, f"lane {b} parent={p}"


def test_sa_batch_wide_parity(wide_setup):
    """Wide batched SA walk matches the scalar host sa() for every rank."""
    idx, fmpair, _d = wide_setup
    par_n = FMNumpy(idx.par)
    dau_n = FMNumpy(idx.dau)
    n = int(idx.dau.seq_len)
    rng = np.random.default_rng(7)
    ranks = rng.integers(1, n, 256).astype(np.int64)
    which = rng.integers(0, 2, 256).astype(np.int32)
    got = seed_batch.sa_batch_np(fmpair, which, ranks)
    for w, k, g in zip(which, ranks, got):
        fm = par_n if w else dau_n
        assert int(g) == int(fm.sa_s(int(k))), (w, k)


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


@pytest.mark.parametrize("mode", ["pool", "merged", "fused"])
def test_seeder_modes_identical_to_log(setup, monkeypatch, mode):
    """Every seeder generation (log default, pool, merged, fused) produces
    the identical flat (read, rows, overflow) stream."""
    idx, fmpair, d = setup
    opt = MemOpt()
    raw = read_seqs(d / "reads.fq", 48)
    seqs = raw + [raw[1][:25]]
    parents = [i % 2 for i in range(len(seqs))]
    conv = [bsconvert(s, p) for s, p in zip(seqs, parents)]
    q, lens = pad_batch(conv)
    par = np.array(parents, np.int32)
    monkeypatch.setenv("BISCUIT_TPU_SEED_LANES", "32")
    monkeypatch.setenv("BISCUIT_TPU_SEEDER", "log")
    rid_l, rows_l, ov_l = seed_batch.collect_intv_flat_sm(
        fmpair, q, lens, par, opt)
    monkeypatch.setenv("BISCUIT_TPU_SEEDER", mode)
    rid_m, rows_m, ov_m = seed_batch.collect_intv_flat_sm(
        fmpair, q, lens, par, opt)
    assert not ov_l.any() and not ov_m.any()
    assert (rid_l == rid_m).all() and (rows_l == rows_m).all()


def test_log_seeder_spill_flags_not_truncates(setup):
    """Tiny W / LOG_LEN force every spill class; affected reads are flagged
    for host rerun and surviving rows still match the pool machine."""
    import jax.numpy as jnp
    idx, fmpair, d = setup
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    raw = read_seqs(d / "reads.fq", 64)
    parents = [i % 2 for i in range(len(raw))]
    conv = [bsconvert(s, p) for s, p in zip(raw, parents)]
    q, lens = pad_batch(conv)
    B, L = q.shape
    pool = np.full((B, L + 2), 4, np.int32)
    pool[:, :L] = q
    pool[:, L] = lens
    pool[:, L + 1] = parents
    # W=2: same-iteration store bursts overflow -> reads flagged
    out = seed_batch._collect_sm_log(
        fmpair, jnp.asarray(pool), int(opt.min_seed_len),
        int(opt.max_mem_intv), split_len, int(opt.split_width),
        16, 32, 16, 4096, 2)
    packed, rid_sorted, total, ov_rd, ov_spill, next_ctr, unf = \
        [np.asarray(x) for x in out]
    assert not bool(ov_spill)
    flagged = set(ov_rd[ov_rd >= 0].tolist()) | set(unf[unf >= 0].tolist())
    out2 = seed_batch._collect_sm_pool(
        fmpair, jnp.asarray(pool), int(opt.min_seed_len),
        int(opt.max_mem_intv), split_len, int(opt.split_width),
        16, 32, 256, 16)
    packed_p, rid_p, total_p, *_ = [np.asarray(x) for x in out2]
    rid_l, rows_l = rid_sorted[:total], packed[:total]
    rid_pp, rows_p = rid_p[:total_p], packed_p[:total_p]
    keep_l = ~np.isin(rid_l, list(flagged))
    keep_p = ~np.isin(rid_pp, list(flagged))
    assert (rid_l[keep_l] == rid_pp[keep_p]).all()
    assert (rows_l[keep_l] == rows_p[keep_p]).all()
    # LOG_LEN=32: forced exit -> every mid-flight lane + unclaimed tail
    # reported; nothing silently lost
    out3 = seed_batch._collect_sm_log(
        fmpair, jnp.asarray(pool), int(opt.min_seed_len),
        int(opt.max_mem_intv), split_len, int(opt.split_width),
        16, 32, 16, 32, 128)
    _, _, _, ov3, _, nc3, unf3 = [np.asarray(x) for x in out3]
    assert (np.asarray(unf3) >= 0).sum() > 0
    assert int(nc3) < B


def test_split_tab_path_parity(wide_setup, monkeypatch):
    """BISCUIT_TPU_SPLIT_TAB=1 (the >2^31-element fused-table regime:
    XLA:CPU gather offsets overflow int32, so human-scale wide tables
    gather each strand separately) must match the fused single-gather."""
    idx, fmpair, d = wide_setup
    opt = MemOpt()
    raw = read_seqs(d / "reads.fq", 16)
    parents = [i % 2 for i in range(len(raw))]
    conv = [bsconvert(s, p) for s, p in zip(raw, parents)]
    q, lens = pad_batch(conv)
    pv = np.array(parents, np.int32)
    base, ov0 = seed_batch.collect_intv_batch(fmpair, q, lens, pv, opt)
    rng = np.random.default_rng(5)
    n = int(idx.dau.seq_len)
    ranks = rng.integers(1, n, 64).astype(np.int64)
    which = rng.integers(0, 2, 64).astype(np.int32)
    sa0 = seed_batch.sa_batch_np(fmpair, which, ranks)
    monkeypatch.setenv("BISCUIT_TPU_SPLIT_TAB", "1")
    got, ov1 = seed_batch.collect_intv_batch(fmpair, q, lens, pv, opt)
    sa1 = seed_batch.sa_batch_np(fmpair, which, ranks)
    assert not ov0.any() and not ov1.any()
    assert got == base
    assert (sa0 == sa1).all()
