"""FM-index sharded across the device mesh (SURVEY §2d "replicate (or
shard, for big genomes) both converted indexes in HBM").

The fused occ+BWT tables and SA samples partition over the `idx` mesh axis
(each device holds 1/n_idx of both strands' rows); occ4/invPsi/SA gathers
route to the owning shard (local gather + masked-zero + psum). Reference
residency semantics: bwt_t bwt[2] in host RAM (/root/reference/lib/aln/
bwa.h:42-50) — the TPU-native answer to a genome whose tables exceed one
chip's HBM. Every test asserts BIT-IDENTITY to the replicated-index
machines on the 8-device CPU mesh, narrow and wide layouts both.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biscuit_tpu.config import MemOpt
from biscuit_tpu.index.build import build_index
from biscuit_tpu.ops import seed_batch
from biscuit_tpu.parallel.mesh import (make_mesh2, sharded_index_sa_fn,
                                       sharded_index_seed_fn)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup(small_dataset):
    idx = build_index(str(small_dataset / "genome.fa"))
    return idx, seed_batch.FMPair.from_index(idx)


@pytest.fixture(scope="module")
def wide_setup(small_dataset, monkeypatch_module):
    monkeypatch_module.setenv("BISCUIT_TPU_WIDE_INDEX", "1")
    idx = build_index(str(small_dataset / "genome.fa"))
    fm = seed_batch.FMPair.from_index(idx)
    assert fm.wide and fm.tab.shape[-1] == 12
    return idx, fm


def _mk_pool(idx, N, L, seed=11, err=0.02):
    rng = np.random.default_rng(seed)
    pool = np.full((N, L + 2), 4, np.int32)
    for b in range(N):
        p = int(rng.integers(0, idx.l_pac - L))
        frag = idx.pac[p:p + L].astype(np.int32)
        r = np.where(frag == 1, 3, frag)
        ne = rng.binomial(L, err)
        r[rng.integers(0, L, ne)] = rng.integers(0, 5, ne)
        pool[b, :L] = r
        pool[b, L] = L
        pool[b, L + 1] = b % 2
    return pool


def _seed_args(opt):
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    return (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
            int(opt.split_width))


@pytest.mark.parametrize("n_dp,n_idx", [(1, 8), (2, 4)])
def test_sharded_index_pool_seeder_bit_identical(setup, n_dp, n_idx):
    """Pool seeder against idx-sharded tables == replicated tables, per
    dp shard, bit for bit (packed rows AND read-id stream)."""
    idx, fm = setup
    opt = MemOpt()
    args = _seed_args(opt)
    N, L = 32, 96
    pool = _mk_pool(idx, N, L)
    mesh = make_mesh2(n_dp, n_idx)
    fn = sharded_index_seed_fn(mesh, fm, *args, seeder="pool",
                               lanes=16, C=32, S=64, T2=16)
    packed, rid, ov = [np.asarray(x) for x in fn(pool)]

    N_l = N // n_dp
    cap = N_l * 24
    for s in range(n_dp):
        pr, rr, tr, *_ = seed_batch._collect_sm_pool(
            fm, jnp.asarray(pool[s * N_l:(s + 1) * N_l]), *args,
            16, 32, 64, 16)
        t = int(tr)
        assert (np.asarray(rr)[:t] == rid[s * cap:s * cap + t]).all()
        assert (np.asarray(pr)[:t] == packed[s * cap:s * cap + t]).all()
    assert (ov < 0).all()


def test_sharded_index_log_seeder_bit_identical(setup):
    """The PRODUCTION (log) seeder against idx-sharded tables == the
    replicated log machine, per dp shard."""
    idx, fm = setup
    opt = MemOpt()
    args = _seed_args(opt)
    N, L = 32, 96
    pool = _mk_pool(idx, N, L, seed=12)
    mesh = make_mesh2(2, 4)
    fn = sharded_index_seed_fn(mesh, fm, *args, seeder="log",
                               lanes=16, C=32, T2=16, LOG_LEN=4096, W=64)
    packed, rid, ov, unf, nctr, spill = [np.asarray(x) for x in fn(pool)]
    assert (nctr == N // 2).all() and (spill == 0).all()

    N_l = N // 2
    cap = N_l * 24
    for s in range(2):
        pr, rr, tr, ovr, _sp, _nc, unfr = seed_batch._collect_sm_log(
            fm, jnp.asarray(pool[s * N_l:(s + 1) * N_l]), *args,
            16, 32, 16, 4096, 64)
        t = int(tr)
        assert (np.asarray(rr)[:t] == rid[s * cap:s * cap + t]).all()
        assert (np.asarray(pr)[:t] == packed[s * cap:s * cap + t]).all()
        assert (np.asarray(unfr) == unf[s * 16:(s + 1) * 16]).all()
    assert (ov < 0).all() and (unf < 0).all()


@pytest.mark.parametrize("n_dp,n_idx", [(1, 8), (2, 4)])
def test_sharded_index_sa_walk_bit_identical(setup, n_dp, n_idx):
    """Batched SA resolution against idx-sharded samples+tables == the
    replicated walk for random ranks on both strands."""
    idx, fm = setup
    n = int(idx.dau.seq_len)
    rng = np.random.default_rng(7)
    M = 128
    ranks = rng.integers(1, n, M).astype(np.int32)
    which = rng.integers(0, 2, M).astype(np.int32)
    mesh = make_mesh2(n_dp, n_idx)
    got = np.asarray(sharded_index_sa_fn(mesh, fm)(which, ranks))
    want = seed_batch.sa_batch_np(fm, which, ranks)
    assert (got == want).all()


def test_sharded_index_wide_pool_and_sa(wide_setup):
    """The wide (int64 rank, split-count row) layout — the human-scale
    regime the sharding exists for — through the same sharded paths."""
    idx, fm = wide_setup
    opt = MemOpt()
    args = _seed_args(opt)
    N, L = 16, 96
    pool = _mk_pool(idx, N, L, seed=13)
    mesh = make_mesh2(2, 4)
    fn = sharded_index_seed_fn(mesh, fm, *args, seeder="pool",
                               lanes=8, C=32, S=64, T2=16)
    packed, rid, ov = [np.asarray(x) for x in fn(pool)]
    N_l = N // 2
    cap = N_l * 24
    with seed_batch._rank_ctx(fm):
        for s in range(2):
            pr, rr, tr, *_ = seed_batch._collect_sm_pool(
                fm, jnp.asarray(pool[s * N_l:(s + 1) * N_l]), *args,
                8, 32, 64, 16)
            t = int(tr)
            assert (np.asarray(rr)[:t] == rid[s * cap:s * cap + t]).all()
            assert (np.asarray(pr)[:t] == packed[s * cap:s * cap + t]).all()
    assert (ov < 0).all()

    n = int(idx.dau.seq_len)
    rng = np.random.default_rng(9)
    ranks = rng.integers(1, n, 64).astype(np.int64)
    which = rng.integers(0, 2, 64).astype(np.int32)
    got = np.asarray(sharded_index_sa_fn(mesh, fm)(which, ranks))
    want = seed_batch.sa_batch_np(fm, which, ranks)
    assert (got == want).all()


def test_index_shard_env_routes_production_seeder(setup, monkeypatch):
    """BISCUIT_TPU_INDEX_SHARD=4: the PRODUCTION flat-seed API
    (collect_intv_flat_sm, what DeviceSeeder injects from) routes through
    the idx-sharded mesh and returns the identical (lane_of, rows,
    overflow) stream as the replicated log machine."""
    idx, fm = setup
    opt = MemOpt()
    rng = np.random.default_rng(41)
    B, L = 37, 96          # deliberately not divisible by n_dp
    q = np.full((B, L), 4, np.int32)
    lens = np.full(B, L, np.int32)
    parents = (np.arange(B) % 2).astype(np.int32)
    for b in range(B):
        p = int(rng.integers(0, idx.l_pac - L))
        frag = idx.pac[p:p + L].astype(np.int32)
        q[b] = np.where(frag == 1, 3, frag) if parents[b] else \
            np.where(frag == 2, 0, frag)
    base = seed_batch.collect_intv_flat_sm(fm, q, lens, parents, opt)
    monkeypatch.setenv("BISCUIT_TPU_INDEX_SHARD", "4")
    got = seed_batch.collect_intv_flat_sm(fm, q, lens, parents, opt)
    assert not base[2].any() and not got[2].any()
    assert (got[0] == base[0]).all()
    assert (got[1] == base[1]).all()


def test_index_shard_hybrid_cli_sam_identical(small_dataset, monkeypatch):
    """End-to-end: the hybrid engine with the index sharded over the
    8-device CPU mesh emits byte-identical SAM."""
    import subprocess
    import sys
    from conftest import REPO
    fa = str(small_dataset / "genome.fa")
    fq = str(small_dataset / "reads.fq")

    def run(extra_env):
        env = dict(os.environ, BISCUIT_TPU_PLATFORM="cpu", **extra_env)
        r = subprocess.run(
            [sys.executable, "-m", "biscuit_tpu.cli", "align", fa, fq],
            capture_output=True, text=True, cwd=REPO, env=env)
        assert r.returncode == 0, r.stderr[-800:]
        return [l for l in r.stdout.splitlines() if not l.startswith("@")]

    plain = run({"BISCUIT_TPU_ENGINE": "device"})
    sharded = run({"BISCUIT_TPU_ENGINE": "device",
                   "BISCUIT_TPU_INDEX_SHARD": "4"})
    assert len(plain) > 100
    assert sharded == plain


def test_sharded_index_occ4_lowers_to_allreduce(setup):
    """The shard-routing must be a REAL cross-device collective: occ4
    against an idx-sharded table lowers to an all-reduce over the idx
    axis (the ICI collective of SURVEY §2d), and the gather operand is
    the 1/n_idx local shard, not the full table."""
    from jax.sharding import PartitionSpec as P
    from biscuit_tpu.ops.seed_batch import (FMPair, fm_shard_arrays,
                                            occ4_sel)
    from biscuit_tpu.parallel.mesh import make_mesh2, shard_map

    idx, fm = setup
    mesh = make_mesh2(1, 8)
    tab_flat, sa_flat, n64, n_sa = fm_shard_arrays(fm, 8)

    def local(tab_l, sa_l, k):
        fml = FMPair(tab=tab_l, L2=fm.L2, primary=fm.primary,
                     seq_len=fm.seq_len, sa_samples=sa_l, wide=fm.wide,
                     sa_intv=fm.sa_intv, shard_axis="idx",
                     n64_global=n64, n_sa_global=n_sa)
        return occ4_sel(fml, jnp.zeros_like(k), k)

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P("idx", None), P("idx"), P()),
                           out_specs=P()))
    k = jnp.arange(1, 65, dtype=jnp.int32)
    hlo = fn.lower(jnp.asarray(tab_flat), jnp.asarray(sa_flat),
                   k).compile().as_text()
    assert "all-reduce" in hlo, \
        "sharded occ4 must lower to a cross-device all-reduce"
    # and it computes the right thing
    got = np.asarray(fn(jnp.asarray(tab_flat), jnp.asarray(sa_flat), k))
    want = np.asarray(occ4_sel(fm, jnp.zeros_like(k), k))
    np.testing.assert_array_equal(got, want)


def test_sharded_index_hbm_budget_scales():
    """The capacity arithmetic the sharding buys: per-device bytes of the
    idx-sharded human-scale tables must fit a v5e (16 GB) for concrete N
    — the numbers documented in docs/SCALING.md."""
    # 3.1 Gbp genome -> 6.2 G-char strands, wide rows (48 B / 64 chars),
    # int64 SA samples at intv 16
    strand = 6_200_000_000
    tab_bytes = 2 * (strand // 64) * 48
    sa_bytes = 2 * (strand // 16) * 8
    total = tab_bytes + sa_bytes        # 15.5 GB of tables alone
    # one v5e: 16 GB HBM minus runtime buffers + the seeder's working set
    # (pool/log/planes ~1 GB at production lanes) — tables alone consume
    # >96% of the chip; the machine cannot run (the r4 gap)
    assert total > 0.96 * 16e9
    for n in (2, 4, 8):
        per_dev = total / n
        assert per_dev + 1e9 < 16e9     # fits with working-set headroom
    assert total / 2 < 0.55 * 16e9      # n_idx=2 leaves ~45% of each chip
