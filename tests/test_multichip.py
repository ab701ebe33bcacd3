"""Multi-chip sharded execution on the 8-device CPU mesh: the sharded device
step must match single-device results exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from biscuit_tpu.config import MemOpt
from biscuit_tpu.index.build import build_index
from biscuit_tpu.ops.seed_batch import FMPair
from biscuit_tpu.ops.seed_parallel import forward_extend_all
from biscuit_tpu.parallel.mesh import (make_mesh, sharded_pileup_counts_fn,
                                       sharded_seed_fn)


@pytest.fixture(scope="module")
def setup(small_dataset):
    idx = build_index(str(small_dataset / "genome.fa"))
    return idx, FMPair.from_index(idx)


def test_sharded_seeding_matches_single(setup):
    idx, fm = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    B, L = 32, 64
    rng = np.random.default_rng(5)
    q = np.zeros((B, L), np.int32)
    for b in range(B):
        p = int(rng.integers(0, idx.l_pac - L))
        frag = idx.pac[p:p + L].astype(np.int32)
        q[b] = np.where(frag == 1, 3, frag)
    lens = np.full(B, L, np.int32)
    parents = np.ones(B, np.int32)

    fn = sharded_seed_fn(mesh, fm, L, 19, 20)
    sh2 = NamedSharding(mesh, P("dp", None))
    sh1 = NamedSharding(mesh, P("dp"))
    packed = np.asarray(fn(jax.device_put(jnp.asarray(q), sh2),
                           jax.device_put(jnp.asarray(lens), sh1),
                           jax.device_put(jnp.asarray(parents), sh1)))

    starts = np.tile(np.arange(L, dtype=np.int32), B)
    read_of = np.repeat(np.arange(B, dtype=np.int32), L)
    single = np.asarray(forward_extend_all(
        fm, jnp.asarray(q), jnp.asarray(lens), jnp.asarray(parents),
        jnp.asarray(starts), jnp.asarray(read_of),
        jnp.ones((B * L,), jnp.int32), 19, 20, max_iters=L + 2))
    np.testing.assert_array_equal(packed, single)


def test_sharded_pileup_count_merge(setup):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    W = 64
    N = 32 * 8
    rng = np.random.default_rng(6)
    pos = rng.integers(0, W, N).astype(np.int32)
    stat = rng.integers(0, 32, N).astype(np.int32)
    valid = np.ones(N, bool)
    fn = sharded_pileup_counts_fn(mesh, W)
    sh = NamedSharding(mesh, P("dp"))
    counts = np.asarray(fn(jax.device_put(jnp.asarray(pos), sh),
                           jax.device_put(jnp.asarray(stat), sh),
                           jax.device_put(jnp.asarray(valid), sh)))
    # equals a host histogram over all shards
    want = np.zeros((W, 32), np.int64)
    for p, s in zip(pos, stat):
        want[p, s] += 1
    np.testing.assert_array_equal(counts, want)


def test_compiled_collectives():
    """The sharded pileup merge must compile to a real cross-device
    all-reduce (psum over the dp axis), and the seed/extend programs must
    partition over all devices — the ICI-collective design of SURVEY.md
    §2d, checked on the 8-device CPU mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from biscuit_tpu.parallel.mesh import make_mesh, shard_map

    mesh = make_mesh(8)

    def local_counts(pos, stat, valid):
        counts = jnp.zeros((64, 4), jnp.int32)
        counts = counts.at[pos % 64, stat % 4].add(
            jnp.where(valid, 1, 0))
        return jax.lax.psum(counts, "dp")

    fn = shard_map(local_counts, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp")),
                   out_specs=P())
    args = (jnp.arange(64, dtype=jnp.int32),
            jnp.arange(64, dtype=jnp.int32) % 4,
            jnp.ones(64, jnp.bool_))
    lowered = jax.jit(fn).lower(*args)
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo, "psum must lower to an all-reduce collective"
    out = np.asarray(jax.jit(fn)(*args))
    assert out.sum() == 64  # every shard's contribution merged


def test_pileup_device_counts_match_numpy():
    """BISCUIT_TPU_PILEUP=device routes the window count matrices through the
    accelerator scatter-add kernel; output must stay byte-identical."""
    import os
    import subprocess
    import sys

    from conftest import REPO

    d = "/tmp/_plp_devtest"
    if not os.path.isdir(d):
        os.makedirs(d)
        subprocess.run([sys.executable, f"{REPO}/tools/make_testdata.py", d,
                        "--genome-size", "30000", "--n-reads", "200",
                        "--seed", "13"], check=True, capture_output=True)
        fa = os.path.join(d, "genome.fa")
        run = lambda a: subprocess.run(
            [sys.executable, "-m", "biscuit_tpu.cli"] + a, check=True,
            capture_output=True, text=True, cwd=REPO).stdout
        run(["index", fa])
        sam = run(["align", fa, os.path.join(d, "reads.fq")])
        open(os.path.join(d, "aln.sam"), "w").write(sam)
        run(["sort", "-o", os.path.join(d, "aln.bam"),
             os.path.join(d, "aln.sam")])
    fa = os.path.join(d, "genome.fa")

    def pl(mode):
        # hermetic: the device-counts kernel path is identical code on the
        # CPU backend, and the real-TPU tunnel on this rig can wedge
        env = dict(os.environ, BISCUIT_TPU_PILEUP=mode,
                   BISCUIT_TPU_PLATFORM="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "biscuit_tpu.cli", "pileup", "-@", "1",
             fa, os.path.join(d, "aln.bam")],
            capture_output=True, text=True, cwd=REPO, env=env)
        assert r.returncode == 0, r.stderr[-800:]
        return [l for l in r.stdout.splitlines()
                if not l.startswith("##program")]

    assert pl("device") == pl("numpy")


def test_pileup_mesh_cli_vcf_matches_single():
    """BISCUIT_TPU_PILEUP=mesh runs the pileup CLI with datum arrays sharded
    over every visible device and psum-merged counts; the VCF through an
    8-device mesh must be byte-identical to the single-device numpy path
    (reference window-merge semantics, pileup.c:1153-1204)."""
    import os
    import subprocess
    import sys

    from conftest import REPO

    # reuse (or build) the dataset of the device-counts test above
    d = "/tmp/_plp_devtest"
    if not os.path.isdir(d):
        test_pileup_device_counts_match_numpy()
    fa = os.path.join(d, "genome.fa")

    def pl(mode, ndev):
        env = dict(os.environ, BISCUIT_TPU_PILEUP=mode,
                   BISCUIT_TPU_PLATFORM="cpu",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
        r = subprocess.run(
            [sys.executable, "-m", "biscuit_tpu.cli", "pileup", "-@", "1",
             fa, os.path.join(d, "aln.bam")],
            capture_output=True, text=True, cwd=REPO, env=env)
        assert r.returncode == 0, r.stderr[-800:]
        return [l for l in r.stdout.splitlines()
                if not l.startswith("##program")]

    sharded = pl("mesh", 8)
    single = pl("numpy", 1)
    assert len(sharded) > 100
    assert sharded == single


def test_sharded_log_seeder_matches_single(setup):
    """The PRODUCTION default seeder (BISCUIT_TPU_SEEDER=log, the smem4
    log machine) under shard_map over dp: per-shard packed seed streams
    must be bit-identical to the single-device machine on each pool
    slice."""
    from biscuit_tpu.ops.seed_batch import _collect_sm_log
    from biscuit_tpu.parallel.mesh import make_mesh, sharded_log_seed_fn

    idx, fm = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    args = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
            int(opt.split_width))
    rng = np.random.default_rng(21)
    N, L = 64, 96
    pool = np.full((N, L + 2), 4, np.int32)
    for b in range(N):
        p = int(rng.integers(0, idx.l_pac - L))
        frag = idx.pac[p:p + L].astype(np.int32)
        r = np.where(frag == 1, 3, frag)
        ne = rng.binomial(L, 0.02)
        r[rng.integers(0, L, ne)] = rng.integers(0, 5, ne)
        pool[b, :L] = r
        pool[b, L] = L
        pool[b, L + 1] = b % 2

    mesh = make_mesh(8)
    fn = sharded_log_seed_fn(mesh, fm, *args, lanes=8, C=32, T2=16,
                             LOG_LEN=4096, W=32)
    packed, rid, ov, unf = [np.asarray(x) for x in fn(jnp.asarray(pool))]
    N_l = N // 8
    cap = N_l * 24
    for s in range(8):
        pr, rr, tr, *_rest = _collect_sm_log(
            fm, jnp.asarray(pool[s * N_l:(s + 1) * N_l]), *args,
            8, 32, 16, 4096, 32)
        t = int(tr)
        assert (np.asarray(rr)[:t] == rid[s * cap:s * cap + t]).all()
        assert (np.asarray(pr)[:t] == packed[s * cap:s * cap + t]).all()
    assert (ov < 0).all() and (unf < 0).all()


def test_sharded_chain_matches_single():
    """Device chaining (ops/chain_batch — the round-4 production stage)
    under shard_map over dp: action logs bit-identical to single-device."""
    from biscuit_tpu.ops.chain_batch import chain_scan_batch
    from biscuit_tpu.parallel.mesh import make_mesh, sharded_chain_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(23)
    J, B = 48, 32
    l_pac = 30000
    qbeg = rng.integers(0, 80, (J, B)).astype(np.int32)
    slen = rng.integers(19, 40, (J, B)).astype(np.int32)
    rbeg = rng.integers(0, 2 * l_pac - 64, (J, B)).astype(np.int32)
    valid = (rng.random((J, B)) < 0.9).astype(np.int32)
    rid = rng.integers(0, 2, (J, B)).astype(np.int32)
    # occurrence index within its seed: runs of 0..len-1 per lane
    kk = np.zeros((J, B), np.int32)
    for b in range(B):
        j = 0
        while j < J:
            run = int(rng.integers(1, 6))
            for t in range(min(run, J - j)):
                kk[j + t, b] = t
            j += run
    n_occ = rng.integers(0, J + 1, B).astype(np.int32)

    opt = MemOpt()
    args = [jnp.asarray(a) for a in
            (qbeg, slen, rbeg, valid, rid, kk, n_occ)]
    log1, ov1 = chain_scan_batch(*args, jnp.int32(l_pac), int(opt.w),
                                 int(opt.max_chain_gap), 500, NC=16)
    mesh = make_mesh(8)
    fn = sharded_chain_fn(mesh, int(opt.w), int(opt.max_chain_gap), 500,
                          NC=16)
    log8, ov8 = fn(*args, jnp.int32(l_pac))
    np.testing.assert_array_equal(np.asarray(log8), np.asarray(log1))
    np.testing.assert_array_equal(np.asarray(ov8), np.asarray(ov1))


def test_sharded_rescue_matches_single():
    """Batched mate rescue (ops/sw_local — the round-4 production stage)
    under shard_map over dp: kernel outputs bit-identical to
    single-device."""
    from biscuit_tpu.ops.sw_local import sw_local_kernel
    from biscuit_tpu.parallel.mesh import make_mesh, sharded_rescue_fn

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(29)
    B, Lq, Lt = 32, 96, 160
    q = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    qlens = rng.integers(20, Lq + 1, B).astype(np.int32)
    q[np.arange(Lq)[None, :] >= qlens[:, None]] = 4
    t = rng.integers(0, 4, (B, Lt)).astype(np.int32)
    tlens = rng.integers(30, Lt + 1, B).astype(np.int32)
    mats = np.zeros((2, 5, 5), np.int32)
    mats[:, :4, :4] = -2
    for i in range(4):
        mats[:, i, i] = 1
    mats[1, 0, 1] = 1
    matsel = rng.integers(0, 2, B).astype(np.int32)
    minsc = np.full(B, 20, np.int32)
    endsc = np.full(B, 0xFFFF, np.int32)
    u8 = rng.integers(0, 2, B).astype(np.int32)

    args = [jnp.asarray(a) for a in
            (q, qlens, t, tlens, mats, matsel, minsc, endsc, u8)]
    one = sw_local_kernel(*args[:6], 6, 1, 6, 1, *args[6:])
    mesh = make_mesh(8)
    eight = sharded_rescue_fn(mesh, 6, 1, 6, 1)(*args)
    for key in one:
        np.testing.assert_array_equal(np.asarray(eight[key]),
                                      np.asarray(one[key]), err_msg=key)


def test_sharded_pool_seeder_matches_single(setup):
    """The production lane-refill seeder under shard_map: per-read seed
    sets from the 8-way sharded pools equal the single-device machine's."""
    from biscuit_tpu.parallel.mesh import make_mesh, sharded_pool_seed_fn
    from biscuit_tpu.ops.seed_batch import smem3_pool_batch

    idx, fm = setup
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    rng = np.random.default_rng(11)
    N, L = 64, 96
    pool = np.full((N, L + 2), 4, np.int32)
    for b in range(N):
        p = int(rng.integers(0, idx.l_pac - L))
        frag = idx.pac[p:p + L].astype(np.int32)
        r = np.where(frag == 1, 3, frag)
        ne = rng.binomial(L, 0.02)
        r[rng.integers(0, L, ne)] = rng.integers(0, 5, ne)
        pool[b, :L] = r
        pool[b, L] = L
        pool[b, L + 1] = 1

    def per_read(seeds, n_seeds, rid_off):
        got = {}
        s = np.asarray(seeds)
        ns = np.asarray(n_seeds)
        for lane in range(s.shape[0]):
            for k in range(int(ns[lane])):
                row = s[lane, k]
                rid = int(row[5]) + rid_off
                got.setdefault(rid, []).append(tuple(int(v) for v in row[:5]))
        return got

    args = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
            int(opt.split_width))
    want_out = smem3_pool_batch(fm, jnp.asarray(pool), *args,
                                lanes=16, C=32, S=64)
    want = per_read(want_out[0], want_out[1], 0)

    mesh = make_mesh(8)
    fn = sharded_pool_seed_fn(mesh, fm, *args, lanes=16)
    seeds, n_seeds, ov_rd = fn(jnp.asarray(pool))
    shard_n = N // 8
    got = {}
    s = np.asarray(seeds)
    ns = np.asarray(n_seeds)
    lanes_per = s.shape[0] // 8
    for sh in range(8):
        got.update(per_read(s[sh * lanes_per:(sh + 1) * lanes_per],
                            ns[sh * lanes_per:(sh + 1) * lanes_per],
                            sh * shard_n))
    assert (np.asarray(ov_rd) < 0).all()   # no overflowed reads
    assert got == want
