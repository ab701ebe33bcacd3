"""Native C++ worker1 engine parity: identical SAM vs the Python host engine
and the reference oracle."""
import numpy as np
import pytest

from biscuit_tpu.config import MemOpt, MEM_F_PE, MEM_F_NO_MULTI
from biscuit_tpu.index.build import build_index
from biscuit_tpu.align.pipeline import AlignerState, process_seqs
from biscuit_tpu.align.native_engine import NativeAligner, process_seqs_native
from biscuit_tpu.io.fastq import fastq_iter, read_batch


@pytest.fixture(scope="module")
def setup(small_dataset):
    idx = build_index(str(small_dataset / "genome.fa"))
    return idx, small_dataset


def test_se_native_matches_host(setup):
    idx, d = setup
    st = AlignerState(idx)
    host_seqs = read_batch(fastq_iter(str(d / "reads.fq")), None, 1 << 60)
    nat_seqs = read_batch(fastq_iter(str(d / "reads.fq")), None, 1 << 60)
    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI
    process_seqs(opt, st, host_seqs, 0)
    opt2 = MemOpt()
    opt2.flag |= MEM_F_NO_MULTI
    process_seqs_native(opt2, st, nat_seqs, 0)
    for h, v in zip(host_seqs, nat_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\nnat : {v.sam}"


def test_pe_native_matches_host(tmp_path_factory, oracle):
    import subprocess
    import sys
    from conftest import REPO
    d = tmp_path_factory.mktemp("penat")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "60000", "--n-reads", "300", "--pe", "--seed", "23"],
        check=True, capture_output=True)
    idx = build_index(str(d / "genome.fa"))
    st = AlignerState(idx)

    def load():
        return read_batch(fastq_iter(str(d / "reads_1.fq")),
                          fastq_iter(str(d / "reads_2.fq")), 1 << 60)

    for bmode in (0, 1):
        opt = MemOpt()
        opt.flag |= MEM_F_NO_MULTI | MEM_F_PE
        opt.parent = bmode
        host_seqs = load()
        process_seqs(opt, st, host_seqs, 0)
        opt2 = MemOpt()
        opt2.flag |= MEM_F_NO_MULTI | MEM_F_PE
        opt2.parent = bmode
        nat_seqs = load()
        process_seqs_native(opt2, st, nat_seqs, 0)
        for h, v in zip(host_seqs, nat_seqs):
            assert h.sam == v.sam, f"-b {bmode} {h.name}\nhost: {h.sam}\nnat : {v.sam}"


def test_native_threads_deterministic(setup):
    idx, d = setup
    st = AlignerState(idx)
    nat = NativeAligner(st)
    opt = MemOpt()
    seqs1 = read_batch(fastq_iter(str(d / "reads.fq")), None, 1 << 60)
    seqs4 = read_batch(fastq_iter(str(d / "reads.fq")), None, 1 << 60)
    opt.n_threads = 1
    process_seqs_native(opt, st, seqs1, 0, engine=nat)
    opt4 = MemOpt()
    opt4.n_threads = 4
    process_seqs_native(opt4, st, seqs4, 0, engine=nat)
    for a, b in zip(seqs1, seqs4):
        assert a.sam == b.sam


def test_ilv2_cache_staleness_guard(tmp_path_factory, small_dataset):
    """A stale same-size ilv2 cache (older than its source words.npy) must be
    rebuilt, not trusted — rebuilding an index over an existing .btidx dir
    must never serve alignments from the previous genome's occ blocks."""
    import os
    import shutil
    from biscuit_tpu.index.fmindex import BisIndex

    d = tmp_path_factory.mktemp("ilv2guard")
    fa = str(d / "genome.fa")
    shutil.copy(small_dataset / "genome.fa", fa)
    idx = build_index(fa)
    idx.save_mmap(fa)
    mdir = fa + ".btidx"

    def align_all():
        st = AlignerState(BisIndex.load(fa))
        seqs = read_batch(fastq_iter(str(small_dataset / "reads.fq")),
                          None, 1 << 60)
        opt = MemOpt()
        opt.flag |= MEM_F_NO_MULTI
        process_seqs_native(opt, st, seqs, 0)
        return [s.sam for s in seqs]

    want = align_all()  # first run writes {par,dau}_ilv2.npy caches
    caches = [os.path.join(mdir, f"{t}_ilv2.npy") for t in ("par", "dau")]
    assert all(os.path.exists(c) for c in caches)

    # corrupt the cache payloads in place (same byte length) and backdate
    # them behind their source arrays — the guard must reject + rebuild
    for c in caches:
        a = np.load(c)
        np.save(c, a ^ np.uint8(0xA5))
        src = c.replace("_ilv2.npy", "_words.npy")
        os.utime(c, (os.path.getmtime(src) - 100,
                     os.path.getmtime(src) - 100))
    assert align_all() == want
    # ...and the rebuild must have refreshed the cache (now fresh + valid)
    for c in caches:
        src = c.replace("_ilv2.npy", "_words.npy")
        assert os.path.getmtime(c) >= os.path.getmtime(src)


def test_avx512_occ_vector_exhaustive(setup):
    """The AVX-512 batched single-class occ kernel (occ_cg_one_x8, the
    backward-SMEM vector path) must be bit-exact with the scalar occ_cg_one
    over EVERY rank in [0, seq_len] and every class, on both strands.
    Skips on hosts without AVX-512 VPOPCNTDQ (the build falls back to the
    scalar path there)."""
    import ctypes as Ct

    idx, _ = setup
    st = AlignerState(idx)
    nat = NativeAligner(st)
    L = nat.lib
    L.bt_occ_cg_x8.restype = Ct.c_int
    L.bt_occ_cg_scalar.restype = Ct.c_int

    checked = 0
    for fmc in (nat.dau, nat.par):
        n = int(fmc.seq_len)
        ranks_all = np.arange(0, n + 1, dtype=np.int64)
        pad = (-len(ranks_all)) % 8
        if pad:
            ranks_all = np.concatenate([ranks_all, np.zeros(pad, np.int64)])
        e8 = np.zeros(8, np.int64)
        g8 = np.zeros(8, np.int64)
        es = Ct.c_int64()
        gs = Ct.c_int64()
        for c in range(4):
            ev = np.zeros(len(ranks_all), np.int64)
            gv = np.zeros(len(ranks_all), np.int64)
            for j in range(0, len(ranks_all), 8):
                r = L.bt_occ_cg_x8(
                    Ct.byref(fmc), ranks_all[j:j + 8].ctypes.data_as(
                        Ct.POINTER(Ct.c_int64)), c,
                    e8.ctypes.data_as(Ct.POINTER(Ct.c_int64)),
                    g8.ctypes.data_as(Ct.POINTER(Ct.c_int64)))
                if not r:
                    pytest.skip("AVX-512 VPOPCNTDQ not available")
                ev[j:j + 8] = e8
                gv[j:j + 8] = g8
            for k in range(n + 1):
                assert L.bt_occ_cg_scalar(Ct.byref(fmc), int(ranks_all[k]),
                                          c, Ct.byref(es), Ct.byref(gs))
                assert es.value == ev[k] and gs.value == gv[k], \
                    f"rank {k} class {c}: vec ({ev[k]},{gv[k]}) " \
                    f"!= scalar ({es.value},{gs.value})"
                checked += 1
        # variable-class variant: random classes per lane over all ranks
        L.bt_occ_cg_x8v.restype = Ct.c_int
        rng = np.random.default_rng(7)
        cs_all = rng.integers(0, 4, len(ranks_all)).astype(np.int64)
        for j in range(0, len(ranks_all), 8):
            r = L.bt_occ_cg_x8v(
                Ct.byref(fmc),
                ranks_all[j:j + 8].ctypes.data_as(Ct.POINTER(Ct.c_int64)),
                cs_all[j:j + 8].ctypes.data_as(Ct.POINTER(Ct.c_int64)),
                e8.ctypes.data_as(Ct.POINTER(Ct.c_int64)),
                g8.ctypes.data_as(Ct.POINTER(Ct.c_int64)))
            assert r
            for t in range(min(8, n + 1 - j)):
                assert L.bt_occ_cg_scalar(Ct.byref(fmc), int(ranks_all[j + t]),
                                          int(cs_all[j + t]),
                                          Ct.byref(es), Ct.byref(gs))
                assert es.value == e8[t] and gs.value == g8[t], \
                    f"x8v rank {ranks_all[j + t]} class {cs_all[j + t]}: " \
                    f"({e8[t]},{g8[t]}) != ({es.value},{gs.value})"
                checked += 1
    assert checked > 0


def test_sw_extend_vector_row_fuzz():
    """The AVX-512 sw_extend row kernel must be bit-exact with the scalar
    row AND the Python ground truth (ops/sw.py) over random inputs under
    every scoring regime — including cheap-gap presets (ont2d O=E=1) where
    the F-chain propagates >16 columns and dominates (the round-2 carry bug
    was invisible under default scoring)."""
    import ctypes as Ct
    from biscuit_tpu import native
    from biscuit_tpu.ops.sw import sw_extend as py_sw_extend

    L = native.lib()
    L.bt_sw_extend.restype = Ct.c_int
    u8p = Ct.POINTER(Ct.c_uint8)
    i8p = Ct.POINTER(Ct.c_int8)
    i32p = Ct.POINTER(Ct.c_int32)

    def mk_mat(a, b):
        m = np.full((5, 5), -b, np.int8)
        for i in range(4):
            m[i, i] = a
        m[4, :] = -1
        m[:, 4] = -1
        return m

    # (mat, o_del, e_del, o_ins, e_ins, w, end_bonus, zdrop)
    regimes = [
        (mk_mat(1, 2), 6, 1, 6, 1, 100, 5, 100),    # biscuit default
        (mk_mat(1, 1), 1, 1, 1, 1, 100, 0, 200),    # ont2d: cheap gaps
        (mk_mat(1, 4), 2, 1, 2, 1, 100, 50, 200),   # pacbio-ish
        (mk_mat(2, 3), 5, 2, 3, 1, 25, 10, 50),     # asymmetric gaps, tight band
    ]
    rng = np.random.default_rng(11)
    vec_available = True
    checked = 0
    for mat, o_del, e_del, o_ins, e_ins, w, eb, zdrop in regimes:
        for trial in range(40):
            qlen = int(rng.integers(24, 220))
            tlen = int(rng.integers(8, 300))
            # correlated sequences so extensions survive: mutate a copy
            base = rng.integers(0, 4, max(qlen, tlen)).astype(np.uint8)
            q = base[:qlen].copy()
            t = base[:tlen].copy()
            nmut = int(rng.integers(0, 1 + tlen // 4))
            pos = rng.integers(0, tlen, nmut)
            t[pos] = rng.integers(0, 4, nmut).astype(np.uint8)
            h0 = int(rng.integers(1, 80))
            out_s = np.zeros(6, np.int32)
            out_v = np.zeros(6, np.int32)
            args = (q.ctypes.data_as(u8p), qlen, t.ctypes.data_as(u8p), tlen,
                    mat.ctypes.data_as(i8p), o_del, e_del, o_ins, e_ins,
                    w, eb, zdrop, h0)
            L.bt_sw_extend(*args, 0, out_s.ctypes.data_as(i32p))
            r = L.bt_sw_extend(*args, 1, out_v.ctypes.data_as(i32p))
            if not r:
                vec_available = False
                break
            assert (out_s == out_v).all(), \
                f"vec != scalar: {out_v} vs {out_s} (regime o={o_ins} " \
                f"e={e_ins}, qlen={qlen} tlen={tlen} h0={h0} trial={trial})"
            py = py_sw_extend(q, t, mat.astype(np.int64), o_del, e_del,
                              o_ins, e_ins, w, eb, zdrop, h0)
            assert tuple(int(x) for x in out_s) == tuple(int(x) for x in py)
            checked += 1
        if not vec_available:
            pytest.skip("AVX-512 sw row kernel not in this build")
    assert checked > 0
