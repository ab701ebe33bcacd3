"""Device-engine align parity: identical SAM vs the host engine (CPU backend
stands in for the TPU; kernels are identical code paths)."""
import numpy as np
import pytest

from biscuit_tpu.config import MemOpt, MEM_F_PE, MEM_F_NO_MULTI
from biscuit_tpu.index.build import build_index
from biscuit_tpu.align.pipeline import AlignerState, process_seqs
from biscuit_tpu.align.device_engine import DeviceAligner, process_seqs_device
from biscuit_tpu.io.fastq import fastq_iter, read_batch


@pytest.fixture(scope="module")
def setup(small_dataset):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    return idx, small_dataset


def _load(path, n, paired=False):
    it2 = None
    return read_batch(fastq_iter(str(path)), it2, 1 << 60)[:n]


def test_se_device_matches_host(setup):
    idx, d = setup
    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI
    st = AlignerState(idx)
    host_seqs = _load(d / "reads.fq", 60)
    dev_seqs = _load(d / "reads.fq", 60)
    process_seqs(opt, st, host_seqs, 0)
    opt2 = MemOpt()
    opt2.flag |= MEM_F_NO_MULTI
    process_seqs_device(opt2, st, dev_seqs, 0)
    for h, v in zip(host_seqs, dev_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\ndev : {v.sam}"


def test_pe_device_matches_host(small_dataset, tmp_path_factory, oracle):
    import subprocess
    import sys
    from conftest import REPO
    d = tmp_path_factory.mktemp("pedev")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "50000", "--n-reads", "120", "--pe", "--seed", "17"],
        check=True, capture_output=True)
    idx = build_index(str(d / "genome.fa"))
    st = AlignerState(idx)

    def load_pe():
        it1 = fastq_iter(str(d / "reads_1.fq"))
        it2 = fastq_iter(str(d / "reads_2.fq"))
        return read_batch(it1, it2, 1 << 60)

    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI | MEM_F_PE
    host_seqs = load_pe()
    process_seqs(opt, st, host_seqs, 0)
    opt2 = MemOpt()
    opt2.flag |= MEM_F_NO_MULTI | MEM_F_PE
    dev_seqs = load_pe()
    process_seqs_device(opt2, st, dev_seqs, 0)
    for h, v in zip(host_seqs, dev_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\ndev : {v.sam}"


def test_matesw_batch_matches_sequential(tmp_path_factory):
    """matesw_batch (one device dispatch + host replay) must leave region
    lists identical to the sequential per-pair matesw loop — including the
    order-dependent skip checks and dedup insertions."""
    import copy
    import subprocess
    import sys

    from conftest import REPO
    from biscuit_tpu.align.pair import pestat
    from biscuit_tpu.align.region import matesw, matesw_batch

    d = tmp_path_factory.mktemp("msw")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "60000", "--n-reads", "240", "--pe", "--seed", "23",
         "--snp-rate", "0.02"],
        check=True, capture_output=True)
    idx = build_index(str(d / "genome.fa"))
    st = AlignerState(idx)
    seqs = read_batch(fastq_iter(str(d / "reads_1.fq")),
                      fastq_iter(str(d / "reads_2.fq")), 1 << 60)
    # force rescues: periodic mismatches in every 3rd mate-2 destroy its
    # seeds (no exact >=19-mer survives) while SW can still align it near
    # its mate — exactly the situation matesw exists for
    for i in range(1, len(seqs), 6):
        s = seqs[i]
        mut = s.seq.copy()
        mut[::9] = (mut[::9] + 1) % 4
        s.seq = mut
        s.seq0 = mut
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    dev = DeviceAligner(st)
    regs = dev.regs_for_batch(opt, seqs)
    pes = pestat(opt, st.idx, regs)
    n_pairs = len(seqs) >> 1
    regs_a = copy.deepcopy(regs)
    regs_b = copy.deepcopy(regs)
    for i in range(n_pairs):
        matesw(opt, st.idx, pes, (seqs[i << 1], seqs[(i << 1) | 1]),
               (regs_a[i << 1], regs_a[(i << 1) | 1]))
    pairs = [((seqs[i << 1], seqs[(i << 1) | 1]),
              (regs_b[i << 1], regs_b[(i << 1) | 1]))
             for i in range(n_pairs)]
    matesw_batch(opt, st.idx, pes, pairs, dev.sw_local_batch_fn(opt))
    n_rescued = 0
    for i in range(len(seqs)):
        la, lb = regs_a[i], regs_b[i]
        assert len(la) == len(lb), f"read {i}: {len(la)} vs {len(lb)} regions"
        if len(la) != len(regs[i]):
            n_rescued += 1
        for a, b in zip(la, lb):
            for f in ("rb", "re", "qb", "qe", "rid", "score", "truesc",
                      "csub", "sub", "seedcov", "secondary", "bss", "parent"):
                assert getattr(a, f) == getattr(b, f), f"read {i} field {f}"
    assert n_rescued > 0, "dataset produced no rescues; strengthen the setup"


def test_chain_scan_matches_host(small_dataset):
    """mem_chain_batch (device lockstep tree scan + log replay) must yield
    Chain lists identical to the sequential host mem_chain for every lane:
    same chains, order, seed lists, extras, rid/is_alt/frac_rep."""
    from biscuit_tpu.align.chain import mem_chain, mem_chain_batch
    from biscuit_tpu.align.pipeline import bsconvert
    from biscuit_tpu.align.device_engine import DeviceAligner

    idx = build_index(str(small_dataset / "genome.fa"))
    st = AlignerState(idx)
    dev = DeviceAligner(st)
    opt = MemOpt()
    seqs = _load(small_dataset / "reads.fq", 120)
    # mutate a third of the reads so chains fragment (forces appends and
    # new-chain insertions beyond the trivial single-chain case)
    for i in range(0, len(seqs), 3):
        mut = seqs[i].seq.copy()
        mut[::23] = (mut[::23] + 2) % 4
        seqs[i].seq = mut
        seqs[i].seq0 = mut
    lanes = [(s, p) for s in seqs for p in (0, 1)]
    seeds, lookups = dev._collect_seeds(opt, lanes)
    jobs = [(s.l_seq, p, seeds[li], lookups[li])
            for li, (s, p) in enumerate(lanes)]
    got = mem_chain_batch(opt, idx, jobs)
    n_dev = 0
    for li, (s, p) in enumerate(lanes):
        fm, fmc = st.fm_pair(p)
        want = mem_chain(opt, fm, fmc, idx, s.l_seq, bsconvert(s, p), p,
                         seeds_intv=seeds[li], sa_lookup=lookups[li])
        if got[li] is None:
            continue  # capacity fallback lane: host path runs anyway
        n_dev += 1
        assert len(got[li]) == len(want), (li, len(got[li]), len(want))
        for cg, cw in zip(got[li], want):
            assert (cg.pos, cg.rid, cg.is_alt) == (cw.pos, cw.rid, cw.is_alt)
            assert cg.frac_rep == cw.frac_rep
            assert cg.seeds == cw.seeds, (li, cg.seeds, cw.seeds)
            assert cg.seeds_extra == cw.seeds_extra
    assert n_dev >= len(lanes) * 0.9  # the device path must carry the batch
