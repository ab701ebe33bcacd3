"""Hybrid (TPU-seeded) engine parity: device seed injection into the C++
chain/extend/SAM stages must leave SAM output byte-identical to the pure
host path. CPU backend stands in for the TPU; the kernels are the same code.

Covers VERDICT item 3: the production device engine has no per-read Python
loops — seeding + SA prefetch run as batched device kernels
(ops/seed_parallel.seed_collect_device, ops/seed_batch.sa_batch) and the
branchy stages stay in native code (align_host.cpp SeedInj)."""
import numpy as np
import pytest

from biscuit_tpu.config import MemOpt, MEM_F_PE, MEM_F_NO_MULTI
from biscuit_tpu.index.build import build_index
from biscuit_tpu.align.pipeline import AlignerState, process_seqs
from biscuit_tpu.align.device_engine import DeviceSeeder, process_seqs_hybrid
from biscuit_tpu.io.fastq import fastq_iter, read_batch


@pytest.fixture(scope="module")
def setup(small_dataset):
    fa = str(small_dataset / "genome.fa")
    idx = build_index(fa)
    return idx, small_dataset


def _load(path, n):
    return read_batch(fastq_iter(str(path)), None, 1 << 60)[:n]


def test_se_hybrid_matches_host(setup):
    idx, d = setup
    st = AlignerState(idx)
    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI
    host_seqs = _load(d / "reads.fq", 80)
    process_seqs(opt, st, host_seqs, 0)
    opt2 = MemOpt()
    opt2.flag |= MEM_F_NO_MULTI
    hyb_seqs = _load(d / "reads.fq", 80)
    process_seqs_hybrid(opt2, st, hyb_seqs, 0)
    for h, v in zip(host_seqs, hyb_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\nhyb : {v.sam}"


def test_se_hybrid_pipelined_subbatches_match_host(setup, monkeypatch):
    """The round-5 injection pipeline (injector thread builds sub-batch
    k+1's device injection while C++ aligns k) must keep SAM bytes
    identical — forced into many sub-batches via a tiny DEVICE_BATCH."""
    from biscuit_tpu.align import device_engine
    idx, d = setup
    st = AlignerState(idx)
    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI
    host_seqs = _load(d / "reads.fq", 90)
    process_seqs(opt, st, host_seqs, 0)
    monkeypatch.setattr(device_engine, "DEVICE_BATCH", 16)
    opt2 = MemOpt()
    opt2.flag |= MEM_F_NO_MULTI
    hyb_seqs = _load(d / "reads.fq", 90)
    process_seqs_hybrid(opt2, st, hyb_seqs, 0)   # 6 pipelined sub-batches
    for h, v in zip(host_seqs, hyb_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\npipe: {v.sam}"


def test_injection_covers_lanes(setup):
    """The seeder must actually inject (not silently fall back): every lane
    of a normal batch gets has=1 and at least one seed row."""
    idx, d = setup
    st = AlignerState(idx)
    opt = MemOpt()
    seqs = _load(d / "reads.fq", 32)
    from biscuit_tpu.align.io_helpers import read_clipping
    for s in seqs:
        read_clipping(s, opt.adaptor1, opt)
    sdr = DeviceSeeder(st)
    out = sdr.build_injection(opt, seqs, pe=False)
    assert out is not None
    _inj, keep = out
    has, lane_off = keep[0], keep[1]
    assert has.sum() == 2 * len(seqs)  # both strand lanes of every read
    assert lane_off[-1] > 0


def test_se_hybrid_wide_index(small_dataset, monkeypatch_module):
    """Wide (int64-rank) device seeding end-to-end: same SAM bytes as the
    host path on a forced-wide index (the human-genome layout)."""
    monkeypatch_module.setenv("BISCUIT_TPU_WIDE_INDEX", "1")
    idx = build_index(str(small_dataset / "genome.fa"))
    assert idx.dau.sa_samples.dtype.itemsize == 8
    st = AlignerState(idx)
    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI
    host_seqs = _load(small_dataset / "reads.fq", 60)
    process_seqs(opt, st, host_seqs, 0)
    opt2 = MemOpt()
    opt2.flag |= MEM_F_NO_MULTI
    hyb_seqs = _load(small_dataset / "reads.fq", 60)
    sdr = DeviceSeeder(st)
    assert sdr.fmpair.wide
    process_seqs_hybrid(opt2, st, hyb_seqs, 0, seeder=sdr)
    for h, v in zip(host_seqs, hyb_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\nhyb : {v.sam}"


def test_pe_hybrid_matches_host(tmp_path_factory):
    import subprocess
    import sys
    from conftest import REPO
    d = tmp_path_factory.mktemp("pehyb")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "50000", "--n-reads", "120", "--pe", "--seed", "23"],
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
    hyb_seqs = load_pe()
    process_seqs_hybrid(opt2, st, hyb_seqs, 0)
    for h, v in zip(host_seqs, hyb_seqs):
        assert h.sam == v.sam, f"{h.name}\nhost: {h.sam}\nhyb : {v.sam}"
