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
