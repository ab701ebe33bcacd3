"""BAI index (io/bai.py): format roundtrip and streamed-fetch equivalence
with the in-memory path."""
import os
import subprocess
import sys

import pytest

from conftest import REPO


@pytest.fixture(scope="module")
def bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("bai")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "60000", "--n-reads", "500", "--seed", "11",
         "--n-chroms", "2"],
        check=True, capture_output=True)
    fa = str(d / "genome.fa")
    run = lambda a: subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli"] + a, check=True,
        capture_output=True, text=True, cwd=REPO)
    run(["index", fa])
    aln = run(["align", fa, str(d / "reads.fq")])
    (d / "aln.sam").write_text(aln.stdout)
    run(["sort", "-o", str(d / "aln.bam"), str(d / "aln.sam")])
    run(["bamindex", str(d / "aln.bam")])
    return d


def test_bai_roundtrip(bam):
    from biscuit_tpu.io.bai import BaiIndex
    p = str(bam / "aln.bam.bai")
    idx = BaiIndex.read(p)
    idx.write(p + ".rt")
    assert open(p, "rb").read() == open(p + ".rt", "rb").read()


def test_streamed_fetch_matches_memory(bam):
    from biscuit_tpu.io.sambam import AlignmentFile

    path = str(bam / "aln.bam")
    af_bai = AlignmentFile(path)           # picks up .bai -> streaming
    assert af_bai._bai is not None
    os.rename(path + ".bai", path + ".nobai")
    try:
        af_mem = AlignmentFile(path)       # in-memory
        assert af_mem._bai is None
        # full iteration equal
        fmt = lambda r: (r.tid, r.pos, r.qname, r.cigar_str(), r.seq)
        assert [fmt(r) for r in af_bai] == [fmt(r) for r in af_mem]
        # region queries equal across windows and chroms
        for tid in range(len(af_mem.header.names)):
            for beg, end in ((0, 1), (1, 5000), (4999, 5001), (10000, 30000),
                             (0, 1 << 29)):
                got = [fmt(r) for r in af_bai.fetch(tid, beg, end)]
                exp = [fmt(r) for r in af_mem.fetch(tid, beg, end)]
                assert got == exp, (tid, beg, end)
    finally:
        os.rename(path + ".nobai", path + ".bai")


def test_downstream_with_bai(bam):
    """pileup and epiread must give the same output streamed vs in-memory."""
    d = bam
    fa = str(d / "genome.fa")
    path = str(d / "aln.bam")

    def run(a):
        r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + a,
                           capture_output=True, text=True, cwd=REPO)
        assert r.returncode == 0, r.stderr[-800:]
        return "\n".join(l for l in r.stdout.splitlines()
                         if not l.startswith("##program"))

    with_bai_p = run(["pileup", fa, path])
    with_bai_e = run(["epiread", fa, path])
    os.rename(path + ".bai", path + ".nobai")
    try:
        assert run(["pileup", fa, path]) == with_bai_p
        assert run(["epiread", fa, path]) == with_bai_e
    finally:
        os.rename(path + ".nobai", path + ".bai")
