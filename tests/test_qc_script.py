"""scripts/QC.py (the QC.sh equivalent): coverage tables verified against a
brute-force per-base recount, asset builder sanity."""
import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REPO


@pytest.fixture(scope="module")
def qcrun(small_dataset, tmp_path_factory):
    d = tmp_path_factory.mktemp("qcs")
    fa = str(small_dataset / "genome.fa")
    env = dict(os.environ, PYTHONPATH=REPO)
    sam = d / "a.sam"
    with open(sam, "w") as f:
        subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "align",
                        fa, str(small_dataset / "reads.fq")],
                       check=True, stdout=f, stderr=subprocess.DEVNULL,
                       env=env, cwd=REPO)
    bam = d / "a.bam"
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "sort", "-o",
                    str(bam), str(sam)], check=True, env=env, cwd=REPO,
                   capture_output=True)
    subprocess.run([sys.executable, f"{REPO}/scripts/build_qc_assets.py",
                    "-r", fa, "-o", str(d / "assets"), "-i"],
                   check=True, capture_output=True)
    r = subprocess.run([sys.executable, f"{REPO}/scripts/QC.py", "-o",
                        str(d / "qc"), str(d / "assets"), fa, "s",
                        str(bam)], env=env, cwd=REPO, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    return d, fa, bam


def _brute_depth(bam_path):
    from biscuit_tpu.io.sambam import AlignmentFile
    bam = AlignmentFile(str(bam_path))
    depth = {t: np.zeros(l, np.int64)
             for t, l in enumerate(bam.header.lengths)}
    for b in bam:
        if b.tid < 0 or (b.flag & 0x4):
            continue
        p = b.pos
        for op, ln in b.cigar:
            if op in (0, 2, 7, 8):
                depth[b.tid][p:p + ln] += 1
                p += ln
            elif op == 3:
                p += ln
    return bam.header, depth


def _read_table(path):
    rows = {}
    with open(path) as f:
        f.readline(), f.readline()
        for line in f:
            dep, cnt = line.split("\t")
            rows[int(dep)] = int(cnt)
    return rows


def test_covdist_matches_bruteforce(qcrun):
    d, fa, bam = qcrun
    hdr, depth = _brute_depth(bam)
    want = {}
    for t in depth:
        for dep, cnt in zip(*np.unique(depth[t], return_counts=True)):
            want[int(dep)] = want.get(int(dep), 0) + int(cnt)
    got = _read_table(d / "qc" / "s_covdist_all_base_table.txt")
    assert got == want


def test_cpg_covdist_matches_bruteforce(qcrun):
    d, fa, bam = qcrun
    hdr, depth = _brute_depth(bam)
    name2tid = {n: t for t, n in enumerate(hdr.names)}
    want = {}
    with gzip.open(d / "assets" / "cpg.bed.gz", "rt") as f:
        for line in f:
            c, s, e = line.split("\t")
            t = name2tid[c]
            md = int(min(depth[t][int(s)], depth[t][int(s) + 1]))
            want[md] = want.get(md, 0) + 1
    got = _read_table(d / "qc" / "s_covdist_all_cpg_table.txt")
    assert got == want


def test_assets_cpg_positions(small_dataset, tmp_path):
    fa = str(small_dataset / "genome.fa")
    subprocess.run([sys.executable, f"{REPO}/scripts/build_qc_assets.py",
                    "-r", fa, "-o", str(tmp_path), "-i"],
                   check=True, capture_output=True)
    seqs = {}
    name = None
    for line in open(fa):
        if line.startswith(">"):
            name = line[1:].split()[0]
            seqs[name] = []
        else:
            seqs[name].append(line.strip())
    seqs = {k: "".join(v).upper() for k, v in seqs.items()}
    n_want = sum(s.count("CG") for s in seqs.values())
    with gzip.open(tmp_path / "cpg.bed.gz", "rt") as f:
        rows = [l.split("\t") for l in f]
    assert len(rows) == n_want
    for c, s, _e in rows[:50]:
        assert seqs[c][int(s):int(s) + 2] == "CG"


def test_flip_pbat_and_to_mr(tmp_path_factory):
    """scripts/flip_pbat_strands.py toggles 0x10 on every record;
    scripts/pybiscuit.py to_mr emits reference-frame fragments whose span
    equals the sequence length."""
    d = tmp_path_factory.mktemp("scripts")
    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run([sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
                    "--genome-size", "40000", "--n-reads", "100", "--pe",
                    "--seed", "31"], check=True, capture_output=True)
    fa = str(d / "genome.fa")
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "index", fa],
                   check=True, env=env, cwd=REPO, capture_output=True)
    with open(d / "a.sam", "w") as f:
        subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "align",
                        fa, str(d / "reads_1.fq"), str(d / "reads_2.fq")],
                       check=True, stdout=f, stderr=subprocess.DEVNULL,
                       env=env, cwd=REPO)
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "sort", "-o",
                    str(d / "a.bam"), str(d / "a.sam")], check=True,
                   env=env, cwd=REPO, capture_output=True)

    subprocess.run([sys.executable, f"{REPO}/scripts/flip_pbat_strands.py",
                    str(d / "a.bam"), str(d / "flip.bam")], check=True,
                   env=env, capture_output=True)
    from biscuit_tpu.io.sambam import AlignmentFile
    orig = list(AlignmentFile(str(d / "a.bam")))
    flip = list(AlignmentFile(str(d / "flip.bam")))
    assert len(orig) == len(flip) > 0
    for a, b in zip(orig, flip):
        assert a.qname == b.qname and (a.flag ^ b.flag) == 0x10
    assert os.path.exists(d / "flip.bam.bai")

    r = subprocess.run([sys.executable, f"{REPO}/scripts/pybiscuit.py",
                        "to_mr", "-i", str(d / "a.bam")], env=env,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-800:]
    lines = r.stdout.splitlines()
    assert len(lines) > 50
    for line in lines:
        f = line.split("\t")
        assert int(f[2]) - int(f[1]) == len(f[6])
        assert f[5] in "+-" and f[3].startswith("FRAG:")
