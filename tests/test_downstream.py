"""End-to-end downstream pipeline smoke tests:
align -> sort -> pileup -> vcf2bed -> mergecg -> epiread -> asm, plus the QC
family. The reference pileup chain cannot be oracle-built here (htslib needs
network), so these assert structural invariants + biologically consistent
values on simulated data (CpG beta ~0.75, CpH ~0.02).
"""
import os
import subprocess
import sys

import pytest

from conftest import REPO


def run(args, cwd, **kw):
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + args,
                       capture_output=True, text=True, cwd=cwd, **kw)
    assert r.returncode == 0, f"{args}: {r.stderr[-2000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    d = tmp_path_factory.mktemp("downstream")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "40000", "--n-reads", "400", "--pe", "--seed", "3",
         "--n-chroms", "1"],
        check=True, capture_output=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    fa = str(d / "genome.fa")
    run(["index", fa], cwd=REPO)
    sam = run(["align", "-b", "1", fa, str(d / "reads_1.fq"), str(d / "reads_2.fq")],
              cwd=REPO)
    (d / "aln.sam").write_text(sam)
    run(["sort", "-o", str(d / "aln.bam"), str(d / "aln.sam")], cwd=REPO)
    run(["pileup", "-o", str(d / "plp.vcf"), fa, str(d / "aln.bam")], cwd=REPO)
    return d, fa


def test_pileup_vcf(pipeline):
    d, fa = pipeline
    lines = (d / "plp.vcf").read_text().splitlines()
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) > 500
    assert any("CX=CG" in l for l in body)
    # meth average tsv written and CpG beta in simulated range
    tsv = (str(d / "plp.vcf") + "_meth_average.tsv")
    rows = open(tsv).read().splitlines()
    assert rows[0].startswith("sample\tchrm\tCGn")
    wg = [r for r in rows if "WholeGenome" in r][0].split("\t")
    cg_beta = float(wg[3].rstrip("%"))
    assert 65 < cg_beta < 85, wg
    ch_beta = float(wg[9].rstrip("%"))
    assert ch_beta < 10, wg


def test_pileup_fast_matches_slow(pipeline):
    """The C++ and vectorized-numpy window paths must be byte-identical to
    the per-datum reference-semantics path; beta sums may differ by float
    association (per-window partial sums), the printed stats do not."""
    import os

    import numpy as np

    d, fa = pipeline
    from biscuit_tpu.io.sambam import AlignmentFile
    from biscuit_tpu.pileup.common import NCONTXTS, RefCache
    from biscuit_tpu.pileup.engine import (PileupConf, _pileup_window_fast,
                                           _pileup_window_slow, pileup_window)

    rs = RefCache(fa)
    af = AlignmentFile(str(d / "aln.bam"))
    conf = PileupConf()
    name = af.header.names[0]
    tlen = af.header.lengths[0]

    def run_path(fn):
        bs = [[0.0] * NCONTXTS]
        cs = [[0] * NCONTXTS]
        out = []
        wbeg = 1
        while wbeg < tlen:
            out.append(fn([af], rs, conf, 0, name, wbeg,
                          min(wbeg + 7000, tlen), bs, cs))
            wbeg += 7000
        return "".join(out), bs, cs

    native = run_path(pileup_window)       # default: C++ engine
    fast = run_path(_pileup_window_fast)
    slow = run_path(_pileup_window_slow)
    assert native[0] == fast[0] == slow[0]
    assert fast[1] == slow[1] and fast[2] == slow[2]
    assert native[2] == slow[2]
    np.testing.assert_allclose(native[1], slow[1], rtol=1e-12)


def test_pileup_pooled_matches_serial(pipeline):
    d, fa = pipeline
    out1 = run(["pileup", "-@", "1", fa, str(d / "aln.bam")], cwd=REPO)
    out3 = run(["pileup", "-@", "3", fa, str(d / "aln.bam")], cwd=REPO)
    strip = lambda s: [l for l in s.splitlines() if not l.startswith("##program")]
    assert strip(out1) == strip(out3)


def test_epiread_pooled_matches_serial(pipeline):
    d, fa = pipeline
    out1 = run(["epiread", "-@", "1", "-s", "7000", fa, str(d / "aln.bam")],
               cwd=REPO)
    out3 = run(["epiread", "-@", "3", "-s", "7000", fa, str(d / "aln.bam")],
               cwd=REPO)
    assert out1 == out3 and out1.count("\n") > 100


def test_epiread_native_fresh_subprocess_loop(pipeline):
    """Regression trap for the round-3 ctypes int64 ABI bug: the undefined
    upper register half was a PER-PROCESS coin flip, so a single lucky run
    proved nothing. Run the pooled native window path in several fresh
    subprocesses; every one must emit the identical full output."""
    d, fa = pipeline
    outs = [run(["epiread", "-@", "2", "-s", "7000", fa, str(d / "aln.bam")],
                cwd=REPO) for _ in range(4)]
    assert outs[0].count("\n") > 100
    assert all(o == outs[0] for o in outs[1:])


def test_vcf2bed_and_mergecg(pipeline):
    d, fa = pipeline
    bed = run(["vcf2bed", "-t", "cg", str(d / "plp.vcf")], cwd=REPO)
    assert bed
    rows = [l.split("\t") for l in bed.splitlines()]
    for r in rows:
        assert int(r[2]) == int(r[1]) + 1
        assert r[3] == "." or 0 <= float(r[3]) <= 1
    (d / "cg.bed").write_text(bed)
    merged = run(["mergecg", fa, str(d / "cg.bed")], cwd=REPO)
    mrows = [l.split("\t") for l in merged.splitlines()]
    assert len(mrows) < len(rows)
    assert any(int(r[2]) - int(r[1]) == 2 for r in mrows)  # merged CpG pairs
    assert all(r[5].startswith("C:") for r in mrows[:5])


def test_epiread_asm(pipeline):
    d, fa = pipeline
    snps = run(["vcf2bed", "-t", "snp", str(d / "plp.vcf")], cwd=REPO)
    (d / "snps.bed").write_text(snps)
    epi = run(["epiread", "-B", str(d / "snps.bed"), fa, str(d / "aln.bam")], cwd=REPO)
    assert epi
    for l in epi.splitlines()[:20]:
        f = l.split("\t")
        assert len(f) == 9
        assert f[5] in "+-"
    pw = run(["epiread", "-P", "-B", str(d / "snps.bed"), fa, str(d / "aln.bam")],
             cwd=REPO)
    (d / "pw.epiread").write_text(pw)
    if pw.strip():
        out = run(["asm", str(d / "pw.epiread")], cwd=REPO)
        for l in out.splitlines():
            f = l.split("\t")
            assert len(f) == 11
            assert 0 <= float(f[9]) <= 1


def test_qc_and_bsstrand(pipeline, tmp_path):
    d, fa = pipeline
    run(["qc", fa, str(d / "aln.bam"), str(tmp_path / "s")], cwd=REPO)
    for suffix in ("_mapq_table.txt", "_dup_report.txt", "_strand_table.txt",
                   "_totalReadConversionRate.txt", "_CpGRetentionByReadPos.txt",
                   "_CpHRetentionByReadPos.txt", "_isize_table.txt"):
        assert (tmp_path / ("s" + suffix)).exists(), suffix
    conv = (tmp_path / "s_totalReadConversionRate.txt").read_text().splitlines()[2].split("\t")
    assert 0.6 < float(conv[2]) < 0.9      # CpG retention ~0.75
    assert float(conv[0]) < 0.1            # CpA retention ~0.02

    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "bsstrand", fa,
                        str(d / "aln.bam")], capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0
    assert "Mapped reads: " in r.stderr
    assert "Confusion counts" in r.stderr


def test_bam_roundtrip(pipeline):
    d, fa = pipeline
    sys.path.insert(0, REPO)
    from biscuit_tpu.io.sambam import AlignmentFile
    sam = AlignmentFile(str(d / "aln.sam"))
    bam = AlignmentFile(str(d / "aln.bam"))
    srecs = sorted(sam, key=lambda r: (r.tid, r.pos, r.qname, r.flag))
    brecs = sorted(bam, key=lambda r: (r.tid, r.pos, r.qname, r.flag))
    assert len(srecs) == len(brecs)
    for a, b in zip(srecs, brecs):
        assert (a.qname, a.flag, a.tid, a.pos, a.cigar, a.seq, a.qual) == \
               (b.qname, b.flag, b.tid, b.pos, b.cigar, b.seq, b.qual)
        assert a.tags == b.tags


def test_pileup_raw_bam_matches_object_path(pipeline):
    """The raw-BAM C++ path (bt_bam_scan + bt_pileup_window_raw) must be
    byte-identical to the AlnRecord-marshaling path."""
    d, fa = pipeline
    from biscuit_tpu.io.sambam import AlignmentFile
    from biscuit_tpu.pileup.common import NCONTXTS, RefCache
    from biscuit_tpu.pileup.engine import PileupConf, pileup_window
    from biscuit_tpu.pileup.native import RawBam

    rs = RefCache(fa)
    conf = PileupConf()
    raw = RawBam(str(d / "aln.bam"))
    af = AlignmentFile(str(d / "aln.bam"))
    name = raw.header.names[0]
    tlen = raw.header.lengths[0]

    def run(bams):
        bs = [[0.0] * NCONTXTS]
        cs = [[0] * NCONTXTS]
        out = []
        wbeg = 1
        while wbeg < tlen:
            out.append(pileup_window(bams, rs, conf, 0, name, wbeg,
                                     min(wbeg + 7000, tlen), bs, cs))
            wbeg += 7000
        return "".join(out), bs, cs

    a = run([raw])
    b = run([af])
    assert a == b


def test_pileup_bai_streaming_matches_whole_blob(pipeline):
    """RawBamStream (per-window BGZF block decompression via the .bai,
    bounded memory) must match whole-blob RawBam byte-for-byte."""
    d, fa = pipeline
    import subprocess
    import sys

    from biscuit_tpu.io.bai import build_bai
    from biscuit_tpu.pileup.common import NCONTXTS, RefCache
    from biscuit_tpu.pileup.engine import PileupConf, pileup_window
    from biscuit_tpu.pileup.native import RawBam, RawBamStream

    bam = str(d / "aln.bam")
    build_bai(bam).write(bam + ".bai")
    rs = RefCache(fa)
    conf = PileupConf()
    raw = RawBam(bam)
    stream = RawBamStream(bam)
    name = raw.header.names[0]
    tlen = raw.header.lengths[0]

    def run(bams):
        bs = [[0.0] * NCONTXTS]
        cs = [[0] * NCONTXTS]
        out = []
        wbeg = 1
        while wbeg < tlen:
            out.append(pileup_window(bams, rs, conf, 0, name, wbeg,
                                     min(wbeg + 7000, tlen), bs, cs))
            wbeg += 7000
        return "".join(out), bs, cs

    a = run([raw])
    b = run([stream])
    assert a == b

    # epiread windows: streaming vs whole-blob, through the CLI (the CLI
    # picks RawBamStream automatically when the .bai exists)
    run_cli = lambda args: subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli"] + args,
        capture_output=True, text=True)
    with_bai = run_cli(["epiread", fa, bam])
    assert with_bai.returncode == 0, with_bai.stderr[-800:]
    (d / "aln.bam.bai").unlink()
    without = run_cli(["epiread", fa, bam])
    assert without.returncode == 0
    assert with_bai.stdout == without.stdout and with_bai.stdout


def test_epiread_native_matches_python(pipeline):
    """The C++ epiBED window engine must match the Python walk byte-for-byte,
    including SNP-aware and NOMe modes."""
    d, fa = pipeline
    from biscuit_tpu.io.sambam import AlignmentFile
    from biscuit_tpu.pileup.common import RefCache
    from biscuit_tpu.pileup.native import RawBam
    from biscuit_tpu.subcmds.epiread import (EpireadConf, process_window,
                                             process_window_native,
                                             read_episnp)

    rs = RefCache(fa)
    raw = RawBam(str(d / "aln.bam"))
    af = AlignmentFile(str(d / "aln.bam"))
    name = raw.header.names[0]
    tlen = raw.header.lengths[0]
    snps = run(["vcf2bed", "-t", "snp", str(d / "plp.vcf")], cwd=REPO)
    (d / "esnps.bed").write_text(snps)
    snp_table = read_episnp(str(d / "esnps.bed")) if snps.strip() else None

    for nome in (0, 1):
        for table in (None, snp_table):
            conf = EpireadConf()
            conf.comm.is_nome = nome

            def runw(fn, b):
                out = []
                wbeg = 1
                while wbeg < tlen:
                    fn(b, rs, conf, table, 0, name, wbeg,
                       min(wbeg + 7000, tlen), out)
                    wbeg += 7000
                return "".join(out)

            a = runw(process_window_native, raw)
            b = runw(process_window, af)
            assert a == b, (nome, table is not None)
            assert a.count("\n") > 50


def test_downstream_engines_agree_on_indel_bam(tmp_path):
    """pileup and epiread C++ vs numpy paths on a BAM with real I/D/S
    CIGARs (the simulator only makes substitutions)."""
    import random

    rng = random.Random(77)
    unit = "ACGTTAGCCATTGGCAACGT"
    genome = "".join(rng.choice("ACGT") for _ in range(30000))
    (tmp_path / "g.fa").write_text(">chr1\n" + genome + "\n")
    reads = []
    for i in range(200):
        p = rng.randrange(0, len(genome) - 160)
        frag = genome[p:p + 120]
        k = i % 3
        if k == 0:
            dp = rng.randrange(20, 80)
            frag = frag[:dp] + frag[dp + rng.randrange(1, 8):]
        elif k == 1:
            ip = rng.randrange(20, 80)
            frag = frag[:ip] + "".join(
                rng.choice("ACGT") for _ in range(rng.randrange(1, 6))) + frag[ip:]
        reads.append(frag[:100].replace("C", "T"))  # parent-converted
    with open(tmp_path / "r.fq", "w") as f:
        for i, s in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    fa = str(tmp_path / "g.fa")
    run(["index", fa], cwd=REPO)
    sam = run(["align", fa, str(tmp_path / "r.fq")], cwd=REPO)
    (tmp_path / "a.sam").write_text(sam)
    run(["sort", "-o", str(tmp_path / "a.bam"), str(tmp_path / "a.sam")],
        cwd=REPO)
    cigs = [l.split("\t")[5] for l in sam.splitlines() if not l.startswith("@")]
    assert any("D" in c for c in cigs) and any("I" in c for c in cigs)

    def md5(cmdargs, env_mode):
        env = dict(os.environ, BISCUIT_TPU_PILEUP=env_mode)
        r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + cmdargs,
                           capture_output=True, text=True, cwd=REPO, env=env)
        assert r.returncode == 0, r.stderr[-500:]
        return "\n".join(l for l in r.stdout.splitlines()
                         if not l.startswith("##program"))

    for cmd in (["pileup", fa, str(tmp_path / "a.bam")],
                ["epiread", fa, str(tmp_path / "a.bam")]):
        assert md5(cmd, "native") == md5(cmd, "numpy"), cmd[0]
