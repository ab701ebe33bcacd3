"""Coverage for the smaller subcommands: bc, rectangle, cinread, bsconv,
vcf2bed -t snp — structural/invariant checks on the shared pipeline data
(SURVEY.md §4 lists these as part of the reference's regression surface)."""
import os
import subprocess
import sys

import pytest

from conftest import REPO


def run(args, cwd=REPO, check=True):
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + args,
                       capture_output=True, text=True, cwd=cwd)
    if check:
        assert r.returncode == 0, f"{args}: {r.stderr[-1500:]}"
    return r


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    d = tmp_path_factory.mktemp("misc")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "40000", "--n-reads", "400", "--seed", "21",
         "--n-chroms", "1"],
        check=True, capture_output=True)
    fa = str(d / "genome.fa")
    run(["index", fa])
    sam = run(["align", fa, str(d / "reads.fq")]).stdout
    (d / "aln.sam").write_text(sam)
    run(["sort", "-o", str(d / "aln.bam"), str(d / "aln.sam")])
    run(["pileup", "-o", str(d / "plp.vcf"), fa, str(d / "aln.bam")])
    return d, fa


def test_cinread(pipe):
    d, fa = pipe
    r = run(["cinread", "-t", "cg", fa, str(d / "aln.bam")])
    lines = [l for l in r.stdout.splitlines() if l]
    assert len(lines) > 100
    # default layout: QNAME QPAIR BSSTRAND CRBASE CQBASE
    for l in lines[:20]:
        cols = l.split("\t")
        assert len(cols) == 5
        assert cols[3] in ("C", "G") and cols[4] in "ACGTN"
    # explicit retention column
    r2 = run(["cinread", "-t", "cg", "-p", "QNAME,CRETENTION", fa,
              str(d / "aln.bam")])
    for l in r2.stdout.splitlines()[:20]:
        assert l.split("\t")[-1] in ("R", "C", "N")


def test_bsconv(pipe):
    d, fa = pipe
    # -p: per-read tab table of retention/conversion counts by context
    r = run(["bsconv", "-p", fa, str(d / "aln.bam")])
    # reference prints the SAM header before the tab rows (bamfilter.c:37-41)
    lines = [l for l in r.stdout.splitlines() if l and not l.startswith("@")]
    assert len(lines) > 100
    for l in lines[:10]:
        cols = l.split("\t")
        assert len(cols) >= 9, cols
    # filtering mode annotates/filters without error
    r2 = run(["bsconv", "-f", "0.5", fa, str(d / "aln.bam"),
              str(d / "conv.bam")])
    assert os.path.exists(d / "conv.bam")


def test_vcf2bed_snp(pipe):
    d, fa = pipe
    r = run(["vcf2bed", "-t", "snp", str(d / "plp.vcf")], check=False)
    assert r.returncode == 0, r.stderr[-500:]
    for l in r.stdout.splitlines()[:10]:
        cols = l.split("\t")
        assert len(cols) >= 6
        assert cols[1].isdigit() and cols[2].isdigit()


def test_bc_and_rectangle(pipe, tmp_path):
    d, fa = pipe
    # bc: extract inline barcodes (first 8 bp) and rewrite names
    out1 = str(tmp_path / "bc_1.fq.gz")
    r = run(["bc", "-s", "1", "-l", "8", "-o", str(tmp_path / "bc"),
             str(d / "reads.fq")], check=False)
    assert r.returncode == 0, r.stderr[-800:]
    import gzip
    import glob
    outs = glob.glob(str(tmp_path / "bc*"))
    assert outs, "bc produced no output files"
    with gzip.open(outs[0], "rt") as f:
        name = f.readline().strip()
    assert name.startswith("@") and "_" in name  # name_bc[_umi] rewrite

    # rectangle: pad old-format epireads to a matrix
    old = run(["epiread", "-O", fa, str(d / "aln.bam")]).stdout
    ep = tmp_path / "old.epiread"
    ep.write_text(old)
    r2 = run(["rectangle", fa, str(ep)], check=False)
    assert r2.returncode == 0, r2.stderr[-800:]
    lines = [l for l in r2.stdout.splitlines() if l]
    assert len(lines) > 10
    # rectangular: per chrom, all rows have equal retention-string length
    from collections import defaultdict
    bychrom = defaultdict(set)
    for l in lines:
        cols = l.split("\t")
        bychrom[cols[0]].add(len(cols[-1]))
    for chrom, lens in bychrom.items():
        assert len(lens) == 1, (chrom, lens)


def test_cinread_vectorized_counts_match_scalar(pipe):
    """The vectorized count path (skip_printing, used by qc) must agree with
    the scalar per-site walk for every target context."""
    import io

    import numpy as np

    d, fa = pipe
    from biscuit_tpu.io.sambam import AlignmentFile
    from biscuit_tpu.pileup.common import RefCache
    from biscuit_tpu.subcmds.cinread import (CinreadConf, CinreadData,
                                             cinread_func)

    af = AlignmentFile(str(d / "aln.bam"))
    rs = RefCache(fa)
    names = af.header.names
    for tgt in range(6):
        c1 = CinreadConf(tgt=tgt, skip_printing=0)
        c2 = CinreadConf(tgt=tgt, skip_printing=1)
        d1, d2 = CinreadData(), CinreadData()
        sink = io.StringIO()
        for b in af:
            cinread_func(b, rs, c1, d1, names, sink)
            cinread_func(b, rs, c2, d2, names, sink)
        assert np.array_equal(d1.counts, d2.counts), tgt
        assert d2.counts.sum() > 0, tgt


def test_external_sort_matches_in_memory(pipe, tmp_path):
    """sort -m N spills sorted runs and k-way merges; result must be
    byte-identical to the in-memory sort."""
    d, fa = pipe
    a = tmp_path / "a.bam"
    b = tmp_path / "b.bam"
    run(["sort", "-o", str(a), str(d / "aln.sam")])
    run(["sort", "-m", "100", "-o", str(b), str(d / "aln.sam")])
    assert a.read_bytes() == b.read_bytes()


def test_shard_align_matches_single_process(pipe):
    """tools/shard_align.py: sharded output must equal single-process."""
    d, fa = pipe
    single = subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli", "align", fa,
         str(d / "reads.fq")], capture_output=True, text=True, cwd=REPO)
    assert single.returncode == 0
    # "-@ 1" regression: a flag VALUE must not be parsed as a positional
    # (it shifted ref/fastq detection into PE mode with ref.fa as read1)
    sh = subprocess.run(
        [sys.executable, f"{REPO}/tools/shard_align.py", "-n", "3",
         "-@", "1", fa,
         str(d / "reads.fq")], capture_output=True, text=True, cwd=REPO)
    assert sh.returncode == 0, sh.stderr[-500:]
    strip = lambda s: [l for l in s.splitlines() if not l.startswith("@")]
    assert strip(sh.stdout) == strip(single.stdout)


def test_shard_align_pe_matches_single_process(tmp_path):
    """PE sharding is deterministic: candidate insert sizes are pooled across
    ranks (BISCUIT_TPU_PES_EXCHANGE file allgather), so every shard computes
    the chunk-wide pes of the reference (bwamem.c:464-467) and the merged
    output equals the single-process run byte-for-byte."""
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(tmp_path),
         "--genome-size", "40000", "--n-reads", "300", "--pe", "--seed", "31",
         "--n-chroms", "1"],
        check=True, capture_output=True)
    fa = str(tmp_path / "genome.fa")
    run(["index", fa])
    fq1, fq2 = str(tmp_path / "reads_1.fq"), str(tmp_path / "reads_2.fq")
    single = subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli", "align", fa, fq1, fq2],
        capture_output=True, text=True, cwd=REPO)
    assert single.returncode == 0
    sh = subprocess.run(
        [sys.executable, f"{REPO}/tools/shard_align.py", "-n", "3", fa,
         fq1, fq2], capture_output=True, text=True, cwd=REPO)
    assert sh.returncode == 0, sh.stderr[-500:]
    strip = lambda s: [l for l in s.splitlines() if not l.startswith("@")]
    assert strip(sh.stdout) == strip(single.stdout)


def test_shard_align_smart_pairing_matches_single_process(tmp_path):
    """-p (interleaved mates, ONE file): the stride must move by PAIR
    groups — a per-record stride hands all read-1s to one worker and
    silently mispairs (advisor r4). Sharded == single-process output."""
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(tmp_path),
         "--genome-size", "40000", "--n-reads", "200", "--pe", "--seed",
         "37", "--n-chroms", "1"],
        check=True, capture_output=True)
    fa = str(tmp_path / "genome.fa")
    run(["index", fa])
    # interleave mates into one smart-pairing file
    r1 = (tmp_path / "reads_1.fq").read_text().splitlines()
    r2 = (tmp_path / "reads_2.fq").read_text().splitlines()
    il = tmp_path / "il.fq"
    with open(il, "w") as f:
        for i in range(0, len(r1), 4):
            f.write("\n".join(r1[i:i + 4]) + "\n")
            f.write("\n".join(r2[i:i + 4]) + "\n")
    single = subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli", "align", "-p", fa,
         str(il)], capture_output=True, text=True, cwd=REPO)
    assert single.returncode == 0
    sh = subprocess.run(
        [sys.executable, f"{REPO}/tools/shard_align.py", "-n", "2", "-p",
         fa, str(il)], capture_output=True, text=True, cwd=REPO)
    assert sh.returncode == 0, sh.stderr[-500:]
    strip = lambda s: [l for l in s.splitlines() if not l.startswith("@")]
    assert strip(sh.stdout) == strip(single.stdout)


def test_shard_align_streaming_source_spooled(pipe):
    """Streaming FASTQ sources ('-', pipes, URLs) are spooled once and
    shared by the striding workers (advisor r4: they used to be misparsed
    as flags and the driver failed)."""
    d, fa = pipe
    single = subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli", "align", fa,
         str(d / "reads.fq")], capture_output=True, text=True, cwd=REPO)
    assert single.returncode == 0
    sh = subprocess.run(
        [sys.executable, f"{REPO}/tools/shard_align.py", "-n", "2", fa,
         f"cat {d / 'reads.fq'} |"], capture_output=True, text=True,
        cwd=REPO)
    assert sh.returncode == 0, sh.stderr[-500:]
    strip = lambda s: [l for l in s.splitlines() if not l.startswith("@")]
    assert strip(sh.stdout) == strip(single.stdout)


def test_fastq_kopen_sources(tmp_path):
    """kopen-style inputs (lib/aln/kopen.c): stdin '-', shell pipes, and
    magic-sniffed gzip (no extension) all feed the FASTQ reader."""
    import gzip as _gzip
    import subprocess
    import sys
    from biscuit_tpu.io.fastq import fastq_iter

    fq = tmp_path / "r.fastq"
    fq.write_text("@r1 c1\nACGT\n+\nIIII\n@r2\nGGTT\n+\nJJJJ\n")
    gz = tmp_path / "noext"  # gzip WITHOUT the .gz extension
    gz.write_bytes(_gzip.compress(fq.read_bytes()))

    want = list(fastq_iter(str(fq)))
    assert [w[0] for w in want] == ["r1", "r2"]
    assert list(fastq_iter(str(gz))) == want          # magic sniffing
    assert list(fastq_iter(f"cat {fq} |")) == want    # shell pipe
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from biscuit_tpu.io.fastq import fastq_iter; "
         "print(list(fastq_iter('-')))" % str(REPO)],
        input=fq.read_bytes(), capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    assert str(want) in r.stdout.decode()             # stdin '-'


def test_shard_pileup_matches_single_process(tmp_path):
    """tools/shard_pileup.py: per-chromosome sharded VCF and merged
    meth_average must equal the single-process run byte-for-byte."""
    import subprocess
    import sys
    d = tmp_path
    subprocess.run([sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
                    "--genome-size", "40000", "--n-reads", "300",
                    "--n-chroms", "3", "--seed", "17"],
                   check=True, capture_output=True)
    fa = str(d / "genome.fa")
    run(["index", fa])
    sam = run(["align", fa, str(d / "reads.fq")]).stdout
    (d / "a.sam").write_text(sam)
    run(["sort", "-o", str(d / "a.bam"), str(d / "a.sam")])
    run(["pileup", "-o", str(d / "single.vcf"), fa, str(d / "a.bam")])
    r = subprocess.run(
        [sys.executable, f"{REPO}/tools/shard_pileup.py", "-n", "2",
         "-o", str(d / "shard.vcf"), fa, str(d / "a.bam")],
        capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr[-800:]

    def body(p):
        return [l for l in open(p) if not l.startswith("##program")]
    assert body(d / "shard.vcf") == body(d / "single.vcf")
    ma_s = (d / "shard.vcf_meth_average.tsv").read_text()
    ma_1 = (d / "single.vcf_meth_average.tsv").read_text()
    assert ma_s == ma_1
