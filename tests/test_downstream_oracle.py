"""Reference-parity byte-diffs for the whole BAM-downstream family.

The oracle is the real reference subcommand sources
(/root/reference/src/{pileup,epiread,vcf2bed,mergecg,asm_pairwise,bsstrand,
bsconv,cinread,qc,epiread_rectangle}.c) compiled in place against the local
htslib-API shim (tools/oracle/down/), so every diff here is
our-output-vs-reference-logic. The GL/GQ/SS/SC numeric fields come from the
shared stats.h re-derivation (tools/oracle/down/stats.h == pileup/stats.py,
documented defined behavior); everything else is unmodified reference code.
Covers: pileup (plain, NOMe, DIAGNOSE, region, somatic), vcf2bed (6 types,
-e/-c), mergecg (-c), epiread (epiBED/-B/-O/-P/-N), asm, bsstrand (-c -y),
bsconv (incl. -p tab), cinread (6 contexts), qc (all 7 tables).
"""
import os
import subprocess
import sys

import pytest

from conftest import REPO

ORACLE_DOWN = os.path.join(REPO, "tools", "oracle", "build", "oracle_down")

pytestmark = pytest.mark.filterwarnings("ignore")


def ensure_oracle_down():
    if not os.path.exists(ORACLE_DOWN):
        r = subprocess.run(["make", "-j4", "down"],
                           cwd=os.path.join(REPO, "tools", "oracle"),
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("downstream oracle unavailable: " + r.stderr.decode()[-500:])
    return ORACLE_DOWN


def run_ours(args, **kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + args,
                       capture_output=True, text=True, cwd=REPO, env=env, **kw)
    assert r.returncode == 0, f"{args}: {r.stderr[-2000:]}"
    # drop the end-of-run [main] summary (the REAL reference prints it too,
    # src/main.c:152-157, but the oracle shim's down_main has no epilogue)
    err = "".join(l for l in r.stderr.splitlines(keepends=True)
                  if not l.startswith("[main] "))
    return r.stdout, err


def run_oracle(args, **kw):
    r = subprocess.run([ORACLE_DOWN] + args, capture_output=True, text=True, **kw)
    assert r.returncode == 0, f"oracle {args}: {r.stderr[-2000:]}"
    return r.stdout, r.stderr


def strip_meta(vcf_text):
    return "\n".join(l for l in vcf_text.splitlines()
                     if not l.startswith(("##source", "##program")))


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    """Aligned, sorted BAM over a 2-chrom simulated genome."""
    ensure_oracle_down()
    d = tmp_path_factory.mktemp("downoracle")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_testdata.py"), str(d),
         "--genome-size", "40000", "--n-reads", "400", "--pe", "--seed", "3",
         "--n-chroms", "2"],
        check=True, capture_output=True)
    fa = str(d / "genome.fa")
    run_ours(["index", fa])
    sam, _ = run_ours(["align", "-b", "1", fa,
                       str(d / "reads_1.fq"), str(d / "reads_2.fq")])
    (d / "aln.sam").write_text(sam)
    run_ours(["sort", "-o", str(d / "aln.bam"), str(d / "aln.sam")])
    return d, fa, str(d / "aln.bam")


@pytest.fixture(scope="module")
def vcfs(ds):
    """Plain pileup from both sides + the oracle's snp bed."""
    d, fa, bam = ds
    run_oracle(["pileup", "-o", str(d / "o.vcf"), fa, bam])
    run_ours(["pileup", "-o", str(d / "m.vcf"), fa, bam])
    snp, _ = run_oracle(["vcf2bed", "-t", "snp", str(d / "o.vcf")])
    (d / "snp.bed").write_text(snp)
    return d, fa, bam


def test_pileup_vcf_identical(vcfs):
    d, fa, bam = vcfs
    assert strip_meta((d / "o.vcf").read_text()) == \
        strip_meta((d / "m.vcf").read_text())


def test_pileup_meth_average_identical(vcfs):
    d, fa, bam = vcfs
    o = (d / "o.vcf_meth_average.tsv").read_text().replace("o.vcf", "X")
    m = (d / "m.vcf_meth_average.tsv").read_text().replace("m.vcf", "X")
    assert o == m


@pytest.mark.parametrize("flags", [["-N"], ["-v", "1"],
                                   ["-g", "chr1:5000-15000"]])
def test_pileup_modes_identical(ds, flags):
    d, fa, bam = ds
    tag = "".join(flags).replace(":", "_")
    run_oracle(["pileup"] + flags + ["-o", str(d / f"o{tag}.vcf"), fa, bam])
    run_ours(["pileup"] + flags + ["-o", str(d / f"m{tag}.vcf"), fa, bam])
    assert strip_meta((d / f"o{tag}.vcf").read_text()) == \
        strip_meta((d / f"m{tag}.vcf").read_text())


def test_pileup_somatic_identical(ds):
    d, fa, bam = ds
    run_oracle(["pileup", "-S", "-T", bam, "-I", bam,
                "-o", str(d / "o.som.vcf"), fa])
    run_ours(["pileup", "-S", "-T", bam, "-I", bam,
              "-o", str(d / "m.som.vcf"), fa])
    assert strip_meta((d / "o.som.vcf").read_text()) == \
        strip_meta((d / "m.som.vcf").read_text())


@pytest.mark.parametrize("t", ["c", "cg", "ch", "hcg", "gch", "snp"])
def test_vcf2bed_identical(vcfs, t):
    d, fa, bam = vcfs
    o, _ = run_oracle(["vcf2bed", "-t", t, str(d / "o.vcf")])
    m, _ = run_ours(["vcf2bed", "-t", t, str(d / "o.vcf")])
    assert o == m


@pytest.mark.parametrize("flags", [["-e"], ["-c"], ["-e", "-c"]])
def test_vcf2bed_flags_identical(vcfs, flags):
    d, fa, bam = vcfs
    o, _ = run_oracle(["vcf2bed"] + flags + ["-t", "cg", str(d / "o.vcf")])
    m, _ = run_ours(["vcf2bed"] + flags + ["-t", "cg", str(d / "o.vcf")])
    assert o == m


@pytest.mark.parametrize("flags", [[], ["-c"]])
def test_mergecg_identical(vcfs, flags):
    d, fa, bam = vcfs
    cg, _ = run_oracle(["vcf2bed", "-t", "cg", str(d / "o.vcf")])
    (d / "cg.bed").write_text(cg)
    o, _ = run_oracle(["mergecg"] + flags + [fa, str(d / "cg.bed")])
    m, _ = run_ours(["mergecg"] + flags + [fa, str(d / "cg.bed")])
    assert o == m


@pytest.mark.parametrize("flags", [[], ["-N"], ["-O"], ["-N", "-O"], ["-E"]])
def test_epiread_identical(vcfs, flags):
    d, fa, bam = vcfs
    o, _ = run_oracle(["epiread"] + flags + [fa, bam])
    m, _ = run_ours(["epiread"] + flags + [fa, bam])
    assert o == m


@pytest.mark.parametrize("flags", [[], ["-O"], ["-P"], ["-N", "-O"],
                                   ["-N", "-P"]])
def test_epiread_snp_identical(vcfs, flags):
    d, fa, bam = vcfs
    o, _ = run_oracle(["epiread"] + flags + ["-B", str(d / "snp.bed"), fa, bam])
    m, _ = run_ours(["epiread"] + flags + ["-B", str(d / "snp.bed"), fa, bam])
    assert o == m


def test_asm_identical(vcfs):
    d, fa, bam = vcfs
    p, _ = run_oracle(["epiread", "-P", "-B", str(d / "snp.bed"), fa, bam])
    (d / "pw.epiread").write_text(p)
    o, _ = run_oracle(["asm", str(d / "pw.epiread")])
    m, _ = run_ours(["asm", str(d / "pw.epiread")])
    assert o == m


def test_rectangle_identical(vcfs):
    d, fa, bam = vcfs
    old, _ = run_oracle(["epiread", "-O", "-B", str(d / "snp.bed"), fa, bam])
    # rectangle refuses multi-chromosome input (epiread_rectangle.c:110)
    old = "".join(l + "\n" for l in old.splitlines() if l.startswith("chr1\t"))
    (d / "old.epiread").write_text(old)
    o, _ = run_oracle(["rectangle", fa, str(d / "old.epiread")])
    m, _ = run_ours(["rectangle", fa, str(d / "old.epiread")])
    assert o == m


def test_bsstrand_identical(ds):
    d, fa, bam = ds
    o_out, o_err = run_oracle(["bsstrand", fa, bam])
    m_out, m_err = run_ours(["bsstrand", fa, bam])
    assert o_out == m_out
    assert o_err == m_err


def test_bsstrand_correct_identical(ds):
    d, fa, bam = ds
    _, o_err = run_oracle(["bsstrand", "-c", "-y", fa, bam,
                           str(d / "o.bss.sam")])
    _, m_err = run_ours(["bsstrand", "-c", "-y", fa, bam,
                         str(d / "m.bss.sam")])
    assert (d / "o.bss.sam").read_text() == (d / "m.bss.sam").read_text()
    assert o_err == m_err


@pytest.mark.parametrize("flags", [[], ["-p"]])
def test_bsconv_identical(ds, flags):
    d, fa, bam = ds
    o, _ = run_oracle(["bsconv"] + flags + [fa, bam])
    m, _ = run_ours(["bsconv"] + flags + [fa, bam])
    assert o == m


@pytest.mark.parametrize("t", ["c", "cg", "ch", "hcg", "gch", "hch"])
def test_cinread_identical(ds, t):
    d, fa, bam = ds
    o, _ = run_oracle(["cinread", "-t", t, fa, bam])
    m, _ = run_ours(["cinread", "-t", t, fa, bam])
    assert o == m


def test_bc_stdout_identical(ds):
    d, fa, bam = ds
    fq1, fq2 = str(d / "reads_1.fq"), str(d / "reads_2.fq")
    o, _ = run_oracle(["bc", fq1, fq2])
    m, _ = run_ours(["bc", fq1, fq2])
    assert o == m
    o, _ = run_oracle(["bc", "-s", "2", "-l", "5", fq1])
    m, _ = run_ours(["bc", "-s", "2", "-l", "5", fq1])
    assert o == m


def test_bc_prefix_identical(ds, tmp_path):
    import gzip
    d, fa, bam = ds
    fq1, fq2 = str(d / "reads_1.fq"), str(d / "reads_2.fq")
    run_oracle(["bc", "-m", "2", "-s", "3", "-l", "6",
                "-o", str(tmp_path / "o"), fq1, fq2])
    run_ours(["bc", "-m", "2", "-s", "3", "-l", "6",
              "-o", str(tmp_path / "m"), fq1, fq2])
    for s in ("_R1.fq.gz", "_R2.fq.gz"):
        with gzip.open(tmp_path / ("o" + s)) as f:
            o = f.read()
        with gzip.open(tmp_path / ("m" + s)) as f:
            m = f.read()
        assert o == m, s


def test_qc_identical(ds, tmp_path):
    d, fa, bam = ds
    od = tmp_path / "oqc"; od.mkdir()
    md = tmp_path / "mqc"; md.mkdir()
    run_oracle(["qc", fa, bam, str(od / "p")])
    run_ours(["qc", fa, bam, str(md / "p")])
    files = sorted(os.listdir(od))
    assert files, "oracle qc produced no tables"
    assert files == sorted(os.listdir(md))
    for f in files:
        assert (od / f).read_text() == (md / f).read_text(), f


def test_epiread_modbam_nome_pinned(ds, tmp_path):
    """-M -N has NO reference behavior to match: the reference segfaults
    (epiread.c:761 pushes into cg_p, which is only allocated in non-NOMe
    mode — NULL deref at the first modified base). Pin that fact against
    the compiled oracle, and pin our clean refusal (modBAM 'm' calls carry
    no GC-accessibility channel, so the combination is semantically empty
    anyway)."""
    d, fa, bam = ds
    mbam = _make_modbam(ds, tmp_path)
    r = subprocess.run([ORACLE_DOWN, "epiread", "-M", "-N", fa, mbam],
                       capture_output=True, text=True)
    assert r.returncode < 0, (
        f"reference no longer crashes on -M -N (rc={r.returncode}); "
        f"its output must now be pinned instead of the refusal")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    m = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "epiread",
                        "-M", "-N", fa, mbam],
                       capture_output=True, text=True, cwd=REPO, env=env)
    assert m.returncode == 1
    assert "-M and -N are not compatible" in m.stderr


def _make_modbam(ds, tmp_path):
    """Synthesize a small sorted modBAM over the ds genome (shared by the
    -M oracle tests)."""
    d, fa, bam = ds
    genome = {}
    name = None
    for line in open(fa):
        if line.startswith(">"):
            name = line[1:].split()[0]
            genome[name] = []
        else:
            genome[name].append(line.strip())
    genome = {k: "".join(v) for k, v in genome.items()}
    chrom = sorted(genome)[0]
    ref = genome[chrom]
    rows = []
    for rid, (start, flag, deltas, mls) in enumerate([
            (100, 0, [0, 1, 0], [250, 5, 128]),
            (400, 16, [2, 0], [255, 0])]):
        seq = ref[start:start + 60]
        mm = "C+m" + "".join(",%d" % x for x in deltas) + ";"
        ml = "ML:B:C," + ",".join(str(v) for v in mls)
        rows.append("\t".join(
            ["nr%d" % rid, str(flag), chrom, str(start + 1), "60", "60M",
             "*", "0", "0", seq, "I" * 60, "NM:i:0", "MM:Z:" + mm, ml]))
    sam = tmp_path / "nmod.sam"
    sam.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        + "".join("@SQ\tSN:%s\tLN:%d\n" % (k, len(v))
                  for k, v in sorted(genome.items()))
        + "\n".join(rows) + "\n")
    mbam = str(tmp_path / "nmod.bam")
    run_ours(["sort", "-o", mbam, str(sam)])
    return mbam


@pytest.mark.parametrize("engine", ["native", "python"])
@pytest.mark.parametrize("flags", [[], ["-y", "0.5"]])
def test_epiread_modbam_identical(ds, tmp_path, flags, engine, monkeypatch):
    """epiread -M (MM/ML modBAM calls, epiread.c:586-617,755-774) byte-diff
    vs the reference compiled against the shim's real MM/ML parser
    (tools/oracle/down/hts_shim.c bam_parse_basemod2). Both the C++
    raw-record engine (round 3) and the Python walk stay pinned."""
    monkeypatch.setenv("BISCUIT_TPU_PILEUP",
                       "native" if engine == "native" else "numpy")
    d, fa, bam = ds
    genome = {}
    name = None
    for line in open(fa):
        if line.startswith(">"):
            name = line[1:].split()[0]
            genome[name] = []
        else:
            genome[name].append(line.strip())
    genome = {k: "".join(v) for k, v in genome.items()}
    chrom = sorted(genome)[0]
    ref = genome[chrom]
    comp = str.maketrans("ACGT", "TGCA")

    def mm_for(seq, flag, deltas, mls, head="C+m"):
        orig = seq.translate(comp)[::-1] if (flag & 16) else seq
        mm = head + "".join(",%d" % x for x in deltas) + ";"
        ml = "ML:B:C," + ",".join(str(v) for v in mls) if mls is not None else None
        return mm, ml

    rows = []
    rid = 0
    for start, flag, deltas, mls, head in [
        (100, 0, [0, 1, 0], [250, 5, 128], "C+m"),     # skip + mid prob
        (400, 16, [2, 0], [255, 0], "C+m"),            # reverse-strand record
        (900, 0, [0, 0, 0, 0], [200, 201, 10, 11], "C+m."),  # implicit '.'
        (1400, 16, [1, 1], [240, 17], "C+m?"),         # implicit '?'
        (1900, 0, [0, 2], None, "C+m"),                # ML absent -> qual -1
        (2400, 0, [5], [230], "C+m"),                  # big skip
    ]:
        seq = ref[start:start + 60]
        if "N" in seq or seq.count("C") < 7:
            start += 200
            seq = ref[start:start + 60]
        mm, ml = mm_for(seq, flag, deltas, mls, head)
        tags = ["NM:i:0", "MM:Z:" + mm] + ([ml] if ml else [])
        rows.append("\t".join(
            ["mr%d" % rid, str(flag), chrom, str(start + 1), "60", "60M",
             "*", "0", "0", seq, "I" * 60] + tags))
        rid += 1
    sam = tmp_path / "mod.sam"
    sam.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        + "".join("@SQ\tSN:%s\tLN:%d\n" % (k, len(v))
                  for k, v in sorted(genome.items()))
        + "\n".join(rows) + "\n")
    mbam = str(tmp_path / "mod.bam")
    run_ours(["sort", "-o", mbam, str(sam)])
    o, _ = run_oracle(["epiread", "-M"] + flags + [fa, mbam])
    m, _ = run_ours(["epiread", "-M"] + flags + [fa, mbam])
    assert o, "oracle produced no epiread output"
    assert o == m
