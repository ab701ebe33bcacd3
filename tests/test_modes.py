"""NOMe-seq, somatic, and tview modes."""
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
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("modes")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "30000", "--n-reads", "300", "--pe", "--seed", "9",
         "--n-chroms", "1"],
        check=True, capture_output=True)
    fa = str(d / "genome.fa")
    run(["index", fa])
    sam = run(["align", "-b", "1", fa, str(d / "reads_1.fq"),
               str(d / "reads_2.fq")]).stdout
    (d / "aln.sam").write_text(sam)
    run(["sort", "-o", str(d / "aln.bam"), str(d / "aln.sam")])
    return d, fa


def test_nome_pileup_and_epiread(data):
    d, fa = data
    r = run(["pileup", "-N", "-o", str(d / "nome.vcf"), fa, str(d / "aln.bam")])
    body = [l for l in (d / "nome.vcf").read_text().splitlines()
            if not l.startswith("#")]
    assert any("CX=HCG" in l for l in body)
    assert any("CX=GCH" in l for l in body)
    # NOMe beta tracks
    hcg = run(["vcf2bed", "-t", "hcg", str(d / "nome.vcf")]).stdout
    gch = run(["vcf2bed", "-t", "gch", str(d / "nome.vcf")]).stdout
    assert hcg and gch
    (d / "hcg.bed").write_text(hcg)
    merged = run(["mergecg", "-N", fa, str(d / "hcg.bed")]).stdout
    assert merged
    # NOMe epiread has a GC column
    epi = run(["epiread", "-N", fa, str(d / "aln.bam")]).stdout
    for line in epi.splitlines()[:10]:
        f = line.split("\t")
        assert len(f) == 9
        assert f[7] != "."  # GC RLE string populated in NOMe mode
    # old NOMe epiread has HCG + GCH columns
    old = run(["epiread", "-N", "-O", fa, str(d / "aln.bam")]).stdout
    assert old


def test_somatic_pileup(data):
    d, fa = data
    r = run(["pileup", "-S", "-T", str(d / "aln.bam"), "-I", str(d / "aln.bam"),
             "-o", str(d / "som.vcf"), fa])
    txt = (d / "som.vcf").read_text()
    assert "##INFO=<ID=SS" in txt
    body = [l for l in txt.splitlines() if not l.startswith("#")]
    # two samples -> two FORMAT columns
    assert all(len(l.split("\t")) == 11 for l in body[:20])
    assert any(";SS=" in l for l in body), "somatic status should be annotated somewhere"


def test_tview_dump(data):
    d, fa = data
    r = run(["tview", "-g", "chr1:200", "-w", "60", fa, str(d / "aln.bam")])
    lines = r.stdout.splitlines()
    assert lines[0].startswith("chr1:200-")
    assert len(lines[1]) == 60  # reference line
    assert len(lines) > 2       # some reads shown
    body = "\n".join(lines[2:])
    assert any(c in body for c in ".,")


def test_tview_color_modes(data):
    """All four color modes (-c t/m/b/n) dump deterministic per-cell attr
    lines (tview.c:346-371,460-480,503-519): digit = color pair, letter
    A-J = pair+underline."""
    d, fa = data
    outs = {}
    for mode in "tmbn":
        r = run(["tview", "-g", "chr1:200", "-w", "60", "-c", mode,
                 str(d / "aln.bam"), fa])
        lines = r.stdout.splitlines()
        assert lines[0].startswith("chr1:200-")
        assert len(lines[1]) == 60          # reference line
        assert len(lines[2]) <= 60          # its attr line
        outs[mode] = lines

    # bisulfite: reference C/G colored 1 (blue) or I (CpG red+underline)
    ref_attr_t = outs["t"][2]
    ref_line = outs["t"][1]
    for i, c in enumerate(ref_line):
        if c in "CG":
            assert ref_attr_t[i] in "1I", (i, c, ref_attr_t[i])
        else:
            assert ref_attr_t[i] == ".", (i, c)
    assert "I" in ref_attr_t                # at least one CpG in 60bp

    # nucleotide mode: ref attrs = base int + 5, every base colored
    ref_attr_n = outs["n"][2]
    want = {"A": "5", "C": "6", "G": "7", "T": "8", "N": "9"}
    assert all(ref_attr_n[i] == want[c] for i, c in enumerate(ref_line))

    # mapq mode: read rows get a single read-level pair 1-4 (dots aside)
    seen_pairs = set()
    for attr_line in outs["m"][4::2]:
        seen_pairs |= set(attr_line) - {"."}
    assert seen_pairs and seen_pairs <= set("1234ABCD")

    # baseq mode: per-base pairs 1-4
    seen_b = set()
    for attr_line in outs["b"][4::2]:
        seen_b |= set(attr_line) - {"."}
    assert seen_b and seen_b <= set("1234ABCD")

    # read char lines identical across NON-bisulfite modes (bisulfite mode
    # additionally exempts queried cytosines from the dot view, so its
    # char lines legitimately differ)
    assert outs["m"][3::2] == outs["n"][3::2] == outs["b"][3::2]


def test_verbose_pileup(data):
    d, fa = data
    r = run(["pileup", "-v", "1", "-o", str(d / "verb.vcf"), fa, str(d / "aln.bam")])
    txt = (d / "verb.vcf").read_text()
    assert "DIAGNOSE" in txt
    assert ";Bs0=" in txt or ";Bs1=" in txt


def test_epiread_modbam(tmp_path):
    """epiread -M: MM/ML (modBAM, ONT-style) methylation calls instead of
    bisulfite conversion (epiread.c:586-617,757-774 equivalents)."""
    import subprocess
    import sys
    from conftest import REPO

    # genome with CpGs at fixed spots
    unit = "AACGTTTAGG"             # CpG at offset 2 (0-based)
    genome = unit * 30
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1\n" + genome + "\n")
    # unconverted read matching the first 40 bp; C's at 2,12,22,32 (CpGs)
    read = genome[:40]
    # MM: skip the first C (it falls in the 5'-end filter region), mark the
    # 2nd (pos 12, high prob -> M) and 3rd (pos 22, low prob -> U)
    sam = tmp_path / "m.sam"
    sam.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:chr1\tLN:%d\n" % len(genome)
        + "\t".join([
            "r1", "0", "chr1", "1", "60", "40M", "*", "0", "0", read,
            "I" * 40, "NM:i:0", "MM:Z:C+m,1,0;", "ML:B:C,250,5",
        ]) + "\n")
    run = lambda a: subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli"] + a, capture_output=True,
        text=True, cwd=REPO)
    r = run(["sort", "-o", str(tmp_path / "m.bam"), str(sam)])
    assert r.returncode == 0, r.stderr[-500:]
    r = run(["epiread", "-M", str(fa), str(tmp_path / "m.bam")])
    assert r.returncode == 0, r.stderr[-800:]
    lines = [l for l in r.stdout.splitlines() if l]
    assert len(lines) == 1, r.stdout
    cols = lines[0].split("\t")
    rle = cols[6]
    # first modified C (prob 250/256 -> M), second listed C (prob 5/256 -> U)
    assert "M" in rle and "U" in rle, rle


def test_nome_bed_tracks(data):
    """NOMe bed chain: vcf2bed -t hcg/gch on a NOMe VCF + mergecg -N."""
    import subprocess
    import sys
    from conftest import REPO

    d, fa = data
    run = lambda a: subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli"] + a, capture_output=True,
        text=True, cwd=REPO)
    nome = run(["pileup", "-N", fa, str(d / "aln.bam")])
    assert nome.returncode == 0
    (d / "nome.vcf").write_text(nome.stdout)
    hcg = run(["vcf2bed", "-t", "hcg", str(d / "nome.vcf")])
    gch = run(["vcf2bed", "-t", "gch", str(d / "nome.vcf")])
    assert hcg.returncode == 0 and gch.returncode == 0
    assert hcg.stdout and gch.stdout
    for l in hcg.stdout.splitlines()[:20]:
        c = l.split("\t")
        assert int(c[2]) == int(c[1]) + 1 and 0 <= float(c[3]) <= 1
    (d / "hcg.bed").write_text(hcg.stdout)
    merged = run(["mergecg", "-N", fa, str(d / "hcg.bed")])
    assert merged.returncode == 0 and merged.stdout
    # HCG rows merge to 2-bp CpG records with C/G support columns
    first = merged.stdout.splitlines()[0].split("\t")
    assert int(first[2]) - int(first[1]) == 2 and first[5].startswith("C:")
