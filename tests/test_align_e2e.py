"""End-to-end align parity: byte-identical SAM vs the reference oracle."""
import subprocess
import sys

import pytest

from conftest import REPO


def run_mine(args, cwd=REPO):
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + args,
                       capture_output=True, text=True, cwd=cwd)
    assert r.returncode == 0, r.stderr[-2000:]
    return "\n".join(l for l in r.stdout.splitlines() if not l.startswith("@PG"))


def run_oracle(oracle, args):
    r = subprocess.run([oracle] + args, capture_output=True, text=True)
    assert r.returncode == 0
    return "\n".join(l for l in r.stdout.splitlines() if not l.startswith("@PG"))


def _diff_report(ref, mine):
    rl, ml = ref.splitlines(), mine.splitlines()
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(rl, ml)) if a != b]
    msg = f"{len(bad)} differing lines of {len(rl)}"
    for i, a, b in bad[:3]:
        msg += f"\nline {i}:\nref : {a}\nmine: {b}"
    return msg


def test_se_parity(small_dataset, oracle):
    d = small_dataset
    fa = str(d / "genome.fa")
    run_mine(["index", fa])
    mine = run_mine(["align", fa, str(d / "reads.fq")])
    with open(d / "oracle.sam") as f:
        ref = "\n".join(l for l in f.read().splitlines() if not l.startswith("@PG"))
    assert mine == ref, _diff_report(ref, mine)


@pytest.fixture(scope="module")
def pe_dataset(tmp_path_factory, oracle):
    d = tmp_path_factory.mktemp("pe")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "50000", "--n-reads", "250", "--pe", "--seed", "5"],
        check=True, capture_output=True)
    subprocess.run([oracle, "index", str(d / "genome.fa")], check=True,
                   capture_output=True)
    subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli", "index", str(d / "genome.fa")],
        check=True, capture_output=True, cwd=REPO)
    return d


def test_pe_parity_directional(pe_dataset, oracle):
    d = pe_dataset
    fa = str(d / "genome.fa")
    args = ["align", "-b", "1", fa, str(d / "reads_1.fq"), str(d / "reads_2.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_pe_parity_nondirectional(pe_dataset, oracle):
    d = pe_dataset
    fa = str(d / "genome.fa")
    args = ["align", fa, str(d / "reads_1.fq"), str(d / "reads_2.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_literal_read_parity(small_dataset, oracle):
    d = small_dataset
    fa = str(d / "genome.fa")
    with open(d / "reads.fq") as f:
        lines = f.read().splitlines()
    for i in [1, 5, 9]:
        read = lines[i * 4 + 1]
        ref = run_oracle(oracle, ["align", "-1", read, fa])
        mine = run_mine(["align", "-1", read, fa])
        assert mine == ref


FLAG_MATRIX = [
    ["-Y"],                 # soft-clip supplementary
    ["-a"],                 # output all alignments
    ["-T", "20"],           # lower output score threshold
    ["-k", "25"],           # longer min seed
    ["-A", "2"],            # match-score rescaling of dependent penalties
    ["-f", "1"],            # restrict to BSW strand
    ["-b", "3"],            # daughter-only policy
    ["-L", "3,7"],          # asymmetric clip penalties
    ["-z", "20"],           # quality-clip read ends
    ["-5", "2", "-3", "2"],  # fixed end clips
    ["-M"],                 # mark shorter split hits secondary
]


@pytest.mark.parametrize("flags", FLAG_MATRIX,
                         ids=[" ".join(f) for f in FLAG_MATRIX])
def test_se_flag_parity(small_dataset, oracle, flags):
    """Option matrix: each flag combination must stay byte-identical to the
    reference aligner."""
    d = small_dataset
    fa = str(d / "genome.fa")
    args = ["align"] + flags + [fa, str(d / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


@pytest.fixture(scope="module")
def alt_dataset(tmp_path_factory, oracle):
    """Genome whose second contig is chr1_alt: exercises ALT auto-inference,
    alt_sc propagation and the PA/XB alt accounting."""
    d = tmp_path_factory.mktemp("alt")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "60000", "--n-reads", "300", "--n-chroms", "2",
         "--seed", "17"],
        check=True, capture_output=True)
    fa = d / "genome.fa"
    txt = fa.read_text().replace(">chr2", ">chr1_alt")
    # make the alt contig partially homologous to chr1 so reads hit both
    lines = txt.splitlines()
    fa.write_text("\n".join(lines) + "\n")
    subprocess.run([oracle, "index", str(fa)], check=True, capture_output=True)
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "index", str(fa)],
                   check=True, capture_output=True, cwd=REPO)
    return d


def test_alt_contig_parity(alt_dataset, oracle):
    d = alt_dataset
    fa = str(d / "genome.fa")
    args = ["align", fa, str(d / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)
    # -j ignores ALT status; -i disables inference — both must match too
    for extra in (["-j"], ["-i"]):
        args = ["align"] + extra + [fa, str(d / "reads.fq")]
        assert run_mine(args) == run_oracle(oracle, args)


@pytest.fixture(scope="module")
def long_read_dataset(tmp_path_factory, oracle):
    d = tmp_path_factory.mktemp("longreads")
    subprocess.run(
        [sys.executable, f"{REPO}/tools/make_testdata.py", str(d),
         "--genome-size", "80000", "--n-reads", "150", "--read-len", "250",
         "--seed", "23"],
        check=True, capture_output=True)
    subprocess.run([oracle, "index", str(d / "genome.fa")], check=True,
                   capture_output=True)
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "index",
                    str(d / "genome.fa")], check=True, capture_output=True,
                   cwd=REPO)
    return d


def test_long_read_parity(long_read_dataset, oracle):
    d = long_read_dataset
    fa = str(d / "genome.fa")
    args = ["align", fa, str(d / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


FLAG_MATRIX2 = [
    ["-O", "8,4"],          # asymmetric gap-open
    ["-E", "2,3"],          # asymmetric gap-extend
    ["-w", "50"],           # narrower band
    ["-d", "50"],           # tighter z-drop
    ["-r", "2.5"],          # re-seeding factor
    ["-y", "5"],            # 3rd-round seeding cutoff
    ["-c", "100"],          # max seed occurrence
    ["-D", "0.3"],          # chain drop ratio
    ["-W", "40"],           # min chain weight (C++ worker1 fallback gate)
    ["-e"],                 # discard full-length exact matches
    ["-q"],                 # keep supplementary mapq
]


@pytest.mark.parametrize("flags", FLAG_MATRIX2,
                         ids=[" ".join(f) for f in FLAG_MATRIX2])
def test_se_flag_parity2(small_dataset, oracle, flags):
    d = small_dataset
    fa = str(d / "genome.fa")
    args = ["align"] + flags + [fa, str(d / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


PE_FLAG_MATRIX = [
    ["-I", "400,50"],       # explicit insert-size spec
    ["-P"],                 # no pairing
    ["-S"],                 # no mate rescue
    ["-S", "-P"],           # neither
    ["-U", "9"],            # unpaired penalty
    ["-T", "20"],
]


@pytest.mark.parametrize("flags", PE_FLAG_MATRIX,
                         ids=[" ".join(f) for f in PE_FLAG_MATRIX])
def test_pe_flag_parity(pe_dataset, oracle, flags):
    d = pe_dataset
    fa = str(d / "genome.fa")
    args = (["align"] + flags
            + [fa, str(d / "reads_1.fq"), str(d / "reads_2.fq")])
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


@pytest.fixture(scope="module")
def tricky_dataset(small_dataset, tmp_path_factory):
    """Derived read sets: N runs injected, too-short reads, comments,
    gzipped input, and an interleaved file for smart pairing."""
    import gzip as _gzip
    import random

    d = tmp_path_factory.mktemp("tricky")
    src = (small_dataset / "reads.fq").read_text().splitlines()
    rng = random.Random(99)
    out = []
    for i in range(0, len(src), 4):
        name, seq, plus, qual = src[i], src[i + 1], src[i + 2], src[i + 3]
        if i // 4 % 5 == 1:  # N run in the middle
            p = rng.randrange(10, len(seq) - 15)
            n = rng.randrange(1, 6)
            seq = seq[:p] + "N" * n + seq[p + n:]
        elif i // 4 % 5 == 2:  # truncate below min seed length
            seq = seq[:rng.randrange(5, 18)]
            qual = qual[:len(seq)]
        elif i // 4 % 5 == 3:  # leading/trailing N
            seq = "NN" + seq[2:-2] + "NN"
        out += [name, seq, plus, qual]
    (d / "tricky.fq").write_text("\n".join(out) + "\n")
    with _gzip.open(d / "tricky.fq.gz", "wt") as f:
        f.write("\n".join(out) + "\n")
    # comments on read names
    com = []
    for i in range(0, len(src), 4):
        com += [src[i] + " BC:Z:ACGT extra", src[i + 1], src[i + 2], src[i + 3]]
    (d / "comments.fq").write_text("\n".join(com) + "\n")
    return d


def test_n_and_short_read_parity(small_dataset, tricky_dataset, oracle):
    fa = str(small_dataset / "genome.fa")
    args = ["align", fa, str(tricky_dataset / "tricky.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_gzip_input_parity(small_dataset, tricky_dataset, oracle):
    fa = str(small_dataset / "genome.fa")
    args = ["align", fa, str(tricky_dataset / "tricky.fq.gz")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_comment_copy_parity(small_dataset, tricky_dataset, oracle):
    fa = str(small_dataset / "genome.fa")
    for flags in ([], ["-C"]):
        args = ["align"] + flags + [fa, str(tricky_dataset / "comments.fq")]
        ref = run_oracle(oracle, args)
        mine = run_mine(args)
        assert mine == ref, _diff_report(ref, mine)


def test_smart_pairing_parity(pe_dataset, oracle, tmp_path_factory):
    d = pe_dataset
    fa = str(d / "genome.fa")
    r1 = (d / "reads_1.fq").read_text().splitlines()
    r2 = (d / "reads_2.fq").read_text().splitlines()
    inter = []
    for i in range(0, len(r1), 4):
        inter += r1[i:i + 4] + r2[i:i + 4]
    t = tmp_path_factory.mktemp("smart")
    (t / "interleaved.fq").write_text("\n".join(inter) + "\n")
    args = ["align", "-p", fa, str(t / "interleaved.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_barcode_umi_parity(small_dataset, oracle, tmp_path):
    """-9: inline barcode/UMI extraction from read names (CB/RX tags)."""
    src = (small_dataset / "reads.fq").read_text().splitlines()
    out = []
    for i in range(0, len(src), 4):
        out += [src[i].split()[0] + "_ACGTACGT_TTGGCCAA",
                src[i + 1], src[i + 2], src[i + 3]]
    fq = tmp_path / "bc.fq"
    fq.write_text("\n".join(out) + "\n")
    fa = str(small_dataset / "genome.fa")
    args = ["align", "-9", fa, str(fq)]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine and mine == ref, _diff_report(ref, mine)


def test_pe_tricky_read_parity(pe_dataset, oracle, tmp_path):
    """PE with N runs / truncated mates — pairing and rescue must survive
    degenerate ends byte-identically."""
    import random

    rng = random.Random(7)
    for mate in ("1", "2"):
        src = (pe_dataset / f"reads_{mate}.fq").read_text().splitlines()
        out = []
        for i in range(0, len(src), 4):
            name, seq, plus, qual = src[i:i + 4]
            k = i // 4 % 6
            if k == 1:
                p = rng.randrange(10, len(seq) - 15)
                seq = seq[:p] + "N" * rng.randrange(1, 5) + seq[p + 4:]
                qual = qual[:len(seq)]
            elif k == 2 and mate == "2":
                seq = seq[:rng.randrange(8, 17)]
                qual = qual[:len(seq)]
            out += [name, seq, plus, qual]
        (tmp_path / f"t_{mate}.fq").write_text("\n".join(out) + "\n")
    fa = str(pe_dataset / "genome.fa")
    args = ["align", fa, str(tmp_path / "t_1.fq"), str(tmp_path / "t_2.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


@pytest.fixture(scope="module")
def indel_dataset(small_dataset, tmp_path_factory):
    """Reads with deletions, insertions, and chimeric halves: the simulator
    only makes substitutions, so indel CIGARs (I/D ops, MD ^-runs, band
    growth, D-squeeze) and supplementary/soft-clip emission were otherwise
    untouched by E2E."""
    import random

    rng = random.Random(4242)
    genome = {}
    name = None
    for line in (small_dataset / "genome.fa").read_text().splitlines():
        if line.startswith(">"):
            name = line[1:].split()[0]
            genome[name] = []
        else:
            genome[name].append(line)
    genome = {k: "".join(v) for k, v in genome.items()}

    def bis_convert(s, strand):
        # parent C->T (f) or daughter G->A (r) fully converted read
        if strand == "f":
            return s.upper().replace("C", "T")
        return s.upper().replace("G", "A")

    reads = []
    chroms = list(genome)
    for i in range(300):
        chrom = chroms[i % len(chroms)]
        g = genome[chrom]
        p = rng.randrange(0, len(g) - 160)
        frag = g[p:p + 120]
        kind = i % 4
        if kind == 0:   # deletion of 1-8 bp
            dpos = rng.randrange(20, 80)
            dlen = rng.randrange(1, 9)
            frag = frag[:dpos] + frag[dpos + dlen:]
        elif kind == 1:  # insertion of 1-6 random bp
            ipos = rng.randrange(20, 80)
            ins = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 7)))
            frag = frag[:ipos] + ins + frag[ipos:]
        elif kind == 2:  # chimera: prefix from elsewhere (soft clips)
            q = rng.randrange(0, len(g) - 60)
            frag = g[q:q + 35] + frag[:85]
        read = bis_convert(frag[:100], "f")
        reads.append((f"ind{i}", read))
    d = tmp_path_factory.mktemp("indel")
    with open(d / "reads.fq", "w") as f:
        for n, s in reads:
            f.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    return d


def test_indel_read_parity(small_dataset, indel_dataset, oracle):
    fa = str(small_dataset / "genome.fa")
    args = ["align", fa, str(indel_dataset / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)
    # the dataset must actually produce indel and clipped CIGARs
    cigs = [l.split("\t")[5] for l in mine.splitlines() if not l.startswith("@")]
    assert any("D" in c for c in cigs), "no deletions exercised"
    assert any("I" in c for c in cigs), "no insertions exercised"
    assert any("S" in c for c in cigs), "no soft clips exercised"


# ---------------------------------------------------------------------------
# -x read-type presets (align.c:476-512) and -v debug traces
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["intractg", "pacbio", "pbref", "ont2d", "pbread"])
def test_x_preset_parity(small_dataset, oracle, mode):
    fa = str(small_dataset / "genome.fa")
    args = ["align", "-x", mode, fa, str(small_dataset / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


@pytest.mark.parametrize("flags", [["-x", "pacbio", "-B", "2"],
                                   ["-x", "intractg", "-O", "5", "-L", "3"],
                                   ["-x", "ont2d", "-k", "10"]])
def test_x_preset_override_parity(small_dataset, oracle, flags):
    """Explicit flags beat the preset field-by-field (align.c opt0 guards)."""
    fa = str(small_dataset / "genome.fa")
    args = ["align"] + flags + [fa, str(small_dataset / "reads.fq")]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_x_preset_unknown_errors(small_dataset):
    fa = str(small_dataset / "genome.fa")
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "align",
                        "-x", "nonsense", fa, str(small_dataset / "reads.fq")],
                       capture_output=True, text=True, cwd=REPO)
    assert r.returncode != 0
    assert "unknown read type" in r.stderr


def test_verbose4_trace_parity_se(small_dataset, oracle, tmp_path):
    """-v 4 per-read seed/chain/extension/marking traces byte-match the
    reference's bwa_verbose>=4 stdout (memchain.c/mem_alnreg*.c dumps)."""
    fa = str(small_dataset / "genome.fa")
    fq = tmp_path / "sub.fq"
    with open(small_dataset / "reads.fq") as f:
        lines = f.read().splitlines()
    fq.write_text("\n".join(lines[:80]) + "\n")
    args = ["align", "-v", "4", fa, str(fq)]
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)


def test_verbose8_trace_parity_pe(pe_dataset, oracle, tmp_path):
    """-v 8 adds the pairing-internals dumps (mem_pair.c:171-235)."""
    fa = str(pe_dataset / "genome.fa")
    fqs = []
    for end in (1, 2):
        sub = tmp_path / f"sub_{end}.fq"
        with open(pe_dataset / f"reads_{end}.fq") as f:
            lines = f.read().splitlines()
        sub.write_text("\n".join(lines[:80]) + "\n")
        fqs.append(str(sub))
    args = ["align", "-v", "8", fa] + fqs
    ref = run_oracle(oracle, args)
    mine = run_mine(args)
    assert mine == ref, _diff_report(ref, mine)
