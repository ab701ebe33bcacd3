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
