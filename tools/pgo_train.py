#!/usr/bin/env python3
"""PGO training workload: a miniature end-to-end run (index, SE + PE align,
sort, pileup, epiread) through the CLI so the instrumented native library
collects profiles for every hot path. Invoked by native.train_pgo(); each
subprocess exit flushes its .gcda into the profile directory."""
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, **kw):
    subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + args,
                   check=True, cwd=HERE, **kw)


def main():
    d = tempfile.mkdtemp(prefix="btpgo")
    subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "make_testdata.py"), d,
         "--genome-size", "150000", "--n-reads", "1200", "--pe", "--seed", "3"],
        check=True, capture_output=True)
    fa = os.path.join(d, "genome.fa")
    devnull = subprocess.DEVNULL
    run(["index", fa])
    with open(os.path.join(d, "se.sam"), "w") as f:
        run(["align", "-@", "4", fa, os.path.join(d, "reads_1.fq")], stdout=f)
    with open(os.path.join(d, "pe.sam"), "w") as f:
        run(["align", "-@", "4", fa, os.path.join(d, "reads_1.fq"),
             os.path.join(d, "reads_2.fq")], stdout=f)
    run(["sort", "-o", os.path.join(d, "pe.bam"), os.path.join(d, "pe.sam")])
    run(["bamindex", os.path.join(d, "pe.bam")])
    run(["pileup", "-o", os.path.join(d, "out.vcf"), fa,
         os.path.join(d, "pe.bam")], stdout=devnull, stderr=devnull)
    with open(os.path.join(d, "out.epibed"), "w") as f:
        run(["epiread", fa, os.path.join(d, "pe.bam")], stdout=f,
            stderr=devnull)


if __name__ == "__main__":
    main()
