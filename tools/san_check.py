#!/usr/bin/env python3
"""One-command AddressSanitizer+UBSan pass over the whole native C++ surface.

Re-execs itself with libasan/libubsan preloaded and BISCUIT_TPU_SAN=1 (the
native loader then builds a separate -fsanitize=address,undefined .so), then
drives every native engine:

  - SE align, threaded (-@3)            align_host.cpp work-stealing path
  - PE align, threaded (-@3)            pair/rescue/mate-SW + pairing
  - raw-BAM pileup (C++ window engine)  pileup_native.cpp bt_bam_scan
  - epiread epiBED (C++ engine)
  - vcf2bed ctxt + mergecg native stream engines (streams_native.cpp)
  - sort + bamindex (BGZF/BAI paths touch native zlib glue only via Python,
    included for CIGAR variety in the BAMs fed to the scanners)

Any sanitizer finding aborts (-fno-sanitize-recover), so a zero exit means
a clean pass. Run:  python tools/san_check.py
"""
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reexec_with_asan():
    if os.environ.get("BISCUIT_TPU_SAN_CHILD") == "1":
        return
    libs = []
    for name in ("libasan.so", "libubsan.so"):
        p = subprocess.run(["g++", f"-print-file-name={name}"],
                           capture_output=True, text=True).stdout.strip()
        if p and os.path.sep in p:
            libs.append(os.path.realpath(p))
    if not libs:
        print("san_check: no libasan found next to g++", file=sys.stderr)
        sys.exit(2)
    env = dict(os.environ)
    env["LD_PRELOAD"] = ":".join(libs)
    env["BISCUIT_TPU_SAN"] = "1"
    env["BISCUIT_TPU_SAN_CHILD"] = "1"
    # Python itself leaks by design; halt_on_error comes from
    # -fno-sanitize-recover in the .so build
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["UBSAN_OPTIONS"] = "print_stacktrace=1:halt_on_error=1"
    env["PYTHONPATH"] = REPO
    # keep JAX off the tunnel and quiet under the sanitizer
    env["BISCUIT_TPU_PLATFORM"] = "cpu"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def run(args, **kw):
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli"] + args,
                       capture_output=True, text=True, cwd=REPO, **kw)
    if r.returncode != 0:
        print(f"san_check FAILED: {args}\n{r.stderr[-4000:]}", file=sys.stderr)
        sys.exit(1)
    return r.stdout


def main():
    reexec_with_asan()
    with tempfile.TemporaryDirectory(prefix="btsan_") as td:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_testdata.py"),
             td, "--genome-size", "60000", "--n-reads", "600", "--pe",
             "--seed", "5", "--n-chroms", "2", "--snp-rate", "0.002"],
            check=True, capture_output=True)
        fa = os.path.join(td, "genome.fa")
        print("[san] index ...")
        run(["index", fa])
        print("[san] SE align -@3 ...")
        sam_se = run(["align", "-@", "3", "-b", "1", fa,
                      os.path.join(td, "reads_1.fq")])
        print("[san] PE align -@3 ...")
        sam_pe = run(["align", "-@", "3", "-b", "1", fa,
                      os.path.join(td, "reads_1.fq"),
                      os.path.join(td, "reads_2.fq")])
        sam_path = os.path.join(td, "aln.sam")
        with open(sam_path, "w") as f:
            f.write(sam_pe)
        bam = os.path.join(td, "aln.bam")
        run(["sort", "-o", bam, sam_path])
        run(["bamindex", bam])
        # downstream runs single-process: the window fork pools hang under
        # ASan (fork-with-threads); -@1 keeps the native scan engines in
        # THIS instrumented process, which is the coverage that matters
        print("[san] pileup (native raw-BAM engine) ...")
        vcf = os.path.join(td, "out.vcf")
        run(["pileup", "-@", "1", "-o", vcf, fa, bam])
        print("[san] epiread (native epiBED engine) ...")
        run(["epiread", "-@", "1", fa, bam])
        print("[san] vcf2bed + mergecg (native stream engines) ...")
        bed = run(["vcf2bed", "-t", "cg", vcf])
        bed_path = os.path.join(td, "cg.bed")
        with open(bed_path, "w") as f:
            f.write(bed)
        run(["mergecg", fa, bed_path])
        print("[san] bsstrand/bsconv/qc (vectorized + native scan) ...")
        run(["bsstrand", fa, bam])
        run(["qc", fa, bam, os.path.join(td, "qc_out")])
        print("[san] epiread -M (modBAM MM/ML native parse, r3) ...")
        modsam = os.path.join(td, "mod.sam")
        seq = "ACGTCGATCGCGTACGCTAGCTCGCGATCGATCGGCTAGC"
        with open(sam_path) as f:
            hdr = "".join(l for l in f if l.startswith("@SQ") or
                          l.startswith("@HD"))
        with open(modsam, "w") as f:
            f.write(hdr)
            f.write("m0\t0\tchr1\t101\t60\t40M\t*\t0\t0\t" + seq +
                    "\tIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIII"
                    "\tNM:i:0\tMM:Z:C+m,0,1,0;\tML:B:C,250,5,128\n")
            f.write("m1\t16\tchr1\t201\t60\t40M\t*\t0\t0\t" + seq +
                    "\tIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIII"
                    "\tNM:i:0\tMM:Z:C+m?,2,0;\n")  # ML absent
        modbam_p = os.path.join(td, "mod.bam")
        run(["sort", "-o", modbam_p, modsam])
        run(["epiread", "-M", "-@", "1", fa, modbam_p])
        print("[san] bwt_merge (semi-external BWT builder, r3) ...")
        import numpy as np
        sys.path.insert(0, REPO)
        from biscuit_tpu import native
        rng = np.random.default_rng(7)
        for n, blk in ((5000, 64), (20000, 700), (999, 2)):
            text = rng.integers(0, 4, n).astype(np.uint8)
            native.bwt_merge(text, 4, blk)
        # periodic adversary (gamma fallback paths)
        native.bwt_merge(np.zeros(4096, np.uint8), 4, 100)
        del sam_se
    print("[san] CLEAN: no ASan/UBSan findings across the native surface")


if __name__ == "__main__":
    main()
