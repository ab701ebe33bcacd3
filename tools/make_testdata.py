#!/usr/bin/env python3
"""Deterministic synthetic WGBS test-data generator.

Produces a random genome FASTA and bisulfite-converted single-end/paired-end
FASTQ reads for parity tests (vs the reference oracle in tools/oracle) and for
benchmarks. Directional protocol: a fragment comes from the bisulfite-converted
Watson ("parent", C->T, YD:f) or Crick ("daughter", G->A, YD:r) strand.

Usage: make_testdata.py OUTDIR [--genome-size N] [--n-reads N] [--read-len N]
                        [--seed N] [--pe] [--n-chroms N]
"""
import argparse
import os
import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 67: 71, 71: 67, 84: 65, 78: 78}


def revcomp(seq: np.ndarray) -> np.ndarray:
    comp = np.zeros(256, dtype=np.uint8)
    for k, v in COMP.items():
        comp[k] = v
    return comp[seq][::-1]


def make_genome(rng, size, n_chroms):
    chroms = {}
    per = size // n_chroms
    for c in range(n_chroms):
        # biased composition w/ elevated CpG density so methylation paths get
        # exercised; occasional N runs to exercise ambiguous-base handling
        seq = BASES[rng.choice(4, size=per, p=[0.29, 0.21, 0.21, 0.29])]
        # boost CpG: sprinkle CG dinucleotides
        n_cpg = per // 50
        pos = rng.choice(per - 2, size=n_cpg, replace=False)
        seq[pos] = ord("C")
        seq[pos + 1] = ord("G")
        if per > 2000:
            npos = rng.integers(100, per - 200)
            seq[npos : npos + rng.integers(5, 30)] = ord("N")
        chroms[f"chr{c+1}"] = seq
    return chroms


def bisulfite_convert(frag: np.ndarray, rng, meth_cpg=0.75, meth_cph=0.02, parent=True):
    """Convert a Watson-orientation fragment. parent=True: C->T on Watson;
    parent=False: G->A on Watson (i.e. C->T on Crick)."""
    out = frag.copy()
    if parent:
        c_pos = np.nonzero(frag == ord("C"))[0]
        is_cpg = np.zeros(len(c_pos), dtype=bool)
        valid = c_pos < len(frag) - 1
        is_cpg[valid] = frag[c_pos[valid] + 1] == ord("G")
        meth_p = np.where(is_cpg, meth_cpg, meth_cph)
        convert = rng.random(len(c_pos)) >= meth_p
        out[c_pos[convert]] = ord("T")
    else:
        g_pos = np.nonzero(frag == ord("G"))[0]
        is_cpg = np.zeros(len(g_pos), dtype=bool)
        valid = g_pos > 0
        is_cpg[valid] = frag[g_pos[valid] - 1] == ord("C")
        meth_p = np.where(is_cpg, meth_cpg, meth_cph)
        convert = rng.random(len(g_pos)) >= meth_p
        out[g_pos[convert]] = ord("A")
    return out


def add_errors(read: np.ndarray, rng, err=0.002):
    e_pos = np.nonzero(rng.random(len(read)) < err)[0]
    for p in e_pos:
        read[p] = BASES[rng.integers(4)]
    return read


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-size", type=int, default=200_000)
    ap.add_argument("--n-reads", type=int, default=2000)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--pe", action="store_true")
    ap.add_argument("--n-chroms", type=int, default=2)
    ap.add_argument("--snp-rate", type=float, default=0.0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    chroms = make_genome(rng, args.genome_size, args.n_chroms)

    fa = os.path.join(args.outdir, "genome.fa")
    with open(fa, "w") as f:
        for name, seq in chroms.items():
            f.write(f">{name}\n")
            s = seq.tobytes().decode()
            for i in range(0, len(s), 70):
                f.write(s[i : i + 70] + "\n")

    # individual genome with optional SNPs (reads are drawn from this)
    sample = {n: s.copy() for n, s in chroms.items()}
    if args.snp_rate > 0:
        for n, s in sample.items():
            pos = np.nonzero(rng.random(len(s)) < args.snp_rate)[0]
            for p in pos:
                if s[p] != ord("N"):
                    s[p] = BASES[(np.searchsorted(BASES, s[p]) + rng.integers(1, 4)) % 4]

    names = list(sample.keys())
    qual = "I" * args.read_len
    L = args.read_len
    isize_mean, isize_sd = 300, 30

    def frag_at():
        c = names[rng.integers(len(names))]
        seq = sample[c]
        flen = L if not args.pe else max(2 * L, int(rng.normal(isize_mean, isize_sd)))
        if len(seq) <= flen + 2:
            return None
        p = rng.integers(0, len(seq) - flen)
        frag = seq[p : p + flen]
        if np.any(frag == ord("N")):
            return None
        return c, p, frag

    r1_path = os.path.join(args.outdir, "reads_1.fq" if args.pe else "reads.fq")
    r2_path = os.path.join(args.outdir, "reads_2.fq")
    f1 = open(r1_path, "w")
    f2 = open(r2_path, "w") if args.pe else None
    n = 0
    while n < args.n_reads:
        hit = frag_at()
        if hit is None:
            continue
        c, p, frag = hit
        parent = bool(rng.integers(2))  # True: Watson/OT (YD:f)
        conv = bisulfite_convert(frag, rng, parent=parent)
        name = f"read{n}:{c}:{p}:{'f' if parent else 'r'}"
        if args.pe:
            # R1 from the 5' end of the BS strand, R2 revcomp from the 3' end
            if parent:
                r1 = conv[:L].copy()
                r2 = revcomp(conv[-L:])
            else:
                r1 = revcomp(conv[-L:])
                r2 = conv[:L].copy()
            f1.write(f"@{name}\n{add_errors(r1, rng).tobytes().decode()}\n+\n{qual}\n")
            f2.write(f"@{name}\n{add_errors(r2, rng).tobytes().decode()}\n+\n{qual}\n")
        else:
            read = conv if parent else revcomp(conv)
            f1.write(f"@{name}\n{add_errors(read.copy(), rng).tobytes().decode()}\n+\n{qual}\n")
        n += 1
    f1.close()
    if f2:
        f2.close()
    print(f"wrote {fa} and {args.n_reads} reads to {args.outdir}")


if __name__ == "__main__":
    main()
