#!/usr/bin/env python3
"""QC asset builder — the reference's scripts/build_biscuit_QC_assets.pl
rebuilt on this package (no perl, no external sort/gzip processes).

Produces, in --outdir:
  cpg.bed.gz                              every CpG (0-based 2-base rows)
  windows100bp.gc_content.top10p.bed.gz   top 10% GC 100bp windows
  windows100bp.gc_content.bot10p.bed.gz   bottom 10% GC 100bp windows

Semantics match the perl exactly: soft-masked CpGs count; windows with any
N or shorter than 100bp are dropped; GC fraction printed %.2f; the 10%
cut is round(0.1*n) of the byte-wise (LC_ALL=C) (gc, line) sort, head for
bot / tail for top; default chromosome filter chr[0-9]{1,2}|chrX|chrY|chrM
unless --include.
"""
import argparse
import gzip
import os
import re
import sys


def read_fasta(path):
    op = gzip.open if path.endswith(".gz") else open
    chrom, parts, out = None, [], []
    with op(path, "rt") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if chrom is not None:
                    out.append((chrom, "".join(parts)))
                chrom = re.sub(r"\s+.*", "", line[1:])
                parts = []
            else:
                parts.append(line)
    if chrom is not None:
        out.append((chrom, "".join(parts)))
    return out


STD_CHR = re.compile(r"^chr(\d{1,2}|X|Y|M)$")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-r", "--ref", required=True)
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("-i", "--include", action="store_true",
                    help="include non-standard chromosomes/contigs")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    seqs = sorted(read_fasta(args.ref))  # perl iterates sort keys %seq
    use = [(c, s) for c, s in seqs if args.include or STD_CHR.match(c)]

    with gzip.open(os.path.join(args.outdir, "cpg.bed.gz"), "wt") as cpg:
        for chrom, s in use:
            u = s.upper()
            i = u.find("CG")
            while i != -1:
                cpg.write(f"{chrom}\t{i}\t{i + 2}\n")
                i = u.find("CG", i + 1)

    W = 100
    rows = []  # (gc_str, line)
    for chrom, s in use:
        u = s.upper()
        for i in range(0, len(u) + 1, W):
            sub = u[i:i + W]
            if len(sub) != W or "N" in sub:
                continue
            gc = "%.2f" % ((sub.count("G") + sub.count("C")) / W)
            rows.append((gc, f"{chrom}\t{i}\t{i + W}\t{gc}\n"))
    # LC_ALL=C sort -k4,4n with full-line fallback on ties
    rows.sort(key=lambda r: (float(r[0]), r[1].encode()))
    ten = int(round(0.1 * len(rows)))

    def write_sorted(name, sel):
        # positional re-sort (sort -k1,1 -k2,2n, LC_ALL=C)
        sel = sorted(sel, key=lambda l: (l.split("\t")[0].encode(),
                                         int(l.split("\t")[1])))
        with gzip.open(os.path.join(args.outdir, name), "wt") as f:
            f.writelines(sel)

    write_sorted("windows100bp.gc_content.bot10p.bed.gz",
                 [l for _g, l in rows[:ten]])
    write_sorted("windows100bp.gc_content.top10p.bed.gz",
                 [l for _g, l in rows[-ten:]] if ten else [])
    print(f"wrote assets for {len(use)} contigs "
          f"({len(rows)} windows, 10% = {ten})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
