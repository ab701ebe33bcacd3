"""biscuit mergecg port (/root/reference/src/mergecg.c): merge
strand-symmetric C/G beta rows of a CpG into one record (count-space merge).
"""
import getopt
import gzip
import sys

from ..pileup.common import RefCache


class _Bed1:
    __slots__ = ("tid", "chrom", "beg", "end", "ref", "c_betas", "c_depts",
                 "g_betas", "g_depts", "nsamples")

    def __init__(self):
        self.tid = -1
        self.chrom = ""
        self.beg = 0
        self.end = 0
        self.ref = "N"
        self.nsamples = 0
        self.c_betas = []
        self.c_depts = []
        self.g_betas = []
        self.g_depts = []


def _parse_line(line, b: _Bed1, name2tid):
    f = line.rstrip("\n").split("\t")
    start = 7 if f[3] in ("C", "G") else 3
    n = (len(f) - start) // 2
    if n <= 0:
        raise SystemExit("No sample data identified.")
    b.chrom = f[0]
    b.tid = name2tid.setdefault(f[0], len(name2tid))
    b.beg = int(f[1])
    b.end = int(f[2])
    b.nsamples = n
    b.c_betas = []
    b.c_depts = []
    for i in range(n):
        v = f[start + 2 * i]
        b.c_betas.append(float(v) if v != "." else 0.0)
        b.c_depts.append(int(f[start + 1 + 2 * i]))
    b.g_betas = [0.0] * n
    b.g_depts = [0] * n


def _format_output(p: _Bed1, base_before, base_after, min_depth, show_mu, out):
    max_depth = 0
    for i in range(p.nsamples):
        max_depth = max(max_depth, p.c_depts[i] + p.g_depts[i])
    if max_depth == 0 or max_depth < min_depth:
        return
    beg, end = p.beg, p.end
    if p.ref == "C" and base_after == "G":
        end += 1
    elif p.ref == "G" and base_before == "C":
        beg -= 1
    parts = [f"{p.chrom}\t{beg}\t{end}"]
    for i in range(p.nsamples):
        cov = p.c_depts[i] + p.g_depts[i]
        if cov == 0:
            parts.append("\t.\t0\t0" if show_mu else "\t.\t0")
        else:
            c_ret = round(p.c_betas[i] * p.c_depts[i])
            g_ret = round(p.g_betas[i] * p.g_depts[i])
            m = int(c_ret + g_ret)
            if show_mu:
                parts.append(f"\t{int(round(m / cov * 100))}\t{m}\t{cov - m}")
            else:
                parts.append("\t%1.3f\t%d" % (m / cov, cov))
        if p.c_depts[i] == 0:
            parts.append("\tC:.:0")
        else:
            parts.append("\tC:%1.3f:%d" % (p.c_betas[i], p.c_depts[i]))
        if p.g_depts[i] == 0:
            parts.append(",G:.:0")
        else:
            parts.append(",G:%1.3f:%d" % (p.g_betas[i], p.g_depts[i]))
    out.write("".join(parts) + "\n")


def main(argv):
    nome_mode = False
    min_depth = 0
    show_mu = False
    opts, args = getopt.getopt(argv, "k:hNc")
    for o, a in opts:
        if o == "-N":
            nome_mode = True
        elif o == "-k":
            min_depth = int(a)
        elif o == "-c":
            show_mu = True
        elif o == "-h":
            print("Usage: biscuit_tpu mergecg [options] <ref.fa> <in.bed>", file=sys.stderr)
            return 1
    if len(args) < 2:
        print("Please supply reference file and sorted bed file.", file=sys.stderr)
        return 1
    rc = RefCache(args[0])
    name2tid = {}
    out = sys.stdout
    opener = gzip.open if args[1].endswith(".gz") else open
    p = None
    p_before = p_after = "N"
    with opener(args[1], "rt") as f:
        for line in f:
            if not line.strip():
                continue
            b = _Bed1()
            _parse_line(line, b, name2tid)
            rc.fetch(b.chrom, 1, len(rc.chroms[b.chrom]))
            b.ref = rc.getbase_upcase(b.end)
            b_before = "N" if b.end - 1 < 0 else rc.getbase_upcase(b.end - 1)
            b_after = "N" if b.end == rc.end else rc.getbase_upcase(b.end + 1)
            if b.ref == "G":
                b.g_betas, b.c_betas = b.c_betas, [0.0] * b.nsamples
                b.g_depts, b.c_depts = b.c_depts, [0] * b.nsamples
            if (p is not None and b.tid == p.tid and b.beg == p.beg + 1
                    and b.end == p.end + 1 and b.ref == "G" and p.ref == "C"
                    and (not nome_mode or (p_before != "G" and b_after != "C"))):
                if p.nsamples != b.nsamples:
                    raise SystemExit(f"Missing sample at {b.chrom}:{b.beg}-{b.end}.")
                p.g_betas = b.g_betas[:]
                p.g_depts = b.g_depts[:]
                b.tid = -1  # merged
            if p is not None and p.tid >= 0:
                _format_output(p, p_before, p_after, min_depth, show_mu, out)
            p = b
            p_before, p_after = b_before, b_after
    if p is not None and p.tid >= 0:
        _format_output(p, p_before, p_after, min_depth, show_mu, out)
    return 0
