"""biscuit bsconv port (/root/reference/src/bsconv.c): per-read
retention/conversion counts stratified by 2-base context (CpA/C/G/T), read
filtering by CpH retention, ZN tag annotation or tab output.
"""
import getopt
import sys
from dataclasses import dataclass, field

from ..io.sambam import (AlignmentFile, AlnRecord, FLAG_QCFAIL, FLAG_UNMAP,
                         format_sam_record, write_bam, write_sam)
from ..pileup.common import (RefCache, char_to_int8, fivenuc_context,
                             get_bsstrand, iter_aligned_bases)


@dataclass
class BsconvConf:
    max_cph: int = -1
    max_cpa: int = -1
    max_cpc: int = -1
    max_cpt: int = -1
    max_cpy: int = -1
    max_cph_frac: float = 1.0
    max_cpy_frac: float = 1.0
    filter_u: int = 0
    show_filtered: int = 0
    print_in_tab: int = 0
    no_printing: int = 0


@dataclass
class BsconvData:
    n: int = 0
    n_filtered: int = 0
    retn_conv_counts: list = field(default_factory=lambda: [0] * 8)


A, C, G, T = 0, 1, 2, 3


def bsconv_func(b: AlnRecord, rs: RefCache, conf: BsconvConf, d: BsconvData,
                names):
    """Returns (tofilter, retn[4], conv[4]) and updates d; caller handles
    output."""
    retn = [0] * 5
    conv = [0] * 5
    tofilter = 0
    if (b.flag & FLAG_UNMAP) or (b.flag & FLAG_QCFAIL):
        tofilter = 1
    else:
        rs.fetch(names[b.tid], max(1, b.pos - 10), b.pos + b.rlen() + 10)
        bsstrand = get_bsstrand(rs, b, 0, conf.filter_u)
        if bsstrand == 2:
            tofilter = 1
        else:
            seq = b.seq
            for rpos, qpos in iter_aligned_bases(b):
                rb = rs.getbase_upcase(rpos)
                if rb not in ("C", "G"):
                    continue
                if bsstrand and rb == "C":
                    continue
                if not bsstrand and rb == "G":
                    continue
                _ctxt, fivenuc = fivenuc_context(rs, rpos, rb)
                qb = (seq[qpos] if qpos < len(seq) else "N").upper()
                nxt = char_to_int8(fivenuc[3])
                if bsstrand and rb == "G":
                    if qb == "G":
                        retn[nxt] += 1
                    elif qb == "A":
                        conv[nxt] += 1
                elif not bsstrand and rb == "C":
                    if qb == "C":
                        retn[nxt] += 1
                    elif qb == "T":
                        conv[nxt] += 1
            if conf.max_cpa >= 0 and retn[A] > conf.max_cpa:
                tofilter = 1
            if conf.max_cpc >= 0 and retn[C] > conf.max_cpc:
                tofilter = 1
            if conf.max_cpt >= 0 and retn[T] > conf.max_cpt:
                tofilter = 1
            if conf.max_cph >= 0 and retn[A] + retn[C] + retn[T] > conf.max_cph:
                tofilter = 1
            if conf.max_cpy >= 0 and retn[C] + retn[T] > conf.max_cpy:
                tofilter = 1
            if conf.max_cph_frac < 1.0:
                r = retn[A] + retn[C] + retn[T]
                cv = conv[A] + conv[C] + conv[T]
                if r + cv > 0 and r / (r + cv) > conf.max_cph_frac:
                    tofilter = 1
            if conf.max_cpy_frac < 1.0:
                r = retn[C] + retn[T]
                cv = conv[C] + conv[T]
                if r + cv > 0 and r / (r + cv) > conf.max_cpy_frac:
                    tofilter = 1
    d.n += 1
    if tofilter:
        d.n_filtered += 1
    show = tofilter
    if conf.show_filtered:
        show = not tofilter
    if show:
        return None  # filtered out
    if conf.no_printing:
        for i in range(4):
            d.retn_conv_counts[2 * i] += retn[i]
            d.retn_conv_counts[2 * i + 1] += conv[i]
        return None
    return retn, conv


def main(argv):
    conf = BsconvConf()
    reg = None
    opts, args = getopt.getopt(argv, "g:m:a:c:f:y:pt:x:uvh")
    for o, a in opts:
        cc = o[1]
        if cc == "g": reg = a
        elif cc == "m": conf.max_cph = int(a)
        elif cc == "f": conf.max_cph_frac = float(a)
        elif cc == "x": conf.max_cpy = int(a)
        elif cc == "y": conf.max_cpy_frac = float(a)
        elif cc == "a": conf.max_cpa = int(a)
        elif cc == "c": conf.max_cpc = int(a)
        elif cc == "t": conf.max_cpt = int(a)
        elif cc == "u": conf.filter_u = 1
        elif cc == "p": conf.print_in_tab = 1
        elif cc == "v": conf.show_filtered = 1
        elif cc == "h":
            print("Usage: biscuit_tpu bsconv [options] <ref.fa> <in.bam> [out.bam]",
                  file=sys.stderr)
            return 1
    if len(args) < 2:
        print("Please provide reference and input bam.", file=sys.stderr)
        return 1
    reffn, infn = args[0], args[1]
    outfn = args[2] if len(args) > 2 else "-"
    rs = RefCache(reffn)
    bam = AlignmentFile(infn)
    d = BsconvData()
    out_records = []
    it = bam
    if reg:
        name = reg.split(":")[0]
        tid = bam.header.name2tid(name)
        if ":" in reg:
            rng = reg.split(":", 1)[1].replace(",", "")
            beg, end = (int(x) for x in rng.split("-"))
        else:
            beg, end = 0, 1 << 29
        it = bam.fetch(tid, beg, end)
    for b in it:
        res = bsconv_func(b, rs, conf, d, bam.header.names)
        if res is None:
            continue
        retn, conv = res
        if conf.print_in_tab:
            cols = []
            for i in range(4):
                cols.append(f"{retn[i]}\t{conv[i]}")
            sys.stdout.write("\t".join(cols) + f"\t{b.qname}\n")
        else:
            zn = ",".join("C%c_R%dC%d" % ("ACGTN"[i], retn[i], conv[i])
                          for i in range(4))
            b.tags["ZN"] = ("Z", zn)
            if outfn == "-":
                sys.stdout.write(format_sam_record(b, bam.header) + "\n")
            else:
                out_records.append(b)
    if outfn not in ("-", None) and not conf.print_in_tab:
        if outfn.endswith(".sam"):
            write_sam(outfn, bam.header, out_records)
        else:
            write_bam(outfn, bam.header, out_records)
    print(f"\n[main_bsconv] Processed {d.n} reads, {d.n - d.n_filtered} "
          f"({(d.n - d.n_filtered) / d.n * 100 if d.n else 0:f}%) remains.",
          file=sys.stderr)
    return 0
