"""biscuit cinread port (/root/reference/src/cinread.c): long-form
per-cytosine-in-read table; feeds read-position retention QC."""
import getopt
import sys
from dataclasses import dataclass, field

from ..io.sambam import (AlignmentFile, AlnRecord, FLAG_READ2, FLAG_REVERSE,
                         FLAG_SECONDARY, FLAG_UNMAP)
from ..pileup.common import RefCache, fivenuc_context, get_bsstrand

TP_NAMES = ["QNAME", "QPAIR", "STRAND", "BSSTRAND", "MAPQ", "QBEG", "QEND",
            "CHRM", "CRPOS", "CGRPOS", "CQPOS", "CRBASE", "CCTXT", "CQBASE",
            "CRETENTION"]
TGT_NAMES = ["c", "cg", "ch", "hcg", "gch", "hch"]
SL_C, SL_CG, SL_CH, SL_HCG, SL_GCH, SL_HCH = range(6)
CIN_READ_LEN = 301


@dataclass
class CinreadConf:
    tgt: int = SL_CG
    tp_names: list = field(default_factory=lambda: ["QNAME", "QPAIR", "BSSTRAND",
                                                    "CRBASE", "CQBASE"])
    skip_secondary: int = 1
    skip_printing: int = 0


@dataclass
class CinreadData:
    counts: dict = field(default_factory=dict)  # (read, qpos, state) -> n


def cinread_func(b: AlnRecord, rs: RefCache, conf: CinreadConf,
                 d: CinreadData, names, out) -> None:
    if b.flag & FLAG_UNMAP:
        return
    if conf.skip_secondary and (b.flag & FLAG_SECONDARY):
        return
    rs.fetch(names[b.tid], max(1, b.pos - 10), b.pos + b.rlen() + 10)
    bsstrand = get_bsstrand(rs, b, 0, 0)
    seq = b.seq
    l_qseq = b.l_qseq
    rpos = b.pos + 1
    qpos = 0
    for op, oplen in b.cigar:
        if op in (0, 7, 8):
            for j in range(oplen):
                rb = rs.getbase_upcase(rpos + j)
                if rb not in ("C", "G"):
                    continue
                if bsstrand and rb == "C":
                    continue
                if not bsstrand and rb == "G":
                    continue
                _ctxt, fivenuc = fivenuc_context(rs, rpos + j, rb)
                is_tgt = False
                if conf.tgt == SL_C:
                    is_tgt = True
                elif conf.tgt == SL_CG:
                    is_tgt = fivenuc[3] == "G"
                elif conf.tgt == SL_CH:
                    is_tgt = fivenuc[3] != "G"
                elif conf.tgt == SL_HCG:
                    is_tgt = fivenuc[3] == "G" and fivenuc[1] != "G"
                elif conf.tgt == SL_GCH:
                    is_tgt = fivenuc[3] != "G" and fivenuc[1] == "G"
                elif conf.tgt == SL_HCH:
                    is_tgt = fivenuc[3] != "G" and fivenuc[1] != "G"
                if not is_tgt:
                    continue
                qb = (seq[qpos + j] if qpos + j < len(seq) else "N").upper()
                if bsstrand and rb == "G":
                    retention = "R" if qb == "G" else ("C" if qb == "A" else "N")
                elif not bsstrand and rb == "C":
                    retention = "R" if qb == "C" else ("C" if qb == "T" else "N")
                else:
                    retention = "N"
                idx_read = 1 if (b.flag & FLAG_READ2) else 0
                idx_qpos = (l_qseq - qpos - j) if (b.flag & FLAG_REVERSE) else (qpos + j)
                idx_retn = {"C": 0, "R": 1}.get(retention, 2)
                if idx_qpos > CIN_READ_LEN:
                    continue
                key = (idx_read, idx_qpos, idx_retn)
                d.counts[key] = d.counts.get(key, 0) + 1
                if not conf.skip_printing:
                    cols = []
                    for name in conf.tp_names:
                        if name == "QNAME":
                            cols.append(b.qname)
                        elif name == "QPAIR":
                            cols.append("2" if (b.flag & FLAG_READ2) else "1")
                        elif name == "QBEG":
                            cols.append(str(b.pos + 1))
                        elif name == "QEND":
                            cols.append(str(b.pos + b.rlen()))
                        elif name == "STRAND":
                            cols.append("-" if (b.flag & FLAG_REVERSE) else "+")
                        elif name == "BSSTRAND":
                            cols.append("-" if bsstrand else "+")
                        elif name == "MAPQ":
                            cols.append(str(b.mapq))
                        elif name == "CHRM":
                            cols.append(names[b.tid])
                        elif name == "CRPOS":
                            cols.append(str(rpos + j))
                        elif name == "CGRPOS":
                            if fivenuc[3] == "G":
                                cols.append(str(rpos + j) if rb == "C" else str(rpos + j - 1))
                            else:
                                cols.append("-1")
                        elif name == "CQPOS":
                            cols.append(str((l_qseq - qpos - j) if (b.flag & FLAG_REVERSE) else (qpos + j)))
                        elif name == "CRBASE":
                            cols.append(rb)
                        elif name == "CCTXT":
                            cols.append(fivenuc[:5])
                        elif name == "CQBASE":
                            cols.append(qb)
                        elif name == "CRETENTION":
                            cols.append(retention)
                    out.write("\t".join(cols) + "\n")
            rpos += oplen
            qpos += oplen
        elif op == 1 or op == 4:
            qpos += oplen
        elif op == 2:
            rpos += oplen
        elif op == 5:
            qpos += oplen
            l_qseq += oplen  # c->l_qseq excludes hard clips; add back
        else:
            raise SystemExit(f"Unknown cigar, {op}")


def main(argv):
    conf = CinreadConf()
    reg = None
    outfn = None
    tgt_str = None
    tp_str = None
    opts, args = getopt.getopt(argv, "g:o:t:p:sh")
    for o, a in opts:
        if o == "-g": reg = a
        elif o == "-o": outfn = a
        elif o == "-t": tgt_str = a
        elif o == "-p": tp_str = a
        elif o == "-s": conf.skip_secondary = 0
        elif o == "-h":
            print("Usage: biscuit_tpu cinread [options] <ref.fa> <in.bam>",
                  file=sys.stderr)
            return 1
    if tgt_str:
        if tgt_str not in TGT_NAMES:
            print(f"Target name {tgt_str} unrecognized.", file=sys.stderr)
            return 1
        conf.tgt = TGT_NAMES.index(tgt_str)
    if tp_str:
        conf.tp_names = []
        for p in tp_str.split(","):
            if p not in TP_NAMES:
                print(f"Print name {p} unrecognized.", file=sys.stderr)
                return 1
            conf.tp_names.append(p)
    if len(args) < 2:
        print("Please provide reference and input bam.", file=sys.stderr)
        return 1
    rs = RefCache(args[0])
    bam = AlignmentFile(args[1])
    out = open(outfn, "w") if outfn else sys.stdout
    d = CinreadData()
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
        cinread_func(b, rs, conf, d, bam.header.names, out)
    if outfn:
        out.close()
    return 0
