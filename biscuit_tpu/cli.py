"""biscuit_tpu command-line interface.

Mirrors the reference subcommand table (/root/reference/src/main.c:106-159)
and per-subcommand getopt flags. Subcommands are added as they are built.
"""
import getopt
import math
import sys

import numpy as np

from . import __version__, REFERENCE_VERSION


def main_index(argv):
    from .index.build import build_index
    prefix = None
    opts, args = getopt.getopt(argv, "6a:p:h")
    for o, a in opts:
        if o == "-p":
            prefix = a
        elif o == "-h":
            print("Usage: biscuit_tpu index [options] <in.fasta>", file=sys.stderr)
            return 1
    if not args:
        print("Missing FASTA reference", file=sys.stderr)
        return 1
    fasta = args[0]
    if prefix is None:
        prefix = fasta
    build_index(fasta, prefix=prefix)
    return 0


def main_align(argv):
    from .config import (MemOpt, MEM_F_ALL, MEM_F_KEEP_SUPP_MAPQ, MEM_F_NO_MULTI,
                         MEM_F_NOPAIRING, MEM_F_NO_RESCUE, MEM_F_PE, MEM_F_REF_HDR,
                         MEM_F_SELF_OVLP, MEM_F_SMARTPE, MEM_F_SOFTCLIP)
    from .index.fasta import NT4
    from .index.fmindex import BisIndex
    from .align import bns as bnsmod
    from .align.pair import PeStat
    from .align.pipeline import AlignerState, process_seqs, sam_header
    from .io.fastq import fastq_iter, read_batch, make_bseq

    opt = MemOpt()
    opt.flag |= MEM_F_NO_MULTI
    overridden = set()
    seq1 = seq2 = None
    rg_line = hdr_line = None
    rg_id = ""
    auto_infer_alt = True
    ignore_alt = False
    pes0 = None
    no_hdr = False

    optstr = "@:1:2:3:5:9ab:c:d:ef:g:hijk:m:pqr:s:v:w:x:y:z:A:B:CD:E:FG:H:I:J:K:L:MN:O:PQ:R:ST:U:VW:X:Y"
    opts, args = getopt.getopt(argv, optstr)
    copy_comment = False
    for o, a in opts:
        c = o[1]
        if c == "k": opt.min_seed_len = int(a); overridden.add("min_seed_len")
        elif c == "1": seq1 = a
        elif c == "2": seq2 = a
        elif c == "b": opt.parent = int(a)
        elif c == "f": opt.bsstrand = int(a)
        elif c == "i": auto_infer_alt = False
        elif c == "w": opt.w = int(a); overridden.add("w")
        elif c == "A": opt.a = int(a); overridden.add("a")
        elif c == "B": opt.b = int(a); overridden.add("b")
        elif c == "T": opt.T = int(a); overridden.add("T")
        elif c == "U": opt.pen_unpaired = int(a); overridden.add("pen_unpaired")
        elif c == "@": opt.n_threads = max(int(a), 1)
        elif c == "P": opt.flag |= MEM_F_NOPAIRING
        elif c == "a": opt.flag |= MEM_F_ALL
        elif c == "p": opt.flag |= MEM_F_PE | MEM_F_SMARTPE
        elif c == "q": opt.flag |= MEM_F_KEEP_SUPP_MAPQ
        elif c == "M": opt.flag |= MEM_F_NO_MULTI
        elif c == "S": opt.flag |= MEM_F_NO_RESCUE
        elif c == "e": opt.flag |= MEM_F_SELF_OVLP
        elif c == "Y": opt.flag |= MEM_F_SOFTCLIP
        elif c == "V": opt.flag |= MEM_F_REF_HDR
        elif c == "c": opt.max_occ = int(a)
        elif c == "d": opt.zdrop = int(a); overridden.add("zdrop")
        elif c == "v": pass  # verbosity
        elif c == "j": ignore_alt = True
        elif c == "r": opt.split_factor = float(a)
        elif c == "D": opt.drop_ratio = float(a)
        elif c == "m": opt.max_matesw = int(a)
        elif c == "s": opt.split_width = int(a)
        elif c == "G": opt.max_chain_gap = int(a)
        elif c == "N": opt.max_chain_extend = int(a)
        elif c == "W": opt.min_chain_weight = int(a)
        elif c == "y": opt.max_mem_intv = int(a)
        elif c == "C": copy_comment = True
        elif c == "J":
            opt.adaptor1 = NT4[np.frombuffer(a.encode(), dtype=np.uint8)].copy()
        elif c == "K":
            opt.adaptor2 = NT4[np.frombuffer(a.encode(), dtype=np.uint8)].copy()
        elif c == "z": opt.min_base_qual = int(a)
        elif c == "5": opt.clip5 = int(a)
        elif c == "3": opt.clip3 = int(a)
        elif c == "9": opt.has_bc = 1
        elif c == "X": opt.mask_level = float(a)
        elif c == "g":
            parts = a.replace(";", ",").split(",")
            opt.max_XA_hits = opt.max_XA_hits_alt = int(parts[0])
            if len(parts) > 1:
                opt.max_XA_hits_alt = int(parts[1])
        elif c == "Q":
            opt.mapQ_coef_len = int(a)
            opt.mapQ_coef_fac = math.log(opt.mapQ_coef_len) if opt.mapQ_coef_len > 0 else 0
        elif c == "O":
            parts = a.split(",")
            opt.o_del = opt.o_ins = int(parts[0])
            if len(parts) > 1:
                opt.o_ins = int(parts[1])
            overridden.update(["o_del", "o_ins"])
        elif c == "E":
            parts = a.split(",")
            opt.e_del = opt.e_ins = int(parts[0])
            if len(parts) > 1:
                opt.e_ins = int(parts[1])
            overridden.update(["e_del", "e_ins"])
        elif c == "L":
            parts = a.split(",")
            opt.pen_clip5 = opt.pen_clip3 = int(parts[0])
            if len(parts) > 1:
                opt.pen_clip3 = int(parts[1])
            overridden.update(["pen_clip5", "pen_clip3"])
        elif c == "R":
            rg_line = a.replace("\\t", "\t")
            for fieldv in rg_line.split("\t"):
                if fieldv.startswith("ID:"):
                    rg_id = fieldv[3:]
        elif c == "H":
            if a.startswith("@"):
                ln = a.replace("\\t", "\t")
                hdr_line = ln if hdr_line is None else hdr_line + "\n" + ln
            else:
                with open(a) as f:
                    for ln in f:
                        ln = ln.rstrip("\n")
                        if ln.startswith("@"):
                            hdr_line = ln if hdr_line is None else hdr_line + "\n" + ln
        elif c == "I":
            parts = a.split(",")
            pes0 = PeStat()
            pes0.avg = float(parts[0])
            pes0.std = pes0.avg * 0.1
            if len(parts) > 1:
                pes0.std = float(parts[1])
            pes0.high = int(pes0.avg + 4.0 * pes0.std + 0.499)
            pes0.low = int(pes0.avg - 4.0 * pes0.std + 0.499)
            if len(parts) > 2:
                pes0.high = int(float(parts[2]) + 0.499)
            if len(parts) > 3:
                pes0.low = int(float(parts[3]) + 0.499)
        elif c == "F":
            no_hdr = True  # MEM_F_ALN_REG in reference (table output)
        elif c == "h":
            print("Usage: biscuit_tpu align [options] <index base> <in1.fq> [in2.fq]",
                  file=sys.stderr)
            return 1

    if rg_line:
        hdr_line = rg_line if hdr_line is None else hdr_line + "\n" + rg_line

    if (len(args) < 2 and not seq1) or not args:
        print("Missing index base or FASTQ file", file=sys.stderr)
        return 1

    if "a" in overridden:
        opt.update_a(overridden)
    # rebuild scoring matrices with the final a/b
    opt.__post_init__()

    idx = BisIndex.load(args[0])
    if auto_infer_alt:
        bnsmod.infer_alt_chromosomes(idx)
    if ignore_alt:
        for ann in idx.anns:
            ann.is_alt = 0

    st = AlignerState(idx)
    out = sys.stdout

    pg = (f"@PG\tID:biscuit_tpu\tPN:biscuit_tpu\tVN:{__version__}"
          f"\tCL:biscuit_tpu align {' '.join(argv)}")
    if not no_hdr:
        out.write(sam_header(idx, hdr_line, pg))

    if seq1 is not None:
        seqs = [make_bseq("inputread", None, seq1, None)]
        if seq2 is not None:
            seqs.append(make_bseq("inputread", None, seq2, None))
            opt.flag |= MEM_F_PE
        process_seqs(opt, st, seqs, 0, pes0, rg_id)
        for s in seqs:
            if s.sam:
                out.write(s.sam)
        return 0

    it1 = fastq_iter(args[1])
    it2 = None
    if len(args) > 2:
        if opt.flag & MEM_F_SMARTPE:
            print("[W] when '-p' is in use, the second query file is ignored.",
                  file=sys.stderr)
        else:
            it2 = fastq_iter(args[2])
            opt.flag |= MEM_F_PE
    n_processed = 0
    chunk = opt.chunk_size * opt.n_threads
    while True:
        seqs = read_batch(it1, it2, chunk, bool(opt.has_bc))
        if not seqs:
            break
        if not copy_comment:
            for s in seqs:
                s.comment = None
        print(f"[M::process] read {len(seqs)} sequences ({sum(s.l_seq for s in seqs)} bp)...",
              file=sys.stderr)
        process_seqs(opt, st, seqs, n_processed, pes0, rg_id)
        n_processed += len(seqs)
        for s in seqs:
            if s.sam:
                out.write(s.sam)
    return 0


SUBCOMMANDS = {
    "index": main_index,
    "align": main_align,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(f"""
Program: BISCUIT_TPU (TPU-native BISulfite-seq CUI Toolkit)
Version: {__version__} (behavioral parity target: biscuit {REFERENCE_VERSION})

Usage: biscuit_tpu <command> [options]

Command:
 -- Read mapping
    index        Index reference genome sequences in the FASTA format
    align        Align sequencing reads to indexed reference
""", file=sys.stderr)
        return 1
    if argv[0] == "version":
        print(f"biscuit_tpu {__version__} (reference parity {REFERENCE_VERSION})")
        return 0
    cmd = SUBCOMMANDS.get(argv[0])
    if cmd is None:
        print(f"Unknown subcommand: {argv[0]}", file=sys.stderr)
        return 1
    return cmd(argv[1:])


if __name__ == "__main__":
    sys.exit(main())
