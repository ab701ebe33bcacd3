"""FASTQ input with the reference's read-structure semantics
(/root/reference/lib/aln/bwa.c:749-850: bis_bseq_read / bis_kseq2bseq1 /
trim_readno, bseq_classify in bwamem).
"""
import gzip
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from ..index.fasta import NT4


@dataclass
class BSeq:
    name: str
    seq: np.ndarray           # nt4 codes (post-clipping view)
    l_seq: int
    qual: Optional[str] = None
    comment: Optional[str] = None
    barcode: Optional[str] = None
    umi: Optional[str] = None
    seq0: Optional[np.ndarray] = None  # original full codes
    l_seq0: int = 0
    clip5: int = 0
    clip3: int = 0
    l_adaptor: int = 0
    sam: Optional[str] = None
    id: int = 0
    bisseq: dict = field(default_factory=dict)


def trim_readno(name: str) -> str:
    """bwa.c trim_readno: strip trailing /1 or /2."""
    if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
        return name[:-2]
    return name


def _fastq_records(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            seq = f.readline().rstrip("\n")
            plus = f.readline()
            qual = f.readline().rstrip("\n")
            hdr = hdr.rstrip("\n")
            parts = hdr[1:].split(None, 1)
            name = parts[0]
            comment = parts[1] if len(parts) > 1 else None
            yield name, comment, seq, qual if qual else None


def make_bseq(name: str, comment: Optional[str], seq: str, qual: Optional[str],
              has_bc: bool = False) -> BSeq:
    codes = NT4[np.frombuffer(seq.encode(), dtype=np.uint8)].copy()
    barcode = umi = None
    if has_bc:
        toks = name.split("_")
        if len(toks) >= 3:
            barcode, umi = toks[-2], toks[-1]
    s = BSeq(name=name, seq=codes, l_seq=len(codes), qual=qual, comment=comment,
             barcode=barcode, umi=umi, seq0=codes, l_seq0=len(codes))
    return s


def read_batch(it1, it2, chunk_size: int, has_bc: bool = False) -> List[BSeq]:
    """bis_bseq_read: read up to chunk_size bp (interleaving mates)."""
    seqs: List[BSeq] = []
    size = 0
    while True:
        try:
            rec1 = next(it1)
        except StopIteration:
            break
        if it2 is not None:
            try:
                rec2 = next(it2)
            except StopIteration:
                import sys
                print("[W::bseq_read] the 2nd file has fewer sequences.", file=sys.stderr)
                break
        name, comment, seq, qual = rec1
        s = make_bseq(trim_readno(name), comment, seq, qual, has_bc)
        s.id = len(seqs)
        seqs.append(s)
        size += s.l_seq
        if it2 is not None:
            name, comment, seq, qual = rec2
            s = make_bseq(trim_readno(name), comment, seq, qual, has_bc)
            s.id = len(seqs)
            seqs.append(s)
            size += s.l_seq
        if size >= chunk_size and len(seqs) % 2 == 0:
            break
    return seqs


def fastq_iter(path: str):
    return _fastq_records(path)
