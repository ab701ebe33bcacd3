#!/usr/bin/env python3
"""Multi-host data-parallel alignment driver.

The single-process aligner already data-parallelizes a batch across one
host's cores (and a chip's lanes on the device engine). This driver is the
multi-HOST layer of SURVEY.md §2d: shard the FASTQ round-robin, run one
`biscuit_tpu align` worker per shard (each host/process loads or mmaps the
same index), and concatenate the SAM shards in order — the DCN-side analog
of the reference's single-node kt_pipeline.

Ordering: workers keep their shard's internal order; shards are interleaved
back record-by-record so the output order equals the single-process order
(reads are independent; PE pairs stay adjacent within a shard).

Usage:
    tools/shard_align.py -n 4 [-p] [align options...] ref.fa r1.fq [r2.fq] > out.sam
"""
import argparse
import os
import subprocess
import sys
import tempfile


def shard_fastq(path: str, n: int, outdir: str, tag: str, group: int):
    """Round-robin by read (or pair group) into n shard files."""
    import gzip
    opener = gzip.open if path.endswith(".gz") else open
    outs = [open(os.path.join(outdir, f"{tag}.{i}.fq"), "w") for i in range(n)]
    with opener(path, "rt") as f:
        i = 0
        while True:
            rec = [f.readline() for _ in range(4 * group)]
            if not rec[0]:
                break
            outs[(i // group) % n].writelines(rec)
            i += group
    for o in outs:
        o.close()
    return [o.name for o in outs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=os.cpu_count() or 2,
                    help="number of worker processes (one per 'host')")
    ap.add_argument("rest", nargs=argparse.REMAINDER,
                    help="align options + ref.fa + fastq(s)")
    args, unknown = ap.parse_known_args()
    rest = unknown + args.rest  # pass-through align flags
    # split trailing positionals from flags: last 2-3 non-flag args
    pos = [a for a in rest if not a.startswith("-")]
    if len(pos) < 2:
        print("need ref.fa and at least one fastq", file=sys.stderr)
        return 1
    fqs = pos[-2:] if (len(pos) >= 3 and os.path.exists(pos[-1])
                       and not pos[-1].endswith((".fa", ".fasta"))) else pos[-1:]
    ref_and_flags = rest[:len(rest) - len(fqs)]
    pe = len(fqs) == 2

    with tempfile.TemporaryDirectory(prefix="shardaln") as td:
        shards1 = shard_fastq(fqs[0], args.n, td, "r1", 1)
        shards2 = shard_fastq(fqs[1], args.n, td, "r2", 1) if pe else None
        procs = []
        outs = []
        exdir = os.path.join(td, "pes_exchange")
        for i in range(args.n):
            of = open(os.path.join(td, f"out.{i}.sam"), "w")
            cmd = [sys.executable, "-m", "biscuit_tpu.cli", "align",
                   *ref_and_flags, shards1[i]]
            env = dict(os.environ)
            if pe:
                cmd.append(shards2[i])
                # pool candidate insert sizes across ranks: every worker then
                # computes the same pes as a single-process run would
                # (reference chunk-wide semantics, bwamem.c:464-467)
                env["BISCUIT_TPU_PES_EXCHANGE"] = f"{exdir}:{i}:{args.n}"
            procs.append(subprocess.Popen(cmd, stdout=of, env=env,
                                          stderr=subprocess.DEVNULL))
            outs.append(of)
        rcs = [p.wait() for p in procs]
        for of in outs:
            of.close()
        if any(rcs):
            print(f"worker failures: {rcs}", file=sys.stderr)
            return 1
        # header from shard 0; bodies interleaved round-robin to restore the
        # single-process read order
        bodies = []
        for i in range(args.n):
            with open(os.path.join(td, f"out.{i}.sam")) as f:
                lines = f.read().splitlines()
            hdr = [l for l in lines if l.startswith("@")]
            body = [l for l in lines if not l.startswith("@")]
            if i == 0:
                for h in hdr:
                    if not h.startswith("@PG"):
                        print(h)
            bodies.append(body)
        idx = [0] * args.n
        i = 0
        total = sum(len(b) for b in bodies)
        emitted = 0
        while emitted < total:
            w = i % args.n
            # one qname group per visit: a read's records (pair mates,
            # supplementaries) share the qname and stay contiguous
            b = bodies[w]
            if idx[w] < len(b):
                qname = b[idx[w]].split("\t", 1)[0]
                while idx[w] < len(b) and b[idx[w]].split("\t", 1)[0] == qname:
                    print(b[idx[w]])
                    idx[w] += 1
                    emitted += 1
            i += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
