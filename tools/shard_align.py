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
    # split trailing positionals (ref.fa + 1-2 fastqs) from pass-through
    # flags: a bare flag VALUE (e.g. the "1" of "-@ 1") must not count as
    # a positional, so positionals are the TRAILING args that exist on
    # disk — flags and their values all precede them in an align command
    pos = []
    i = len(rest)
    while i > 0 and len(pos) < 3 and not rest[i - 1].startswith("-") \
            and os.path.exists(rest[i - 1]):
        pos.insert(0, rest[i - 1])
        i -= 1
    if len(pos) < 2:
        print("need ref.fa and at least one fastq", file=sys.stderr)
        return 1
    ref, fqs = pos[0], pos[1:]
    ref_and_flags = rest[:i] + [ref]
    pe = len(fqs) == 2

    with tempfile.TemporaryDirectory(prefix="shardaln") as td:
        procs = []
        outs = []
        exdir = os.path.join(td, "pes_exchange")
        for i in range(args.n):
            of = open(os.path.join(td, f"out.{i}.sam"), "w")
            # every worker streams the SAME fastq, owning records
            # i, i+n, ... (BISCUIT_TPU_FASTQ_STRIDE): the serial
            # shard-to-temp-files pass (O(reads), it dominated wall-clock
            # scaling) is gone
            cmd = [sys.executable, "-m", "biscuit_tpu.cli", "align",
                   *ref_and_flags, fqs[0]]
            env = dict(os.environ)
            env["BISCUIT_TPU_FASTQ_STRIDE"] = f"{i}:{args.n}"
            if pe:
                cmd.append(fqs[1])
                # pool candidate insert sizes across ranks: every worker then
                # computes the same pes as a single-process run would
                # (reference chunk-wide semantics, bwamem.c:464-467)
                env["BISCUIT_TPU_PES_EXCHANGE"] = f"{exdir}:{i}:{args.n}"
            # BT_SHARD_WORKER_LOGS=dir keeps each worker's stderr (the
            # [M::mem_process_seqs] phase timings) for scaling analysis
            logdir = os.environ.get("BT_SHARD_WORKER_LOGS")
            errdst = (open(os.path.join(logdir, f"worker.{i}.log"), "w")
                      if logdir else subprocess.DEVNULL)
            procs.append(subprocess.Popen(cmd, stdout=of, env=env,
                                          stderr=errdst))
            if errdst is not subprocess.DEVNULL:
                errdst.close()
            outs.append(of)
        rcs = [p.wait() for p in procs]
        for of in outs:
            of.close()
        if any(rcs):
            print(f"worker failures: {rcs}", file=sys.stderr)
            return 1
        # header from shard 0; bodies interleaved round-robin to restore
        # the single-process read order. This pass is the serial tail of
        # the whole run, so it avoids per-line print()/split in the hot
        # loop: qnames are precomputed in one pass and output is buffered
        # into a single write.
        bodies = []
        qns = []
        out = sys.stdout
        for i in range(args.n):
            with open(os.path.join(td, f"out.{i}.sam")) as f:
                lines = f.read().splitlines()
            body = [l for l in lines if not l.startswith("@")]
            if i == 0:
                out.write("\n".join(
                    h for h in lines
                    if h.startswith("@") and not h.startswith("@PG")))
                out.write("\n")
            bodies.append(body)
            qns.append([l.split("\t", 1)[0] for l in body])
        idx = [0] * args.n
        i = 0
        total = sum(len(b) for b in bodies)
        emitted = 0
        chunks = []
        while emitted < total:
            w = i % args.n
            # one qname group per visit: a read's records (pair mates,
            # supplementaries) share the qname and stay contiguous
            b, q, j = bodies[w], qns[w], idx[w]
            if j < len(b):
                k = j + 1
                while k < len(b) and q[k] == q[j]:
                    k += 1
                chunks.extend(b[j:k])
                emitted += k - j
                idx[w] = k
            i += 1
        if chunks:
            out.write("\n".join(chunks))
            out.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
