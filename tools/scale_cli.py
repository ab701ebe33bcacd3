#!/usr/bin/env python3
"""Wall-clock multi-process scaling of the PRODUCTION align CLI.

Round-3 VERDICT #6: the distributed scaling evidence was a 2048-read
microbench; the production workload was never measured. This driver times
`tools/shard_align.py` (the multi-host data-parallel layer: FASTQ sharded
round-robin, one `biscuit_tpu align` worker per shard over the shared mmap
index, SAM shards interleaved back) at n = 1, 2, 3, 4 workers with ONE
core per worker (-@ 1), so efficiency = T1 / (n * Tn) measures true
process scaling on this host. n=3 leaves a core for the parent/OS — the
largest n this 4-core host supports without oversubscription; n=4 is
reported for completeness but oversubscribes the merger.

Writes cli_scaling.json and folds the table into dist_scaling.json under
"cli" so the driver artifact carries both the microbench and the
production workload.

Usage: python tools/scale_cli.py [--genome 5000000] [--reads 100000]
       [--ns 1,2,3,4] [--reps 3]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=5_000_000)
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--ns", default="1,2,3,4")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--data", default="/tmp/bt_scale_cli")
    args = ap.parse_args()

    # key the dataset dir by workload: a bare existence check once reused a
    # 650k-read dataset for a --reads 2000000 run and reported nominal/wall
    d = f"{args.data}_{args.genome}_{args.reads}"
    fa = os.path.join(d, "genome.fa")
    fq = os.path.join(d, "reads.fq")
    if not os.path.exists(fq):
        os.makedirs(d, exist_ok=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_testdata.py"),
             d, "--genome-size", str(args.genome),
             "--n-reads", str(args.reads)], check=True, capture_output=True)
    if not os.path.exists(fa + ".btidx"):
        subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "index",
                        "-M", fa], check=True, capture_output=True,
                       env={**os.environ, "PYTHONPATH": REPO,
                            "BISCUIT_TPU_PLATFORM": "cpu"})

    import hashlib
    import re
    ALIGN_RE = re.compile(
        r"Processed (\d+) reads in [0-9.]+ CPU sec, ([0-9.]+) real sec")
    results = {}
    phase = {}
    base_md5 = None
    for n in [int(x) for x in args.ns.split(",")]:
        logdir = os.path.join(d, f"wlogs_n{n}")
        os.makedirs(logdir, exist_ok=True)
        env = dict(os.environ, PYTHONPATH=REPO, BISCUIT_TPU_PLATFORM="cpu",
                   BT_SHARD_WORKER_LOGS=logdir)
        best = float("inf")
        best_phase = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools",
                                              "shard_align.py"),
                 "-n", str(n), "-@", "1", fa, fq],
                capture_output=True, env=env)
            dt = time.time() - t0
            assert r.returncode == 0, r.stderr[-2000:]
            best = min(best, dt)
            # align-PHASE time: per worker, the sum of its logged batch
            # real secs (excludes interpreter startup, index load, FASTQ
            # sharding and SAM merge); the run's phase time is the max
            # over workers (they run concurrently)
            wp = []
            for i in range(n):
                with open(os.path.join(logdir, f"worker.{i}.log")) as f:
                    wp.append(sum(float(m.group(2))
                                  for m in ALIGN_RE.finditer(f.read())))
            best_phase = min(best_phase, max(wp))
        body = b"\n".join(l for l in r.stdout.split(b"\n")
                          if not l.startswith(b"@"))
        md5 = hashlib.md5(body).hexdigest()
        if base_md5 is None:
            base_md5 = md5
        assert md5 == base_md5, f"n={n} SAM body diverged"
        results[n] = best
        phase[n] = best_phase
        print(f"[cli] n={n}: wall {best:.2f}s, align phase "
              f"{best_phase:.2f}s ({args.reads/best:.0f} reads/s wall)",
              flush=True)

    ns = sorted(results)
    t1 = results[ns[0]]
    p1 = phase[ns[0]]
    table = [{"n_procs": n, "wall_s": round(results[n], 2),
              "align_phase_s": round(phase[n], 2),
              "reads_per_s": round(args.reads / results[n], 1),
              "speedup": round(t1 / results[n], 3),
              "efficiency_wall": round(t1 / (n * results[n]), 3),
              "efficiency_align_phase": round(p1 / (n * phase[n]), 3)}
             for n in ns]
    out = {"workload": f"align CLI via shard_align, {args.genome/1e6:.0f} "
                       f"Mbp genome, {args.reads} reads, -@1 per worker, "
                       f"mmap index shared",
           "parity": "SAM bodies identical across n",
           "note": "efficiency_wall includes the serial harness (one "
                   "python startup ~1.7s/process on this rig, FASTQ "
                   "shard, SAM merge); efficiency_align_phase is the "
                   "parallel align section itself (max worker phase time)",
           "table": table}
    with open(os.path.join(REPO, "cli_scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    # fold into the driver artifact next to the microbench table
    dsp = os.path.join(REPO, "dist_scaling.json")
    if os.path.exists(dsp):
        with open(dsp) as f:
            ds = json.load(f)
        ds["cli"] = out
        with open(dsp, "w") as f:
            json.dump(ds, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
