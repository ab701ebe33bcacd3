#!/usr/bin/env python3
"""Real jax.distributed multi-process execution + scaling measurement.

VERDICT r2 #5: everything multi-chip so far ran in ONE process on virtual
devices. This driver launches N actual OS processes, each owning exactly one
CPU XLA device (xla_force_host_platform_device_count=1) and one pinned CPU
core, joined with jax.distributed.initialize into one global mesh. It then
runs the production sharded kernels ACROSS PROCESS BOUNDARIES:

  * the production lane-refill pool seeder under shard_map over the global
    "dp" mesh (index replicated per process, read pool sharded);
  * the pileup count psum merge (a real cross-process all-reduce);
  * the PE insert-size exchange via multihost_utils.process_allgather
    (parallel/exchange.JaxProcessAllgather — the DCN-side collective that
    replaces the file barrier).

Parity: seed outputs and merged pileup counts are allgathered and hashed;
every n must reproduce the n=1 hashes bit-for-bit. Scaling: each process is
pinned to its own core, so efficiency = T1 / (n * Tn) measures true
multi-process scaling on this host. Writes dist_scaling.json.

Usage:  python tools/dist_run.py [--ns 1,2,4] [--reads 8192] [--genome 2000000]
"""
import argparse
import hashlib
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


# ----------------------------------------------------------------- child
def child(args):
    rank, n = args.rank, args.nprocs
    try:  # one pinned core per process => honest per-process scaling
        os.sched_setaffinity(0, {rank % os.cpu_count()})
    except OSError:
        pass
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coord,
                               num_processes=n, process_id=rank)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from biscuit_tpu.index.build import build_index
    from biscuit_tpu.config import MemOpt
    from biscuit_tpu.ops.seed_batch import FMPair
    from biscuit_tpu.parallel.mesh import (sharded_pool_seed_fn,
                                           sharded_pileup_counts_fn)
    from biscuit_tpu.parallel.exchange import JaxProcessAllgather

    assert len(jax.devices()) == n and len(jax.local_devices()) == 1, \
        (len(jax.devices()), len(jax.local_devices()))
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    idx = build_index(os.path.join(args.data, "genome.fa"))
    fm = FMPair.from_index(idx)
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)

    # deterministic read pool, identical in every process; each process
    # feeds only its shard rows into the global array
    from biscuit_tpu.align.pipeline import bsconvert
    from biscuit_tpu.io.fastq import fastq_iter, read_batch
    seqs = read_batch(fastq_iter(os.path.join(args.data, "reads.fq")),
                      None, 1 << 60)[:args.reads]
    # N must be IDENTICAL across every n (the parity hash compares runs),
    # so truncate to a multiple of 48 = lcm of n*4 for n in {1,2,3,4}
    N = len(seqs) - len(seqs) % 48 or 48
    L = max((max(s.l_seq for s in seqs) + 31) // 32 * 32, 32)
    pool = np.full((N, L + 2), 4, np.int32)
    for i, s in enumerate(seqs[:N]):
        p = i & 1
        pool[i, :s.l_seq] = bsconvert(s, p)
        pool[i, L] = s.l_seq
        pool[i, L + 1] = p
    sh = NamedSharding(mesh, P("dp", None))
    lo, hi = rank * N // n, (rank + 1) * N // n
    gpool = jax.make_array_from_process_local_data(sh, pool[lo:hi])

    lanes = 128
    # S sized for the n=1 per-device pool and held FIXED across n: seed
    # capacity scales per-iteration cost (the [6,B,S] archive rewrite), so
    # letting it shrink with the shard would overstate scaling efficiency
    S = max(64, 24 * (N // lanes) + 40)
    fn = sharded_pool_seed_fn(mesh, fm, int(opt.min_seed_len),
                              int(opt.max_mem_intv), split_len,
                              int(opt.split_width), lanes=lanes, C=32,
                              S=S, T2=16)
    seeds, n_seeds, ov = fn(gpool)          # compile + run
    # an archive overflow would truncate different seeds under different
    # partitions (production reruns overflowed reads on the host; this
    # microbench has no fallback) — fail loudly instead of "parity broke".
    # ov is the ov_rd id list, -1-padded: entries >= 0 are real overflows.
    assert not bool(np.asarray(jnp.any(ov >= 0))), \
        "read overflow: S too small for N/lanes — shrink --reads or grow S"
    # hard sync + local materialization
    local_seeds = np.concatenate(
        [np.asarray(x.data) for x in seeds.addressable_shards], axis=0)
    local_ns = np.concatenate(
        [np.asarray(x.data) for x in n_seeds.addressable_shards], axis=0)

    t0 = time.perf_counter()
    reps = args.reps
    for _ in range(reps):
        seeds, n_seeds, ov = fn(gpool)
        np.asarray(jnp.sum(n_seeds))        # cross-process sync point
    dt = (time.perf_counter() - t0) / reps

    # parity hash: gather every process's packed (seed rows, counts)
    rows = []
    for b in range(local_seeds.shape[0]):
        k = int(local_ns[b])
        rows.append(local_seeds[b, :k])
    packed = np.concatenate(rows) if rows else np.zeros((0, 6), np.int64)
    packed = packed.astype(np.int64)
    packed[:, 5] += lo    # shard-local read id -> global read id
    counts = np.asarray(
        multihost_utils.process_allgather(np.int64(packed.shape[0])))
    counts = counts.reshape(-1)
    width = max(int(counts.max()), 1)
    pad = np.zeros((width, 6), np.int64)
    pad[:packed.shape[0]] = packed
    allv = np.asarray(multihost_utils.process_allgather(pad))
    allv = allv.reshape(n, width, 6)
    # jax downcasts the gathered int64 to int32 without x64; normalize the
    # dtype so hashes compare across process counts
    merged = np.concatenate(
        [allv[r, :counts[r]] for r in range(n)]).astype(np.int64)
    # canonical order: reads are assigned to lanes dynamically, so the raw
    # lane-major stream depends on the partition; a STABLE sort by read id
    # is partition-invariant (each read lives on exactly one lane, so its
    # within-read temporal seed order survives) — same protocol as
    # _collect_sm_pool's compaction sort
    order = np.argsort(merged[:, 5], kind="stable")
    seed_hash = hashlib.sha256(
        np.ascontiguousarray(merged[order]).tobytes()).hexdigest()
    if os.environ.get("BT_DIST_DEBUG") and rank == 0:
        np.save(os.path.join(args.data, f"merged_n{n}.npy"), merged[order])

    # ---- pileup count psum across processes ----
    W = 1024
    rngp = np.random.default_rng(7)
    P_TOT = 1 << 16
    positions = rngp.integers(0, W, P_TOT).astype(np.int32)
    stat = rngp.integers(0, 30, P_TOT).astype(np.int32)
    valid = (rngp.random(P_TOT) < 0.9)
    shv = NamedSharding(mesh, P("dp"))
    args3 = [jax.make_array_from_process_local_data(
        shv, a[rank * P_TOT // n:(rank + 1) * P_TOT // n])
        for a in (positions, stat, valid)]
    pfn = sharded_pileup_counts_fn(mesh, W)
    cnts = np.asarray(pfn(*args3))
    counts_hash = hashlib.sha256(cnts.tobytes()).hexdigest()

    # ---- pes exchange over the real collective ----
    ex = JaxProcessAllgather()
    my_isizes = list(range(rank * 10, rank * 10 + 3 + rank))
    pooled = ex(my_isizes)
    want = []
    for r in range(n):
        want.extend(range(r * 10, r * 10 + 3 + r))
    assert pooled == want, (pooled, want)

    if rank == 0:
        out = {"n": n, "t_per_rep_s": dt, "seed_hash": seed_hash,
               "counts_hash": counts_hash, "N": int(N), "lanes": lanes}
        with open(os.path.join(args.data, f"result_n{n}.json"), "w") as f:
            json.dump(out, f)
    jax.distributed.shutdown()


# ----------------------------------------------------------------- parent
def parent(args):
    data = args.data
    if not os.path.exists(os.path.join(data, "genome.fa")):
        os.makedirs(data, exist_ok=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_testdata.py"),
             data, "--genome-size", str(args.genome),
             "--n-reads", str(args.reads)],
            check=True, capture_output=True)
        # build the index once; children load the cached artifacts
        subprocess.run(
            [sys.executable, "-m", "biscuit_tpu.cli", "index",
             os.path.join(data, "genome.fa")],
            check=True, capture_output=True,
            env={**os.environ, "BISCUIT_TPU_PLATFORM": "cpu",
                 "PYTHONPATH": REPO})

    results = {}
    for n in [int(x) for x in args.ns.split(",")]:
        port = free_port()
        procs = []
        for r in range(n):
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO
            env["JAX_PLATFORMS"] = "cpu"
            env["BISCUIT_TPU_PLATFORM"] = "cpu"
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
            # the persistent XLA cache may hold entries compiled with other
            # flags/features; CPU compiles are cheap, keep runs hermetic
            env["BISCUIT_TPU_XLA_CACHE"] = "0"
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--rank", str(r), "--nprocs", str(n),
                 "--coord", f"127.0.0.1:{port}", "--data", data,
                 "--reads", str(args.reads), "--reps", str(args.reps)],
                env=env))
        rcs = [p.wait() for p in procs]
        assert all(rc == 0 for rc in rcs), f"n={n} ranks failed: {rcs}"
        with open(os.path.join(data, f"result_n{n}.json")) as f:
            results[n] = json.load(f)
        print(f"[dist] n={n}: {results[n]}", flush=True)

    ns = sorted(results)
    base = results[ns[0]]
    table = []
    for n in ns:
        r = results[n]
        assert r["seed_hash"] == base["seed_hash"], "seed parity broke"
        assert r["counts_hash"] == base["counts_hash"], "count parity broke"
        eff = base["t_per_rep_s"] / (n * r["t_per_rep_s"]) if n > 1 else 1.0
        table.append({"n_procs": n, "t_per_rep_s": round(r["t_per_rep_s"], 4),
                      "speedup": round(base["t_per_rep_s"] / r["t_per_rep_s"], 3),
                      "efficiency": round(eff, 3)})
    out = {"workload": f"pool seeder, N={base['N']} reads, "
                       f"lanes={base['lanes']}/proc, 1 core/proc",
           "parity": "seed + psum-count hashes identical across n",
           "table": table}
    # preserve the production-CLI table (tools/scale_cli.py) if present
    dsp = os.path.join(REPO, "dist_scaling.json")
    if os.path.exists(dsp):
        with open(dsp) as f:
            prev = json.load(f)
        if "cli" in prev:
            out["cli"] = prev["cli"]
    with open(dsp, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--coord", default="")
    ap.add_argument("--data", default="/tmp/bt_dist_data")
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--genome", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ns", default="1,2,4")
    args = ap.parse_args()
    if args.child:
        child(args)
    else:
        parent(args)


if __name__ == "__main__":
    main()
