#!/usr/bin/env python3
"""Device-seeder diagnostics on the honest 5 Mbp geometry.

Answers, with chip measurements (tunnel-safe slope timing):
  1. occ4 fused-row gather: fixed-cost knee vs row count, on the REAL
     5 Mbp table (the 100 kbp toy overstated throughput by ~3x).
  2. Pool seeder: iterations + wall per pool at several lane widths on
     real bisulfite reads -> rows/read and where the time actually goes.
  3. A claim-gather ablation (claim_every) at honest scale.

Usage: python tools/seed_diag.py [--data DIR] [--reads N]
Writes seed_diag.json.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from tools.tpu_regress import _timeit, _sync


def get_dataset(data_dir, genome=5_000_000, n_reads=100_000):
    if not os.path.exists(os.path.join(data_dir, "genome.fa")):
        os.makedirs(data_dir, exist_ok=True)
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(here, "tools", "make_testdata.py"),
             data_dir, "--genome-size", str(genome),
             "--n-reads", str(n_reads)],
            check=True, capture_output=True)
    return os.path.join(data_dir, "genome.fa"), \
        os.path.join(data_dir, "reads.fq")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/bt_seed_diag_data")
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--out", default="seed_diag.json")
    ap.add_argument("--lanes", default="2048,4096")
    args = ap.parse_args()

    fa, fq = get_dataset(args.data)
    import jax
    import jax.numpy as jnp
    from biscuit_tpu.index.build import build_index
    from biscuit_tpu.align.pipeline import bsconvert
    from biscuit_tpu.config import MemOpt
    from biscuit_tpu.io.fastq import fastq_iter, read_batch
    from biscuit_tpu.ops.seed_batch import FMPair, occ4_sel, smem3_pool_batch

    res = {"platform": jax.devices()[0].platform}
    print(f"[diag] building index over {fa}", flush=True)
    idx = build_index(fa)
    fm = FMPair.from_index(idx)
    n64 = int(fm.tab.shape[1])
    res["table_rows"] = n64
    res["table_mb"] = round(fm.tab.size * 4 / 1e6, 1)

    # ---- 1. gather knee on the real table ----
    rng = np.random.default_rng(0)
    occ4_j = jax.jit(occ4_sel)
    knee = {}
    for B in (2048, 4096, 8192, 16384, 65536):
        ks = jnp.asarray(
            rng.integers(0, int(idx.dau.seq_len), B), fm.rdt)
        wh = jnp.asarray(rng.integers(0, 2, B), jnp.int32)
        t = _timeit(lambda: occ4_j(fm, wh, ks), n=8)
        knee[str(B)] = {"us_per_call": round(t * 1e6, 1),
                        "mrows_per_s": round(B / t / 1e6, 2)}
        print(f"[diag] occ4 B={B}: {knee[str(B)]}", flush=True)
    res["occ4_knee"] = knee

    # ---- 2/3. pool seeder sweep ----
    opt = MemOpt()
    seqs = read_batch(fastq_iter(fq), None, 1 << 60)[:args.reads]
    N = 1 << max(0, len(seqs) - 1).bit_length()
    L = max((max(s.l_seq for s in seqs) + 31) // 32 * 32, 32)
    pool = np.full((N, L + 2), 4, np.int32)
    for i, s in enumerate(seqs):
        p = i & 1
        pool[i, :s.l_seq] = bsconvert(s, p)
        pool[i, L] = s.l_seq
        pool[i, L + 1] = p
    pj = jnp.asarray(pool)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    sweeps = {}
    for lanes in [int(x) for x in args.lanes.split(",")]:
        for claim_every in (1, 4):
            S = max(64, min(1024, 24 * max(1, N // lanes) + 40))
            fn = jax.jit(lambda pj=pj, lanes=lanes, S=S, ce=claim_every:
                         smem3_pool_batch(fm, pj, int(opt.min_seed_len),
                                          int(opt.max_mem_intv), split_len,
                                          int(opt.split_width), lanes, 32,
                                          S, 16, claim_every=ce))
            out = fn()
            iters = int(out[4])
            ov = int((np.asarray(out[2]) >= 0).sum())
            t = _timeit(fn, n=4)
            key = f"lanes{lanes}_ce{claim_every}"
            sweeps[key] = {
                "iters": iters, "overflow_reads": ov,
                "wall_s": round(t, 4),
                "reads_per_s": round(len(seqs) / t, 1),
                "us_per_iter": round(t / iters * 1e6, 2),
                "gather_rows_per_iter": 2 * lanes + (
                    lanes // claim_every),
            }
            print(f"[diag] {key}: {sweeps[key]}", flush=True)
    res["pool_sweep"] = sweeps

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[diag] wrote {args.out}")


if __name__ == "__main__":
    main()
