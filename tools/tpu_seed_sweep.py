"""On-chip tunable sweep for the production pool seeder.

Times ops/seed_batch._collect_sm_pool (the lane-refill SMEM state machine,
reference semantics bwt.c:bwt_smem1a + bwamem.c:mem_collect_intv) across
(lanes, claim_every, pool size) on the real TPU, compute-only: inputs
device-resident, outputs left on device, dispatch amortized. Picks the
best config so the BISCUIT_TPU_SEED_LANES / BISCUIT_TPU_CLAIM_EVERY
defaults are measured, not guessed.

Usage: python tools/tpu_seed_sweep.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_regress import _timeit  # scalar-D2H hard sync (tunnel-safe)


def main():
    import jax
    import jax.numpy as jnp
    from biscuit_tpu.config import MemOpt
    from biscuit_tpu.index.build import build_index
    from biscuit_tpu.ops.seed_batch import FMPair, _collect_sm_pool

    out_path = sys.argv[1] if len(sys.argv) > 1 else "tpu_seed_sweep.json"
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 1_000_000))
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        f.write(">chr1\n" + seq + "\n")
        path = f.name
    idx = build_index(path)
    fm = FMPair.from_index(idx)
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)

    L = 128
    results = {"platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0]), "runs": []}
    for N in (int(os.environ.get("SWEEP_N", "4096")),):
        reads = np.zeros((N, L), np.int32)
        for b in range(N):
            p = int(rng.integers(0, idx.l_pac - L))
            frag = idx.pac[p:p + L].astype(np.int32)
            reads[b] = np.where(frag == 1, 3, frag)
        pool = np.full((N, L + 2), 4, np.int32)
        pool[:, :L] = reads
        pool[:, L] = L
        pool[:, L + 1] = 1
        pj = jnp.asarray(pool)
        base = None
        for lanes in (256, 512, 1024, 2048):
            if lanes > N:
                continue
            S = max(64, min(1024, 24 * max(1, N // lanes) + 40))
            for ce in (1, 4, 8):
                def run(ce=ce, lanes=lanes, S=S):
                    return _collect_sm_pool(
                        fm, pj, int(opt.min_seed_len),
                        int(opt.max_mem_intv), split_len,
                        int(opt.split_width), lanes, 32, S, 16,
                        claim_every=ce)
                try:
                    total = int(np.asarray(run()[2]))  # seed-count sanity
                    t = _timeit(lambda: run()[0], n=4)
                except Exception as e:
                    results["runs"].append(
                        {"N": N, "lanes": lanes, "claim_every": ce,
                         "error": repr(e)[:200]})
                    continue
                rps = round(N / t, 1)
                if base is None:
                    base = rps
                row = {"N": N, "lanes": lanes, "S": S, "claim_every": ce,
                       "reads_per_s": rps, "total_seeds": total}
                results["runs"].append(row)
                print(f"[sweep] {json.dumps(row)}", flush=True)
    ok_runs = [r for r in results["runs"] if "reads_per_s" in r]
    if ok_runs:
        best = max(ok_runs, key=lambda r: r["reads_per_s"])
        results["best"] = best
        print(f"[sweep] BEST {json.dumps(best)}")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
