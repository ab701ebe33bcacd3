"""On-chip (lanes, pool-depth) sweep for the LOG seeder on the honest
5 Mbp bench geometry (the shipping default since round 4; the r2 sweep in
tpu_seed_sweep.py predates the log machine and the dispatch fixes).

Compute-only via tpu_regress.seed_compute_reads_per_s (device-resident
inputs, slope-timed hard sync). Each config re-creates the jit closure so
BISCUIT_TPU_SEED_LANES is honored.

Usage: python tools/log_seed_sweep.py [out.json]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "log_seed_sweep.json"
    d = tempfile.mkdtemp(prefix="logsweep")
    subprocess.run([sys.executable, os.path.join(HERE, "tools", "make_testdata.py"),
                    d, "--genome-size", "5000000", "--n-reads", "100000"],
                   check=True, capture_output=True)
    import jax
    from biscuit_tpu.index.build import build_index
    from biscuit_tpu.align.pipeline import AlignerState
    from tpu_regress import seed_compute_reads_per_s

    idx = build_index(os.path.join(d, "genome.fa"))
    st = AlignerState(idx)
    fq = os.path.join(d, "reads.fq")
    res = {"platform": jax.devices()[0].platform, "geometry": "5Mbp/100k",
           "seeder": "log", "runs": []}
    for lanes in (2048, 4096, 8192):
        for n_reads in (32768, 65536):
            os.environ["BISCUIT_TPU_SEED_LANES"] = str(lanes)
            t0 = time.time()
            try:
                rps = sorted(seed_compute_reads_per_s(st, fq, n_reads=n_reads)
                             for _ in range(3))
            except Exception as e:
                res["runs"].append({"lanes": lanes, "n_reads": n_reads,
                                    "error": f"{type(e).__name__}: {e}"[:200]})
                continue
            row = {"lanes": lanes, "n_reads": n_reads, "reads_per_sec": rps[-1],
                   "runs": rps, "median": rps[1],
                   "wall_incl_compile_s": round(time.time() - t0, 1)}
            res["runs"].append(row)
            print(json.dumps(row), flush=True)
    ok = [r for r in res["runs"] if "reads_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["median"])
        res["best"] = best
        print("BEST", json.dumps(best))
    with open(os.path.join(HERE, out_path), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
