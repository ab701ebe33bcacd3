"""Measured SA-sampling-dial A/B at human scale (round-4 VERDICT #5).

The wide-index SA walk (reference: fixed intv-32, /root/reference/lib/aln/
bwt.c:54-97) is the human-scale wall; BISCUIT_TPU_SA_INTV=8 was projected
~1.3x align over the wide default 16 (docs/SCALING.md). This measures it.

A second 2.4 h build is NOT needed: SA samples at interval 2x are exactly
the even-rank half of the interval-x samples (rank k*(2x) = (2k)*x), so
sa_16 = sa_8[::2] with the same '$' sentinel at [0]. words/occ/L2/pac are
bit-identical by construction and hardlinked into a sibling .btidx dir.
Both variants then align the SAME fastq with the production CLI (-@ N),
interleaved A/B/A/B runs to cancel ambient drift; per-run walls and the
[main] Real/CPU lines are recorded.

Usage: python tools/sa_dial_ab.py [dir=/tmp/btbuild8] [n_runs=3] [threads=4]
Writes sa_dial_ab.json at the repo root.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def derive_doubled_intv(fa_src: str, fa_dst: str) -> int:
    """Create fa_dst(.btidx) as the intv-doubled variant of fa_src's index."""
    d_src, d_dst = fa_src + ".btidx", fa_dst + ".btidx"
    os.makedirs(d_dst, exist_ok=True)
    with open(os.path.join(d_src, "meta.json")) as f:
        meta = json.load(f)
    for tag in ("par", "dau"):
        meta[f"{tag}_sa_intv"] = int(meta[f"{tag}_sa_intv"]) * 2
    if not os.path.exists(fa_dst):
        os.link(fa_src, fa_dst)
    share = ["pac.npy"]
    for tag in ("par", "dau"):
        share += [f"{tag}_words.npy", f"{tag}_occ.npy", f"{tag}_L2.npy"]
        ilv = f"{tag}_ilv2.npy"
        if os.path.exists(os.path.join(d_src, ilv)):
            share.append(ilv)
    for name in share:
        dst = os.path.join(d_dst, name)
        if not os.path.exists(dst):
            os.link(os.path.join(d_src, name), dst)
    for tag in ("par", "dau"):
        dst = os.path.join(d_dst, f"{tag}_sa.npy")
        if not os.path.exists(dst):
            sa = np.load(os.path.join(d_src, f"{tag}_sa.npy"), mmap_mode="r")
            np.save(dst + f".{os.getpid()}.tmp.npy", np.ascontiguousarray(sa[::2]))
            os.replace(dst + f".{os.getpid()}.tmp.npy", dst)
    with open(os.path.join(d_dst, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta["par_sa_intv"]


def run_align(fa: str, fq: str, threads: int, prof: bool = False):
    env = dict(os.environ)
    env.pop("BT_PROF", None)
    if prof:
        env["BT_PROF"] = "1"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "biscuit_tpu.cli", "align", "-@", str(threads),
         fa, fq], stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        text=True, env=env, cwd=HERE)
    wall = time.time() - t0
    assert r.returncode == 0, r.stderr[-3000:]
    tail = [ln for ln in r.stderr.splitlines()
            if ln.startswith("[main] Real") or "prof" in ln.lower()]
    return wall, tail


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/btbuild8"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else (os.cpu_count() or 4)
    fa8 = os.path.join(d, "genome.fa")
    fq = os.path.join(d, "reads.fq")
    fa16 = os.path.join(d, "genome_i2x.fa")
    intv2 = derive_doubled_intv(fa8, fa16)
    with open(os.path.join(fa8 + ".btidx", "meta.json")) as f:
        intv1 = json.load(f)["par_sa_intv"]
    print(f"[ab] intv {intv1} vs {intv2}, {n_runs} interleaved runs, "
          f"-@ {threads}", flush=True)

    out = {"dir": d, "threads": threads,
           "intv_dense": intv1, "intv_sparse": intv2,
           "dense": {"walls": [], "mains": []},
           "sparse": {"walls": [], "mains": []}}
    # warm both (first touch faults the mmap pages / builds derived caches)
    for fa, key in ((fa8, "dense"), (fa16, "sparse")):
        w, m = run_align(fa, fq, threads)
        print(f"[ab] warm {key}: {w:.1f}s {m}", flush=True)
    for i in range(n_runs):
        for fa, key in ((fa8, "dense"), (fa16, "sparse")):
            w, m = run_align(fa, fq, threads)
            out[key]["walls"].append(round(w, 2))
            out[key]["mains"].append(m)
            print(f"[ab] run{i} {key}: {w:.1f}s {m}", flush=True)
    # one profiled run each for the slot decomposition
    for fa, key in ((fa8, "dense"), (fa16, "sparse")):
        w, m = run_align(fa, fq, threads, prof=True)
        out[key]["prof"] = m
    med = lambda xs: sorted(xs)[len(xs) // 2]
    out["dense"]["median_wall"] = med(out["dense"]["walls"])
    out["sparse"]["median_wall"] = med(out["sparse"]["walls"])
    out["speedup_dense_over_sparse"] = round(
        out["sparse"]["median_wall"] / out["dense"]["median_wall"], 3)
    with open(os.path.join(HERE, "sa_dial_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("intv_dense", "intv_sparse",
                       "speedup_dense_over_sparse")}))


if __name__ == "__main__":
    main()
