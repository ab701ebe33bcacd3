"""Big-genome index build + align validation (docs/SCALING.md data points).

Builds an N-bp random genome index with the production (bounded-memory)
path, records peak RSS and wall time, then aligns sampled bisulfite-
converted reads back and checks exact position+strand placement. Exercises
whatever layout the genome size selects (int32/int64 SA-IS, narrow/wide SA
samples at the dense default, THP-backed hot arrays).

Usage: python tools/big_build_validate.py [genome_bp] [n_reads] [outdir]
"""
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000_000
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    d = sys.argv[3] if len(sys.argv) > 3 else "/tmp/btbuild"
    os.makedirs(d, exist_ok=True)
    fa = os.path.join(d, "genome.fa")

    if not os.path.exists(fa) or os.path.getsize(fa) < n:
        rng = np.random.default_rng(11)
        t0 = time.time()
        with open(fa, "w") as f:
            f.write(">chr1\n")
            chunk = 10_000_000
            lut = np.frombuffer(b"ACGT", np.uint8)
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                codes = rng.integers(0, 4, hi - lo).astype(np.uint8)
                rows = lut[codes].tobytes().decode()
                f.write("\n".join(rows[i:i + 80]
                                  for i in range(0, len(rows), 80)) + "\n")
        print(f"[big] wrote {n/1e9:.1f} Gbp fasta in {time.time()-t0:.0f}s",
              flush=True)

    meta = os.path.join(fa + ".btidx", "meta.json")
    if os.path.exists(meta) and os.path.getmtime(meta) > os.path.getmtime(fa):
        print("[big] reusing existing index (meta.json newer than fasta); "
              "build time/RSS were recorded by the original run", flush=True)
    else:
        t0 = time.time()
        code = ("import resource, subprocess, sys\n"
                "r = subprocess.run(sys.argv[1:])\n"
                "peak = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss\n"
                "print('PEAK_RSS_KB', peak)\n"
                "sys.exit(r.returncode)\n")
        r = subprocess.run([sys.executable, "-c", code, sys.executable, "-m",
                            "biscuit_tpu.cli", "index", "-M", fa],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-3000:]
        peak_kb = 0
        for line in r.stdout.splitlines():
            if line.startswith("PEAK_RSS_KB"):
                peak_kb = int(line.split()[-1])
        print(f"[big] index built in {time.time()-t0:.0f}s, "
              f"peak RSS {peak_kb/1e6:.1f} GB", flush=True)

    # sample reads from the genome, bisulfite-convert, align, check placement
    from biscuit_tpu.index.fmindex import BisIndex
    idx = BisIndex.load(fa)
    print(f"[big] strand len {idx.par.seq_len} sa_intv {idx.par.sa_intv} "
          f"sa dtype {idx.par.sa_samples.dtype}", flush=True)
    rng = np.random.default_rng(12)
    L = 100
    fq = os.path.join(d, "reads.fq")
    truth = []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    pac = idx.pac
    lut = "ACGT"
    with open(fq, "w") as f:
        for i in range(n_reads):
            p = int(rng.integers(0, idx.l_pac - L))
            frag = "".join(lut[c] for c in pac[p:p + L])
            rev = bool(rng.integers(0, 2))
            if rev:
                frag = "".join(comp[c] for c in frag[::-1])
            # parent-strand bisulfite conversion (C->T) in read orientation
            conv = frag.replace("C", "T")
            truth.append((p, rev))
            f.write(f"@r{i}\n{conv}\n+\n{'I' * L}\n")
    del idx
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli", "align",
                        "-@", "4", fa, fq], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]
    print(f"[big] aligned {n_reads} reads in {time.time()-t0:.0f}s "
          f"(incl. index load)", flush=True)
    good = 0
    for line in r.stdout.splitlines():
        if line.startswith("@"):
            continue
        c = line.split("\t")
        rid = int(c[0][1:])
        pos0 = int(c[3]) - 1
        rev = bool(int(c[1]) & 16)
        if (pos0, rev) == truth[rid]:
            good += 1
    print(f"[big] placements exact: {good}/{n_reads}", flush=True)
    assert good >= n_reads * 0.99, "placement rate below 99%"

    # wide-index device seeding against the same index: the hybrid engine
    # (device seeds/SA injected into the C++ chain/extend/SAM) must emit
    # byte-identical SAM.  BT_BIG_DEVICE=cpu (default; the v5e's 16 GB HBM
    # cannot hold two 6.2 G-char fused strands), tpu, or off.
    dev = os.environ.get("BT_BIG_DEVICE", "cpu")
    if dev != "off":
        nd = min(int(os.environ.get("BT_BIG_DEVICE_READS", "512")), n_reads)
        fq_d = os.path.join(d, "reads_dev.fq")
        with open(fq_d, "w") as f, open(fq) as src:
            for _ in range(nd * 4):
                f.write(src.readline())
        env = dict(os.environ, BISCUIT_TPU_ENGINE="device",
                   BISCUIT_TPU_PLATFORM=("" if dev == "tpu" else dev))
        t0 = time.time()
        rd = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli",
                             "align", fa, fq_d],
                            capture_output=True, text=True, env=env)
        assert rd.returncode == 0, rd.stderr[-3000:]
        rh = subprocess.run([sys.executable, "-m", "biscuit_tpu.cli",
                             "align", fa, fq_d], capture_output=True,
                            text=True)
        assert rh.returncode == 0, rh.stderr[-3000:]
        same = rd.stdout == rh.stdout
        print(f"[big] device-seeded align ({dev}, {nd} reads) in "
              f"{time.time()-t0:.0f}s: SAM byte-identical to host = {same}",
              flush=True)
        assert same, "device-seeded SAM differs from host SAM"
    print("[big] OK")


if __name__ == "__main__":
    main()
