"""The SA-sampling dial A/B derivation (tools/sa_dial_ab.py).

sa_dial_ab measures the human-scale intv-8-vs-16 dial (docs/SCALING.md;
reference walk: /root/reference/lib/aln/bwt.c:54-97) without a second 2.4 h
index build by deriving the sparser variant in place: samples at interval
2x are the even-rank half of the interval-x samples. That derivation must
be exactly what a native build at 2x produces, and alignment through it
must be byte-identical (positions are exact at any interval).
"""
import json
import os
import subprocess
import sys

import numpy as np

from conftest import REPO


def _run(args, env_extra=None, **kw):
    env = dict(os.environ, **(env_extra or {}))
    return subprocess.run([sys.executable, *args], check=True,
                          capture_output=True, text=True, env=env, **kw)


def test_derived_sparse_index_matches_native_build(tmp_path):
    d = str(tmp_path)
    _run([f"{REPO}/tools/make_testdata.py", d, "--genome-size", "120000",
          "--n-reads", "300", "--seed", "21"])
    fa = os.path.join(d, "genome.fa")
    fq = os.path.join(d, "reads.fq")
    # wide layout forced: the dial's production regime is >=2^31 strands
    wide = {"BISCUIT_TPU_WIDE_INDEX": "1"}
    _run(["-m", "biscuit_tpu.cli", "index", "-M", fa],
         env_extra={**wide, "BISCUIT_TPU_SA_INTV": "8"})

    sys.path.insert(0, f"{REPO}/tools")
    from sa_dial_ab import derive_doubled_intv
    fa2 = os.path.join(d, "genome_i2x.fa")
    assert derive_doubled_intv(fa, fa2) == 16
    meta = json.load(open(fa2 + ".btidx/meta.json"))
    assert meta["par_sa_intv"] == meta["dau_sa_intv"] == 16

    # ground truth: an actual intv-16 build of the same fasta
    fa_ref = os.path.join(d, "g16ref.fa")
    os.link(fa, fa_ref)
    _run(["-m", "biscuit_tpu.cli", "index", "-M", fa_ref],
         env_extra={**wide, "BISCUIT_TPU_SA_INTV": "16"})
    for tag in ("par", "dau"):
        a = np.load(f"{fa_ref}.btidx/{tag}_sa.npy")
        b = np.load(f"{fa2}.btidx/{tag}_sa.npy")
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)

    def sam(path):
        r = _run(["-m", "biscuit_tpu.cli", "align", path, fq])
        return [l for l in r.stdout.splitlines() if not l.startswith("@PG")]

    assert sam(fa) == sam(fa2)
