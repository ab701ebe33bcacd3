"""Batched local alignment (ops/sw_local.py) vs the scalar exact-ksw_align2
ground truth (ops/sw.py:sw_align), over both striped-kernel regimes."""
import numpy as np
import pytest

from biscuit_tpu.ops import sw
from biscuit_tpu.ops.sw_local import sw_align_batch


def mk_mats(a, b):
    m = np.zeros((2, 5, 5), np.int64)
    m[:, :4, :4] = -b
    for i in range(4):
        m[:, i, i] = a
    m[1] = m[0].T  # make the two matrices distinguishable
    m[1, 0, 1] = a  # asymmetric tweak
    return m


@pytest.mark.parametrize("xsubo", [None, 19, 60])
@pytest.mark.parametrize("regime", ["default", "cheap", "asym"])
def test_sw_local_batch_matches_scalar(xsubo, regime):
    a, b, o_del, e_del, o_ins, e_ins = {
        "default": (1, 2, 6, 1, 6, 1),
        "cheap": (1, 1, 1, 1, 1, 1),
        "asym": (2, 3, 5, 2, 3, 1),
    }[regime]
    mats = mk_mats(a, b)
    rng = np.random.default_rng(17)
    reqs = []
    oracle = []
    for trial in range(60):
        qlen = int(rng.integers(5, 180))
        tlen = int(rng.integers(5, 400))
        base = rng.integers(0, 4, max(qlen, tlen) + 8).astype(np.uint8)
        q = base[:qlen].copy()
        t = base[4:4 + tlen].copy() if trial % 3 else \
            rng.integers(0, 4, tlen).astype(np.uint8)
        nmut = int(rng.integers(0, 1 + tlen // 5))
        pos = rng.integers(0, tlen, nmut)
        t[pos] = rng.integers(0, 4, nmut).astype(np.uint8)
        m = int(rng.integers(0, 2))
        xb = bool(qlen * a < 250) if trial % 2 else False
        reqs.append((q, t, m, xb))
        oracle.append(sw.sw_align(q, t, mats[m], o_del, e_del, o_ins, e_ins,
                                  xstart=True, xsubo=xsubo, xbyte=xb))
    got = sw_align_batch(reqs, o_del, e_del, o_ins, e_ins, mats, xsubo=xsubo)
    for i, (o, g) in enumerate(zip(oracle, got)):
        for f in ("score", "te", "qe", "score2", "te2", "tb", "qb"):
            assert getattr(o, f) == getattr(g, f), (
                f"lane {i} field {f}: scalar {getattr(o, f)} "
                f"!= batch {getattr(g, f)} (req qlen={len(reqs[i][0])} "
                f"tlen={len(reqs[i][1])} m={reqs[i][2]} u8={reqs[i][3]})")


def test_sw_local_batch_saturation():
    """u8 lanes that saturate at 255 must skip qe/score2 like the scalar."""
    mats = mk_mats(4, 2)
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, 120).astype(np.uint8)
    t = np.concatenate([q, q, q]).astype(np.uint8)  # score ~480 >> 255
    o = sw.sw_align(q, t, mats[0], 6, 1, 6, 1, xstart=True, xsubo=10,
                    xbyte=True)
    g = sw_align_batch([(q, t, 0, True)], 6, 1, 6, 1, mats, xsubo=10)[0]
    assert o.score == 255
    for f in ("score", "te", "qe", "score2", "te2", "tb", "qb"):
        assert getattr(o, f) == getattr(g, f), f
