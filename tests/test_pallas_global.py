"""Batched banded global alignment (Pallas DP + XLA traceback) vs the
scalar oracle ops/sw.py:sw_global (== ksw_global2, already ctypes-diffed
against the reference's libref_aln.so in test_sw.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from biscuit_tpu.ops import sw
from biscuit_tpu.ops.pallas_global import (decode_cigars, global_traceback,
                                           sw_global_batch_pallas)


def _rand_case(rng, qlen, tlen):
    q = rng.integers(0, 4, qlen).astype(np.int32)
    # target = mutated copy so alignments are realistic, not noise
    t = q.copy()
    nmut = max(1, tlen // 12)
    for _ in range(nmut):
        p = int(rng.integers(0, len(t)))
        r = rng.random()
        if r < 0.5:
            t[p] = rng.integers(0, 4)
        elif r < 0.75 and len(t) > 4:
            t = np.delete(t, p)
        else:
            t = np.insert(t, p, rng.integers(0, 4))
    if len(t) < tlen:
        t = np.concatenate([t, rng.integers(0, 4, tlen - len(t))])
    t = t[:tlen].astype(np.int32)
    return q, t


def _run_batch(cases, mats, matsel, o_del, e_del, o_ins, e_ins, ws):
    B = len(cases)
    Lq = max(len(q) for q, _ in cases)
    Lt = max(len(t) for _, t in cases)
    q = np.full((B, Lq), 4, np.int32)
    t = np.full((B, Lt), 4, np.int32)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for b, (qq, tt) in enumerate(cases):
        q[b, :len(qq)] = qq
        t[b, :len(tt)] = tt
        qlens[b] = len(qq)
        tlens[b] = len(tt)
    score, z = sw_global_batch_pallas(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(t),
        jnp.asarray(tlens), jnp.asarray(mats), jnp.asarray(matsel),
        o_del, e_del, o_ins, e_ins, jnp.asarray(ws), interpret=True)
    ops, n_ops, ov = global_traceback(
        z, jnp.asarray(qlens), jnp.asarray(tlens), jnp.asarray(ws))
    assert not bool(np.asarray(ov).any())
    return (np.asarray(score),
            decode_cigars(np.asarray(ops), np.asarray(n_ops)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_global_batch_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    mat = np.full((5, 5), -2, np.int64)
    np.fill_diagonal(mat, 1)
    mat[4, :] = -1
    mat[:, 4] = -1
    mat2 = mat.copy()
    mat2[1, 3] = 1  # asymmetric bisulfite-style matrix
    mats = np.stack([mat, mat2]).astype(np.int32)
    o_del, e_del, o_ins, e_ins = 6, 1, 5, 2

    cases, ws, matsel = [], [], []
    for i in range(48):
        qlen = int(rng.integers(8, 101))
        tlen = int(rng.integers(max(4, qlen - 10), qlen + 12))
        w = int(rng.integers(3, 40))
        w = max(w, abs(tlen - qlen) + 3)  # gen_cigar's min_w floor
        cases.append(_rand_case(rng, qlen, tlen))
        ws.append(w)
        matsel.append(i & 1)
    scores, cigars = _run_batch(cases, mats, np.array(matsel, np.int32),
                                o_del, e_del, o_ins, e_ins,
                                np.array(ws, np.int32))
    for b, (q, t) in enumerate(cases):
        want_s, want_c = sw.sw_global(q, t, mats[matsel[b]].astype(np.int64),
                                      o_del, e_del, o_ins, e_ins, ws[b])
        assert scores[b] == want_s, f"lane {b}: {scores[b]} != {want_s}"
        assert cigars[b] == want_c, f"lane {b}:\n {cigars[b]}\n {want_c}"


def test_global_batch_narrow_band_and_edges():
    """w=1 bands, tlen >> qlen within band, single-base cases."""
    rng = np.random.default_rng(7)
    mat = np.full((5, 5), -3, np.int64)
    np.fill_diagonal(mat, 2)
    mats = np.stack([mat]).astype(np.int32)
    o_del, e_del, o_ins, e_ins = 6, 1, 6, 1
    cases, ws = [], []
    for qlen, tlen, w in [(1, 1, 1), (1, 3, 3), (3, 1, 3), (5, 5, 1),
                          (16, 20, 5), (30, 30, 2), (8, 8, 30)]:
        cases.append(_rand_case(rng, qlen, tlen))
        ws.append(w)
    scores, cigars = _run_batch(cases, mats,
                                np.zeros(len(cases), np.int32),
                                o_del, e_del, o_ins, e_ins,
                                np.array(ws, np.int32))
    for b, (q, t) in enumerate(cases):
        want_s, want_c = sw.sw_global(q, t, mat, o_del, e_del, o_ins,
                                      e_ins, ws[b])
        assert scores[b] == want_s
        assert cigars[b] == want_c


def test_traceback_overflow_flags():
    """max_ops too small -> lane flagged, not silently truncated."""
    rng = np.random.default_rng(3)
    mat = np.full((5, 5), -2, np.int64)
    np.fill_diagonal(mat, 1)
    mats = np.stack([mat]).astype(np.int32)
    cases = [_rand_case(rng, 60, 64) for _ in range(4)]
    B = len(cases)
    q = np.full((B, 64), 4, np.int32)
    t = np.full((B, 64), 4, np.int32)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for b, (qq, tt) in enumerate(cases):
        q[b, :len(qq)] = qq
        t[b, :len(tt)] = tt
        qlens[b], tlens[b] = len(qq), len(tt)
    ws = np.full(B, 10, np.int32)
    score, z = sw_global_batch_pallas(
        jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(t),
        jnp.asarray(tlens), jnp.asarray(mats),
        jnp.zeros(B, jnp.int32), 6, 1, 6, 1, jnp.asarray(ws),
        interpret=True)
    _, _, ov = global_traceback(z, jnp.asarray(qlens), jnp.asarray(tlens),
                                jnp.asarray(ws), max_ops=2)
    assert bool(np.asarray(ov).any())
