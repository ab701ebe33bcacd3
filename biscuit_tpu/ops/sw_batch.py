"""Batched banded affine-gap Smith-Waterman extension on device (JAX).

Vectorized ksw_extend2 semantics (/root/reference/lib/aln/ksw.c:380-479) over
a batch of (query, target) lanes: the row loop runs on device via fori_loop,
each row's cells are computed as vector ops over the query axis, and the
F (gap-in-query) recurrence collapses to a prefix max (lax.cummax) because
ksw derives E/F from the diagonal M rather than H.

Ground truth: ops/sw.py:sw_extend (tested in tests/test_sw_batch.py).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

NEG = jnp.int32(-(1 << 28))
BIGJ = jnp.int32(1 << 28)


@partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                   "zdrop", "max_rows"))
def sw_extend_batch(query: jnp.ndarray, qlens: jnp.ndarray,
                    target: jnp.ndarray, tlens: jnp.ndarray,
                    mats: jnp.ndarray, matsel: jnp.ndarray,
                    o_del: int, e_del: int, o_ins: int, e_ins: int,
                    w_in: jnp.ndarray, end_bonus: jnp.ndarray,
                    zdrop: int, h0: jnp.ndarray, max_rows: int = 0):
    """query [B, Lq] int32 (codes 0..4, pad with 0), qlens [B];
    target [B, Lt] int32, tlens [B]; mats [M, 5, 5] int32, matsel [B];
    w_in / end_bonus / h0 per-lane int32.

    Returns dict(score, qle, tle, gtle, gscore, max_off), each [B] int32,
    with exact ksw_extend2 semantics per lane.
    """
    B, Lq = query.shape
    Lt = target.shape[1]
    rows = max_rows if max_rows else Lt
    jfull = jnp.arange(Lq + 1, dtype=jnp.int32)   # shifted-row positions
    jcell = jfull[:-1]                            # cell positions 0..Lq-1
    lane = jnp.arange(B)
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins

    mat_b = mats[matsel]                          # [B, 5, 5]

    # band clamp (ksw.c:399-407)
    mmax = jnp.max(mats).astype(jnp.int32)
    max_ins = ((qlens * mmax + end_bonus - o_ins) / e_ins + 1.0).astype(jnp.int32)
    w = jnp.minimum(w_in, jnp.maximum(max_ins, 1))
    max_del = ((qlens * mmax + end_bonus - o_del) / e_del + 1.0).astype(jnp.int32)
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    # first H row (ksw.c:395-397): closed form of the decay chain
    h1v = jnp.maximum(h0 - oe_ins, 0)
    decay = jnp.maximum(h1v[:, None] - (jfull[None, :] - 1) * e_ins, 0)
    h_row0 = jnp.where(jfull[None, :] == 0, h0[:, None],
                       jnp.where(jfull[None, :] <= qlens[:, None], decay, 0)
                       ).astype(jnp.int32)

    state = dict(
        h=h_row0,
        e=jnp.zeros((B, Lq + 1), jnp.int32),
        beg=jnp.zeros((B,), jnp.int32),
        end=qlens.astype(jnp.int32),
        max=h0.astype(jnp.int32),
        max_i=jnp.full((B,), -1, jnp.int32),
        max_j=jnp.full((B,), -1, jnp.int32),
        max_ie=jnp.full((B,), -1, jnp.int32),
        gscore=jnp.full((B,), -1, jnp.int32),
        max_off=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )

    def row(i, st):
        i = jnp.int32(i)
        act = (~st["done"]) & (i < tlens)
        beg = jnp.maximum(st["beg"], i - w)
        end = jnp.minimum(jnp.minimum(st["end"], i + w + 1), qlens)
        collapsed = act & (beg >= end)
        run = act & (beg < end)

        tb = target[lane, jnp.clip(i, 0, Lt - 1)]
        S = mat_b[lane[:, None], tb[:, None], query]     # [B, Lq]
        h1_first = jnp.where(beg == 0,
                             jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)

        jm = (jcell[None, :] >= beg[:, None]) & (jcell[None, :] < end[:, None])

        Hdiag = st["h"][:, :-1]
        E = jnp.where(jm, st["e"][:, :-1], 0)
        M = jnp.where(jm & (Hdiag != 0), Hdiag + S, 0)
        # F prefix scan: F(j) = max(0, cummax(tF + j*e_ins)[j-1] - (j-1)*e_ins)
        tF = jnp.maximum(M - oe_ins, 0)
        b_arr = jnp.where(jm, tF + jcell[None, :] * e_ins, NEG)
        cm = jax.lax.cummax(b_arr, axis=1)
        cm_shift = jnp.concatenate([jnp.full((B, 1), NEG), cm[:, :-1]], axis=1)
        F = jnp.maximum(cm_shift - (jcell[None, :] - 1) * e_ins, 0)
        F = jnp.where(jm, F, 0)
        H = jnp.where(jm, jnp.maximum(jnp.maximum(M, E), F), 0)

        # row max and its rightmost position
        m_val = jnp.max(jnp.where(jm, H, NEG), axis=1)
        m_val = jnp.where(m_val == NEG, 0, m_val)
        mj = jnp.max(jnp.where(jm & (H == m_val[:, None]), jcell[None, :], -1), axis=1)
        h1_last = jnp.where(run, H[lane, jnp.clip(end - 1, 0, Lq - 1)], 0)

        # store shifted rows: h[j+1] = H(j); h[beg] = h1_first; e[end] = 0
        newh = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H], axis=1)
        newh = newh.at[lane, beg].set(h1_first)
        newe = jnp.where(jm, jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0)), 0)
        newe = jnp.concatenate([newe, jnp.zeros((B, 1), jnp.int32)], axis=1)
        h_out = jnp.where(run[:, None], newh, st["h"])
        e_out = jnp.where(run[:, None], newe, st["e"])

        # gscore / max_ie when the band reaches the query end
        reach = run & (end == qlens)
        gup = reach & (st["gscore"] <= h1_last)
        gscore = jnp.where(gup, h1_last, st["gscore"])
        max_ie = jnp.where(gup, i, st["max_ie"])
        # collapsed-band quirk (reference still touches gscore with the empty
        # first-column h1 before breaking; see ops/sw.py)
        cq = collapsed & (end == qlens) & (st["gscore"] <= h1_first)
        gscore = jnp.where(cq, jnp.maximum(gscore, h1_first), gscore)
        max_ie = jnp.where(cq, i, max_ie)

        brk0 = run & (m_val == 0)
        improved = run & (m_val > st["max"])
        maxv = jnp.where(improved, m_val, st["max"])
        max_i = jnp.where(improved, i, st["max_i"])
        max_j = jnp.where(improved, mj, st["max_j"])
        max_off = jnp.where(improved,
                            jnp.maximum(st["max_off"], jnp.abs(mj - i)),
                            st["max_off"])
        di = i - st["max_i"]
        dj = mj - st["max_j"]
        zd = jnp.where(di > dj,
                       st["max"] - m_val - (di - dj) * e_del > zdrop,
                       st["max"] - m_val - (dj - di) * e_ins > zdrop)
        zbrk = run & (~improved) & (zdrop > 0) & zd & (~brk0)

        # band shrink over the shifted arrays, backward scan includes j == end
        nz = (h_out != 0) | (e_out != 0)
        f_rng = (jfull[None, :] >= beg[:, None]) & (jfull[None, :] < end[:, None])
        first_nz = jnp.min(jnp.where(f_rng & nz, jfull[None, :], BIGJ), axis=1)
        new_beg = jnp.where(first_nz == BIGJ, end, first_nz)
        b_rng = (jfull[None, :] >= new_beg[:, None]) & (jfull[None, :] <= end[:, None])
        last_nz = jnp.max(jnp.where(b_rng & nz, jfull[None, :], -1), axis=1)
        new_end = jnp.where(last_nz >= new_beg,
                            jnp.minimum(last_nz + 2, qlens),
                            jnp.minimum(new_beg + 1, qlens))
        beg_out = jnp.where(run, new_beg, beg)
        end_out = jnp.where(run, new_end, end)

        done = st["done"] | collapsed | brk0 | zbrk
        return dict(h=h_out, e=e_out, beg=beg_out, end=end_out, max=maxv,
                    max_i=max_i, max_j=max_j, max_ie=max_ie, gscore=gscore,
                    max_off=max_off, done=done)

    final = jax.lax.fori_loop(0, rows, row, state)
    # packed [6, B] so one device->host transfer suffices:
    # rows = score, qle, tle, gtle, gscore, max_off
    return jnp.stack([final["max"], final["max_j"] + 1, final["max_i"] + 1,
                      final["max_ie"] + 1, final["gscore"], final["max_off"]])
