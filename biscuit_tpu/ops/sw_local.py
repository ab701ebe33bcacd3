"""Batched LOCAL alignment (exact ksw_align2) on device (JAX).

Vectorized ops/sw.py:sw_align semantics over a batch of lanes — the mate
rescue kernel (/root/reference/lib/aln/ksw.c:111-334 via
mem_alnreg.c:386-513).  Per-lane quirks carried exactly:

* striped padding: the u8 kernel pads the query to a 16-lane multiple, the
  i16 kernel to 8; pad columns score 0 against every target base and
  participate in row maxima (ksw.c:100-106).  The per-lane `ext` boundary
  is enforced in-kernel (columns >= ext are forced to 0 so their E echo can
  never inflate a later row's maximum).
* u8 saturation: break with score=255 once gmax + shift >= 255
  (shift = (256 - mat.min()) & 0xFF), and skip qe/score2 (ksw.c:211).
* endsc early break (the xstop 0xffff arg) AFTER the row's b-entry and
  gmax update, exactly like the scalar walk.
* score2 run bookkeeping (ksw.c:198-204): per-row maxima are returned to
  the host ([Lt, B]) and the quirky run segmentation — a run splits when
  its stored row index goes stale because a non-improving row didn't
  update it — replays in numpy across all lanes at once.

The forward pass gives (score, te, qe, score2, te2); the reverse pass
(query/target prefixes reversed, endsc = score) gives (tb, qb) — two
batched kernel calls per round, assembled by sw_align_batch.

Ground truth: ops/sw.py:sw_align (tests/test_sw_local.py fuzzes both
u8/i16 regimes against it).
"""
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .sw import KswResult

NEGB = jnp.int32(-(1 << 28))


@partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins"))
def sw_local_kernel(query, qlens, target, tlens, mats, matsel,
                    o_del: int, e_del: int, o_ins: int, e_ins: int,
                    minsc, endsc, u8):
    """query [B, Lq] int32 codes (pad 4), target [B, Lt]; mats [M, 5, 5];
    minsc/endsc [B] int32; u8 [B] int32 (1 = byte-kernel semantics).
    Lq must be a multiple of 16 (so every per-lane ext fits).

    Returns dict(gmax, te, qe, shift, sat, imax_rows [Lt, B]) — score2/run
    logic happens on the host (local_post)."""
    B, Lq = query.shape
    Lt = target.shape[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    jcell = jnp.arange(Lq, dtype=jnp.int32)

    mat_b = mats[matsel]                              # [B, 5, 5]
    shift = jnp.where(u8 > 0,
                      (256 - jnp.min(mat_b.reshape(B, 25), axis=1)) & 0xFF,
                      0).astype(jnp.int32)
    lanes = jnp.where(u8 > 0, 16, 8).astype(jnp.int32)
    ext = (qlens + lanes - 1) // lanes * lanes        # [B]

    # per-target-class query profiles: prof [5, B, Lq] (the 25-term select
    # runs once; each row needs one 5-way pick on the target char)
    prof = []
    for t in range(5):
        Pt = jnp.zeros((B, Lq), jnp.int32)
        for q in range(5):
            Pt = jnp.where(query == q, mat_b[:, t, q][:, None], Pt)
        # striped pad columns (qlen <= j < ext) score 0; j >= ext excluded
        Pt = jnp.where(jcell[None, :] < qlens[:, None], Pt, 0)
        prof.append(Pt)
    prof = jnp.stack(prof)                            # [5, B, Lq]
    inb = jcell[None, :] < ext[:, None]               # [B, Lq] in-stripe

    def row(st):
        (i, H, E, Hmax, gmax, te, done, rows_buf) = st
        active = (done == 0) & (i < tlens)            # [B]
        tb = target[:, i]                             # [B]
        S = jnp.zeros((B, Lq), jnp.int32)
        for t in range(5):
            S = jnp.where((tb == t)[:, None], prof[t], S)

        Hdiag = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), H[:, :-1]], axis=1)
        M = jnp.maximum(Hdiag + S, 0)
        H1 = jnp.maximum(M, E)
        tF = jnp.maximum(H1 - oe_ins, 0)
        # F prefix scan: F(0)=0, F(j)=max(-j*e, cummax(tF + j*e)[j-1]-(j-1)*e)
        b_arr = tF + jcell[None, :] * e_ins
        cm = jax.lax.cummax(b_arr, axis=1)
        cm_excl = jnp.concatenate([jnp.full((B, 1), NEGB), cm[:, :-1]], axis=1)
        F = jnp.maximum(-jcell[None, :] * e_ins,
                        cm_excl - (jcell[None, :] - 1) * e_ins)
        F = jnp.maximum(F, 0)
        Hn = jnp.maximum(H1, F)
        Hn = jnp.where(inb, Hn, 0)                    # cut the stripe at ext
        En = jnp.maximum(E - e_del, jnp.maximum(Hn - oe_del, 0))
        En = jnp.where(inb, En, 0)

        imax = jnp.max(Hn, axis=1)                    # [B] (>= 0; pad-safe)
        upd = active & (imax > gmax)
        gmax_n = jnp.where(upd, imax, gmax)
        te_n = jnp.where(upd, i, te)
        Hmax_n = jnp.where(upd[:, None], Hn, Hmax)
        # break AFTER this row's update (ksw.c:207-212 / :325-328)
        brk = upd & (((u8 > 0) & (gmax_n + shift >= 255)) | (gmax_n >= endsc))
        # fold target exhaustion in so the all-done early exit fires
        done_n = done | jnp.where(brk | (i + 1 >= tlens), 1, 0)
        # rows where the lane was inactive record -inf (never >= minsc)
        rows_buf = jax.lax.dynamic_update_slice(
            rows_buf, jnp.where(active, imax, NEGB)[None, :], (i, 0))
        H2 = jnp.where(active[:, None], Hn, H)
        E2 = jnp.where(active[:, None], En, E)
        return (i + 1, H2, E2, Hmax_n, gmax_n, te_n, done_n, rows_buf)

    def cond(st):
        i, _, _, _, _, _, done, _ = st
        return (i < Lt) & (jnp.min(done) == 0)

    st0 = (jnp.int32(0),
           jnp.zeros((B, Lq), jnp.int32), jnp.zeros((B, Lq), jnp.int32),
           jnp.zeros((B, Lq), jnp.int32), jnp.zeros((B,), jnp.int32),
           jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32),
           jnp.full((Lt, B), NEGB, jnp.int32))
    (_, _, _, Hmax, gmax, te, _, rows_buf) = jax.lax.while_loop(cond, row, st0)

    sat = (u8 > 0) & (gmax + shift >= 255)
    qe = jnp.argmax(Hmax, axis=1).astype(jnp.int32)   # first max (np.argmax)
    return dict(gmax=gmax, te=te, qe=qe, shift=shift,
                sat=sat.astype(jnp.int32), imax_rows=rows_buf)


def local_post(out, mats_np, matsel, minsc, tlens) -> List[KswResult]:
    """Host side of the forward pass: saturation, qe gating, and the score2
    run bookkeeping replayed from the per-row maxima (ops/sw.py:276-299)."""
    gmax = np.asarray(out["gmax"])
    te = np.asarray(out["te"])
    qe = np.asarray(out["qe"])
    sat = np.asarray(out["sat"]).astype(bool)
    rows = np.asarray(out["imax_rows"])               # [Lt, B]
    B = gmax.shape[0]
    Lt = rows.shape[0]
    minsc = np.asarray(minsc)
    tlens = np.asarray(tlens)

    res = [KswResult() for _ in range(B)]
    score = np.where(sat, 255, gmax)
    mmax = mats_np[matsel].reshape(B, 25).max(axis=1)
    iw = (score + mmax - 1) // np.maximum(mmax, 1)
    low, high = te - iw, te + iw

    # replay the run list: entries finalize when the row chain breaks
    # (b[-1][1] + 1 != i) — note a non-improving row does NOT refresh the
    # stored index, so monotone-decreasing runs split (ksw.c:198-204)
    ent_sc = np.full(B, -1, np.int64)                 # open entry score
    ent_i = np.full(B, -2, np.int64)                  # open entry row
    score2 = np.full(B, -1, np.int64)
    te2 = np.full(B, -1, np.int64)

    def finalize(mask):
        el = mask & (ent_i >= 0)
        outside = (ent_i < low) | (ent_i > high)
        win = el & outside & (ent_sc > score2)
        score2[win] = ent_sc[win]
        te2[win] = ent_i[win]
        ent_sc[mask] = -1
        ent_i[mask] = -2

    for i in range(Lt):
        imax = rows[i].astype(np.int64)
        hit = imax >= minsc
        cont = hit & (ent_i + 1 == i)
        start = hit & ~cont
        finalize(start)                               # previous run closed
        ent_sc[start] = imax[start]
        ent_i[start] = i
        improve = cont & (ent_sc < imax)
        ent_sc[improve] = imax[improve]
        ent_i[improve] = i
        # non-improving continuation rows leave ent_i stale on purpose
    finalize(np.ones(B, bool))

    for b in range(B):
        r = res[b]
        r.score = int(score[b])
        r.te = int(te[b])
        if sat[b]:
            continue                                  # skip qe/score2
        r.qe = int(qe[b])
        if score2[b] > -1:
            r.score2 = int(score2[b])
            r.te2 = int(te2[b])
    return res


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


def sw_align_batch(reqs, o_del: int, e_del: int, o_ins: int, e_ins: int,
                   mats_np: np.ndarray,
                   xsubo: Optional[int] = None) -> List[KswResult]:
    """Batched exact ksw_align2 (xstart=True) over request tuples
    (query u8[ql], target u8[tl], matsel int, xbyte bool).  mats_np
    [M, 5, 5].  xsubo as in sw.sw_align (same for every lane — matesw
    passes opt.min_seed_len * opt.a).  Returns one KswResult per request,
    bit-identical to [sw.sw_align(q, t, mats[m], ...) for ...]."""
    if not reqs:
        return []
    B = len(reqs)
    Lq = _pow2(max(len(r[0]) for r in reqs), 16)
    Lt = _pow2(max(len(r[1]) for r in reqs), 16)
    Bp = _pow2(B, 8)
    q = np.full((Bp, Lq), 4, np.int32)
    t = np.full((Bp, Lt), 4, np.int32)
    qlens = np.ones(Bp, np.int32)
    tlens = np.ones(Bp, np.int32)
    msel = np.zeros(Bp, np.int32)
    u8v = np.zeros(Bp, np.int32)
    for i, (qq, tt, m, xb) in enumerate(reqs):
        q[i, :len(qq)] = qq
        qlens[i] = len(qq)
        t[i, :len(tt)] = tt
        tlens[i] = len(tt)
        msel[i] = m
        u8v[i] = 1 if xb else 0
    minsc = np.full(Bp, xsubo if xsubo is not None else 0x10000, np.int32)
    endsc = np.full(Bp, 0x10000, np.int32)

    out = sw_local_kernel(jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(t),
                          jnp.asarray(tlens), jnp.asarray(mats_np),
                          jnp.asarray(msel), o_del, e_del, o_ins, e_ins,
                          jnp.asarray(minsc), jnp.asarray(endsc),
                          jnp.asarray(u8v))
    fwd = local_post(out, mats_np, msel, minsc, tlens)[:B]

    # reverse pass for (tb, qb): prefixes up to (qe, te), reversed, with
    # endsc = fwd score (sw.py:312-320); skipped when xsubo given and the
    # score missed it, or when the lane saturated/never scored (qe < 0)
    rev_idx = []
    rev_reqs = []
    for i, r in enumerate(fwd):
        if xsubo is not None and r.score < xsubo:
            continue
        if r.qe < 0 or r.te < 0:
            # empty reverse input: _local_core returns the default result
            # (score 0) — combine exactly like the scalar path does
            rr = KswResult()
            if rr.score == r.score:
                r.tb = r.te - rr.te
                r.qb = r.qe - rr.qe
            continue
        qq, tt, m, xb = reqs[i]
        rev_reqs.append((np.ascontiguousarray(qq[:r.qe + 1][::-1]),
                         np.ascontiguousarray(tt[:r.te + 1][::-1]), m, xb))
        rev_idx.append(i)
    if rev_reqs:
        B2 = len(rev_reqs)
        Lq2 = _pow2(max(len(r[0]) for r in rev_reqs), 16)
        Lt2 = _pow2(max(len(r[1]) for r in rev_reqs), 16)
        Bp2 = _pow2(B2, 8)
        q2 = np.full((Bp2, Lq2), 4, np.int32)
        t2 = np.full((Bp2, Lt2), 4, np.int32)
        ql2 = np.ones(Bp2, np.int32)
        tl2 = np.ones(Bp2, np.int32)
        ms2 = np.zeros(Bp2, np.int32)
        u82 = np.zeros(Bp2, np.int32)
        en2 = np.full(Bp2, 0x10000, np.int32)
        for i, (qq, tt, m, xb) in enumerate(rev_reqs):
            q2[i, :len(qq)] = qq
            ql2[i] = len(qq)
            t2[i, :len(tt)] = tt
            tl2[i] = len(tt)
            ms2[i] = m
            u82[i] = 1 if xb else 0
            en2[i] = fwd[rev_idx[i]].score
        mn2 = np.full(Bp2, 0x10000, np.int32)
        out2 = sw_local_kernel(jnp.asarray(q2), jnp.asarray(ql2),
                               jnp.asarray(t2), jnp.asarray(tl2),
                               jnp.asarray(mats_np), jnp.asarray(ms2),
                               o_del, e_del, o_ins, e_ins,
                               jnp.asarray(mn2), jnp.asarray(en2),
                               jnp.asarray(u82))
        rev = local_post(out2, mats_np, ms2, mn2, tl2)[:B2]
        for k, i in enumerate(rev_idx):
            if rev[k].score == fwd[i].score:
                fwd[i].tb = fwd[i].te - rev[k].te
                fwd[i].qb = fwd[i].qe - rev[k].qe
    return fwd
