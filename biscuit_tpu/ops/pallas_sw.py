"""Pallas TPU kernel for the batched banded affine-gap SW extension.

Same semantics as ops/sw_batch.py:sw_extend_batch (exact ksw_extend2,
/root/reference/lib/aln/ksw.c:380-479) with the layout flipped for the TPU
vector unit: the batch rides the 128-wide lane axis and query positions ride
the sublane axis, so every row step is an [Lq, B_TILE] VPU op with the DP
state resident in VMEM. Scatter/gather-free: the per-lane band bookkeeping
(beg/end, h[beg]=h1_first, H[end-1]) is done with iota masks, and the F
prefix max uses a log-step shift-max scan instead of lax.cummax.

Ground truth chain: ops/sw.py (scalar, oracle-tested) -> ops/sw_batch.py
(XLA) -> this kernel (tests/test_pallas_sw.py compares against sw_batch).

Packing ablations (rounds 3-5, all measured on the v5e):
  * native int16 2x vectors FAIL Mosaic legalization (arith.maxsi on
    vector<8x128x2xi16>) on this toolchain (round 3).
  * SWAR 2x (two 15-bit cells per int32 lane, manual carry/borrow
    masking — tools/swar_ablate.py, swar_ablate.json): the max-dominated
    row recurrence measures only 1.09x packed even with the per-field
    band masks and cross-field reductions OMITTED — an upper bound. TPU
    VPU ops count per 32-bit lane, so a SWAR max (~4 bitwise ops + smear
    + blend per 2 fields) replaces 2 native maxes at best break-even;
    the real kernel's field-wise jm masks and h1_first/h1_last
    reductions push it below 1.0. The ksw striped-i8/i16 trick pays on
    SSE hosts because 16-lane byte ops double throughput there; on TPU
    it cannot. 10.5 GCUPS on the survive-all geometry stands as the
    honest number (early-exit-inflated 21.4 retired in round 5).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -(1 << 28)   # plain ints: traced constants can't be captured by kernels
BIGJ = 1 << 28

B_TILE = 128  # lanes per grid program


def _prefix_max_excl(b, Lq):
    """Exclusive running max along axis 0 (query axis): out[j] = max(b[:j]),
    out[0] = NEG. Log-step shift-max scan (no cummax in Mosaic)."""
    # inclusive scan first
    s = 1
    x = b
    while s < Lq:
        shifted = jnp.concatenate(
            [jnp.full((s, x.shape[1]), NEG, jnp.int32), x[:-s]], axis=0)
        x = jnp.maximum(x, shifted)
        s <<= 1
    # shift down by one for exclusive
    return jnp.concatenate(
        [jnp.full((1, x.shape[1]), NEG, jnp.int32), x[:-1]], axis=0)


def _sw_kernel(query_ref, target_ref, matb_ref, qlens_ref, tlens_ref,
               w_ref, h0_ref, rows_ref, out_ref, *, Lq, Lt,
               o_del, e_del, o_ins, e_ins, zdrop):
    """One program = B_TILE lanes. query [Lq, B], target [Lt, B],
    matb [25, B] per-lane scoring matrix, scalars [1, B]. out [8, B].

    The scalar oracle narrows the band from BOTH sides per row
    (ops/sw.py:192-196). The two sides differ in kind:
      * end-narrowing is SEMANTIC: F can propagate past last_nz+1, and ksw
        truncates it at last_nz+2 by construction — so the end carry and
        its last_nz reduction are kept (simplified: the first-nz lower
        bound is redundant for a max, and the empty-band fallback is
        unobservable because m==0 breaks the lane the same row).
      * beg-narrowing is value-transparent: cells left of first_nz are
        provably zero under this kernel's explicit zeroing (M/E/F are
        jm-masked and newh overwrites the out-of-band prefix), F receives
        nothing from a zero prefix, and the h[beg]=h1_first seed is only
        nonzero while the oracle's beg is still 0. So the beg carry and
        the first_nz reduction are dropped; beg_i = max(0, i-w). The
        oracle's beg-driven collapse fires only after an all-dead row,
        which m==0 already broke, so collapse = (i-w >= end_i) observably
        matches.
    Verified against the scalar/XLA oracles over narrowing-adversarial
    cases in tests/test_pallas_sw.py (tiny w, long targets, mid-band death,
    tail regrowth)."""
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    B = B_TILE
    jcell = jax.lax.broadcasted_iota(jnp.int32, (Lq, B), 0)       # cell j
    jfull = jax.lax.broadcasted_iota(jnp.int32, (Lq + 1, B), 0)   # shifted j

    qlens = qlens_ref[0, :]
    tlens = tlens_ref[0, :]
    w = w_ref[0, :]
    h0 = h0_ref[0, :]
    # per-tile trip count: no lane of this tile runs past its own target
    n_rows = jnp.minimum(rows_ref[0, 0], jnp.max(tlens))
    qv = query_ref[...]          # [Lq, B]

    # first H row (ksw.c:395-397): closed-form decay chain
    h1v = jnp.maximum(h0 - oe_ins, 0)
    decay = jnp.maximum(h1v[None, :] - (jfull - 1) * e_ins, 0)
    h_row0 = jnp.where(jfull == 0, h0[None, :],
                       jnp.where(jfull <= qlens[None, :], decay, 0)
                       ).astype(jnp.int32)

    # query profiles: prof[t][j, b] = mat_b[t*5 + qv[j, b]] — the 25-term
    # select runs ONCE here instead of every target row
    prof = []
    for t in range(5):
        Pt = jnp.zeros((Lq, B), jnp.int32)
        for q in range(5):
            Pt = jnp.where(qv == q, matb_ref[t * 5 + q, :][None, :], Pt)
        prof.append(Pt)
    jc_e = jcell * e_ins          # loop-invariant F-scan ramps
    jc1_e = (jcell - 1) * e_ins

    def row(st):
        (i, h, e, end, mx, max_i, max_j, max_ie, gscore, max_off, done) = st
        done_b = done != 0  # carry keeps int32 (Mosaic can't carry i1 vectors)
        act = (~done_b) & (i < tlens)
        beg_i = jnp.maximum(i - w, 0)
        end_i = jnp.minimum(jnp.minimum(end, i + w + 1), qlens)
        collapsed = act & (beg_i >= end_i)
        run = act & (beg_i < end_i)
        at_tail = end_i == qlens

        tb = target_ref[jnp.minimum(i, Lt - 1), :]                 # [B]
        # score row from the precomputed query profiles: 5-term select on
        # the target char (the 25-term per-row select was ~half the kernel)
        S = jnp.zeros((Lq, B), jnp.int32)
        for t in range(5):
            S = jnp.where((tb == t)[None, :], prof[t], S)
        h1_first = jnp.where(beg_i == 0,
                             jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)

        jm = (jcell >= beg_i[None, :]) & (jcell < end_i[None, :])

        Hdiag = h[:-1]
        E = jnp.where(jm, e[:-1], 0)
        M = jnp.where(jm & (Hdiag != 0), Hdiag + S, 0)
        tF = jnp.maximum(M - oe_ins, 0)
        b_arr = jnp.where(jm, tF + jc_e, NEG)
        cm_shift = _prefix_max_excl(b_arr, Lq)
        F = jnp.where(jm, jnp.maximum(cm_shift - jc1_e, 0), 0)
        # M, E, F are all zero outside jm, so H needs no extra mask
        H = jnp.maximum(jnp.maximum(M, E), F)

        m_val = jnp.maximum(jnp.max(H, axis=0), 0)
        # when m_val > 0 its witnesses are in-band; when 0 mj is unused
        mj = jnp.max(jnp.where(H == m_val[None, :], jcell, -1), axis=0)
        h1_last = jnp.max(
            jnp.where(jcell == (end_i - 1)[None, :], H, NEG), axis=0)
        h1_last = jnp.where(run & (h1_last != NEG), h1_last, 0)

        # shifted-row stores via masks (no scatter): h[j+1]=H(j); h[beg]=h1
        Hsh = jnp.concatenate([jnp.zeros((1, B), jnp.int32), H], axis=0)
        newh = jnp.where(jfull == beg_i[None, :], h1_first[None, :], Hsh)
        newe = jnp.where(jm, jnp.maximum(E - e_del, jnp.maximum(M - oe_del, 0)), 0)
        newe = jnp.concatenate([newe, jnp.zeros((1, B), jnp.int32)], axis=0)
        h_out = jnp.where(run[None, :], newh, h)
        e_out = jnp.where(run[None, :], newe, e)

        reach = run & at_tail
        gup = reach & (gscore <= h1_last)
        gscore = jnp.where(gup, h1_last, gscore)
        max_ie = jnp.where(gup, i, max_ie)
        cq = collapsed & at_tail & (gscore <= h1_first)
        gscore = jnp.where(cq, jnp.maximum(gscore, h1_first), gscore)
        max_ie = jnp.where(cq, i, max_ie)

        brk0 = run & (m_val == 0)
        improved = run & (m_val > mx)
        mx_n = jnp.where(improved, m_val, mx)
        max_i_n = jnp.where(improved, i, max_i)
        max_j_n = jnp.where(improved, mj, max_j)
        max_off_n = jnp.where(improved,
                              jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
        di = i - max_i
        dj = mj - max_j
        # logical form (Mosaic can't select between bool vectors)
        dgt = di > dj
        zd = (dgt & (mx - m_val - (di - dj) * e_del > zdrop)) \
            | ((~dgt) & (mx - m_val - (dj - di) * e_ins > zdrop))
        zbrk = run & (~improved) & (zdrop > 0) & zd & (~brk0)

        # end carry: ksw truncates F at last_nz + 2 (semantic, see above);
        # the first-nz lower bound is redundant for a max (no nz left of
        # it), and last_nz = -1 only happens on a lane m==0 just broke
        nz = (h_out != 0) | (e_out != 0)
        last_nz = jnp.max(
            jnp.where(nz & (jfull <= end_i[None, :]), jfull, -1), axis=0)
        new_end = jnp.minimum(last_nz + 2, qlens)
        end_out = jnp.where(run, new_end, end_i)

        # target exhaustion counts as done too, so the all-done early exit
        # fires on mixed-length tiles (not only when every lane z-drops)
        done_n = (done_b | collapsed | brk0 | zbrk
                  | (i + 1 >= tlens)).astype(jnp.int32)
        return (i + 1, h_out, e_out, end_out, mx_n, max_i_n, max_j_n,
                max_ie, gscore, max_off_n, done_n)

    st0 = (jnp.int32(0), h_row0, jnp.zeros((Lq + 1, B), jnp.int32),
           qlens.astype(jnp.int32),
           h0.astype(jnp.int32), jnp.full((B,), -1, jnp.int32),
           jnp.full((B,), -1, jnp.int32), jnp.full((B,), -1, jnp.int32),
           jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32),
           jnp.zeros((B,), jnp.int32))

    def cond(st):
        # early exit once every lane broke/collapsed (the oracle's per-lane
        # break): real batches die early under z-drop
        return (st[0] < n_rows) & (jnp.min(st[10]) == 0)

    fin = jax.lax.while_loop(cond, row, st0)
    (_, _, _, _, mx, max_i, max_j, max_ie, gscore, max_off, _) = fin
    out = jnp.stack([mx, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off,
                     jnp.zeros_like(mx), jnp.zeros_like(mx)])
    out_ref[...] = out


@partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                   "zdrop", "max_rows", "interpret"))
def sw_extend_batch_pallas(query, qlens, target, tlens, mats, matsel,
                           o_del: int, e_del: int, o_ins: int, e_ins: int,
                           w_in, end_bonus, zdrop: int, h0,
                           max_rows: int = 0, interpret: bool = False):
    """Drop-in replacement for ops/sw_batch.py:sw_extend_batch (same inputs,
    same packed [6, B] output) running the row loop as a Pallas TPU kernel."""
    B, Lq = query.shape
    Lt = target.shape[1]
    rows = max_rows if max_rows else Lt

    mat_b = mats[matsel].reshape(B, 25)            # [B, 25] per-lane matrix
    # band clamp (ksw.c:399-407) stays outside the kernel (cheap, per-lane)
    mmax = jnp.max(mats).astype(jnp.int32)
    max_ins = ((qlens * mmax + end_bonus - o_ins) / e_ins + 1.0).astype(jnp.int32)
    w = jnp.minimum(w_in, jnp.maximum(max_ins, 1))
    max_del = ((qlens * mmax + end_bonus - o_del) / e_del + 1.0).astype(jnp.int32)
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    # pad batch to a lane-tile multiple and transpose to [len, B]
    Bp = (B + B_TILE - 1) // B_TILE * B_TILE
    pad = Bp - B

    def padb(x, fill=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    qT = padb(query.astype(jnp.int32)).T           # [Lq, Bp]
    tT = padb(target.astype(jnp.int32)).T          # [Lt, Bp]
    mT = padb(mat_b.astype(jnp.int32)).T           # [25, Bp]
    ql = padb(qlens.astype(jnp.int32))[None, :]    # [1, Bp]
    tl = padb(tlens.astype(jnp.int32))[None, :]
    wv = padb(w.astype(jnp.int32))[None, :]
    h0v = padb(h0.astype(jnp.int32))[None, :]
    rowsv = jnp.full((1, Bp), rows, jnp.int32)

    grid = (Bp // B_TILE,)
    lane_spec = lambda d: pl.BlockSpec((d, B_TILE), lambda b: (0, b))
    out = pl.pallas_call(
        partial(_sw_kernel, Lq=Lq, Lt=Lt, o_del=o_del, e_del=e_del,
                o_ins=o_ins, e_ins=e_ins, zdrop=zdrop),
        grid=grid,
        in_specs=[lane_spec(Lq), lane_spec(Lt), lane_spec(25), lane_spec(1),
                  lane_spec(1), lane_spec(1), lane_spec(1), lane_spec(1)],
        out_specs=lane_spec(8),
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        interpret=interpret,
    )(qT, tT, mT, ql, tl, wv, h0v, rowsv)
    return out[:6, :B]
