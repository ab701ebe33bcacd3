"""Pallas TPU kernel for batched banded GLOBAL alignment with CIGAR.

Same semantics as ops/sw.py:sw_global (exact ksw_global2,
/root/reference/lib/aln/ksw.c:504-606): banded affine-gap global DP with a
per-cell direction byte, then a traceback.  TPU-first split:

* The DP runs as a Pallas kernel with the batch on the 128-wide lane axis
  and query cells on the sublane axis (same layout as ops/pallas_sw.py).
  The grid's second dimension walks target rows; the H/E rows persist in
  VMEM scratch across grid steps (TPU grids execute sequentially), and each
  step writes one [Lq, B] direction-byte row straight to HBM — the full z
  matrix never occupies VMEM.
* The traceback is data-dependent pointer chasing — one byte per step —
  so it runs as an XLA while_loop over the whole batch: one per-lane
  row-gather from z per step (TPU gathers are row-rate-bound, so B lanes
  cost one gather issue), emitting run-length-merged ops into a B-minor
  buffer.  Everything stays on device; only the packed ops (a few hundred
  bytes per read) ever cross D2H.

Direction bits per cell (matching the scalar oracle ops/sw.py:176-184):
  bits 0-1: which of M/E/F made H (0=M, 1=E, 2/3=F)
  bit  2  : E(i+1) extended from E (not opened from M)
  bit  5  : F(i, j+1) extended from F
z rows outside a lane's band hold junk; the traceback provably never
leaves the band (same invariant as the reference's packed-band z).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MINUS_INF = -0x40000000   # the scalar oracle's sentinel (ops/sw.py:20) —
# it is RAMPED (f0 - j*e_ins, h1_first - ...) and its exact value reaches
# the direction bits of in-band sentinel cells, so the kernel must use the
# same constant; every derived value stays within int32.
VERYNEG = -0x48000000     # below any ramped MINUS_INF; loses every max
B_TILE = 128

# cigar op codes (BAM): 0=M, 1=I (consumes query), 2=D (consumes target)


def _init_he(qlens, w, jfull, Lq, o_ins, e_ins):
    """h_row[0]=0; h_row[j]=-(o_ins+e_ins*j) for 1<=j<=min(w,qlen);
    else MINUS_INF (ops/sw.py:156-162)."""
    B = B_TILE
    h0 = jnp.where(
        jfull == 0, 0,
        jnp.where((jfull <= w[None, :]) & (jfull <= qlens[None, :]),
                  -(o_ins + e_ins * jfull), MINUS_INF)).astype(jnp.int32)
    return h0, jnp.full((Lq, B), MINUS_INF, jnp.int32)


def _row_body(i, tb, h, e, prof, qlens, tlens, w, jcell, jfull, Lq,
              o_del, e_del, o_ins, e_ins, _ablate=""):
    """One banded DP target row for B_TILE lanes: returns the direction
    plane d [Lq, B] (0 outside run/band) and the run-masked next (h, e).
    prof: list of 5 [Lq, B] query score profiles (one per target char)."""
    B = B_TILE
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    run = i < tlens                                     # [B]
    beg = jnp.maximum(i - w, 0)
    end = jnp.minimum(jnp.minimum(i + w + 1, qlens), Lq)
    h1_first = jnp.where(beg == 0, -(o_del + e_del * (i + 1)), MINUS_INF)

    S = jnp.zeros((Lq, B), jnp.int32)
    for t in range(5):
        S = jnp.where((tb == t)[None, :], prof[t], S)

    jm = (jcell >= beg[None, :]) & (jcell < end[None, :])

    Hdiag = h[:-1]
    E = e
    M = Hdiag + S
    # F(beg)=f0=MINUS_INF; F(j)=max(F(j-1)-e_ins, M(j-1)-oe_ins).  Scalar
    # closed form (ops/sw.py:_f_scan): F(j) = max(f0 - (j-beg)*e_ins,
    # max_{j'<j}(t(j') + j'*e_ins) - (j-1)*e_ins) with t = M - oe_ins; the
    # beg offset cancels in the second term so a global-j ramp works.
    if "scan" in _ablate:        # diagnostics only: F share of step cost
        F = M - oe_ins
    else:
        b_arr = jnp.where(jm, (M - oe_ins) + jcell * e_ins, VERYNEG)
        s = 1
        x = b_arr
        while s < Lq:
            x = jnp.maximum(
                x, jnp.concatenate(
                    [jnp.full((s, B), VERYNEG, jnp.int32), x[:-s]], axis=0))
            s <<= 1
        cm_excl = jnp.concatenate(
            [jnp.full((1, B), VERYNEG, jnp.int32), x[:-1]], axis=0)
        F = jnp.maximum(MINUS_INF - (jcell - beg[None, :]) * e_ins,
                        cm_excl - (jcell - 1) * e_ins)
    ME = jnp.maximum(M, E)
    H = jnp.maximum(ME, F)

    # direction byte (ops/sw.py:176-184)
    d = jnp.where(M >= E, 0, 1)
    d = jnp.where(H > ME, 2, d)
    d = d | (((E - e_del) > (M - oe_del)).astype(jnp.int32) << 2)
    d = d | (((F - e_ins) > (M - oe_ins)).astype(jnp.int32) << 5)
    d = jnp.where(run[None, :] & jm, d, 0)

    # stores: h[beg]=h1_first; h[j+1]=H(j) for j in band; e[j] in band,
    # e[end]=MINUS_INF (ops/sw.py:186-190)
    Hsh = jnp.concatenate([jnp.zeros((1, B), jnp.int32), H], axis=0)
    jmsh = (jfull >= (beg + 1)[None, :]) & (jfull <= end[None, :])
    newh = jnp.where(jfull == beg[None, :], h1_first[None, :],
                     jnp.where(jmsh, Hsh, h))
    newe = jnp.where(jm, jnp.maximum(E - e_del, M - oe_del),
                     jnp.where(jcell == end[None, :], MINUS_INF, e))
    return (d, jnp.where(run[None, :], newh, h),
            jnp.where(run[None, :], newe, e))


def _profiles(query_ref, matb_ref, Lq):
    """Query score profiles (pallas_sw trick): the 25-term select runs
    ONCE; every row then needs only a 5-term select on the target char."""
    B = B_TILE
    qv0 = query_ref[...]
    prof = []
    for t in range(5):
        Pt = jnp.zeros((Lq, B), jnp.int32)
        for q in range(5):
            Pt = jnp.where(qv0 == q, matb_ref[t * 5 + q, :][None, :], Pt)
        prof.append(Pt)
    return prof


def _glob_kernel(query_ref, target_ref, matb_ref, qlens_ref, tlens_ref,
                 w_ref, score_ref, z_ref, h_scr, e_scr, prof_scr, *, Lq,
                 o_del, e_del, o_ins, e_ins, _ablate=""):
    """Grid (b_tile, i): one target row for B_TILE lanes per step.
    query [Lq, B], target block [Lt, B] resident, matb [25, B],
    scalars [1, B].  score [1, B] (final h[qlen]); z block [1, Lq, B]
    int32 holds FOUR packed direction bytes per word (target rows
    4t..4t+3 at bit 8*(i&3)): the block's index_map revisits the same
    block for 4 consecutive grid steps, so it stays in VMEM and flushes
    to HBM once — 1 byte/cell of write traffic.  h_scr [Lq+1, B],
    e_scr [Lq, B] and the query score profiles prof_scr [5*Lq, B]
    persist across i steps.

    Structure notes (r4 on-chip ablation, 512x128x160 honest compute-only
    timing — args pre-uploaded, scalar-D2H sync): this shape measures
    9.0 GCUPS; a 4-rows-per-step variant (packed word stored once, no
    RMW) measured SLOWER (7.0 — the 4-row body's live set spills), and an
    internal fori_loop variant with the whole z in VMEM measured 6.6
    (loop-carried [Lq,B] vectors bounce through VMEM).  Ablations: the
    F shift-max scan costs ~11% of step time, the z write ~28%."""
    i = pl.program_id(1)
    B = B_TILE
    jcell = jax.lax.broadcasted_iota(jnp.int32, (Lq, B), 0)
    jfull = jax.lax.broadcasted_iota(jnp.int32, (Lq + 1, B), 0)

    qlens = qlens_ref[0, :]
    tlens = tlens_ref[0, :]
    w = w_ref[0, :]

    @pl.when(i == 0)
    def _init():
        h0, e0 = _init_he(qlens, w, jfull, Lq, o_ins, e_ins)
        h_scr[...] = h0
        e_scr[...] = e0
        prof = _profiles(query_ref, matb_ref, Lq)
        for t in range(5):
            prof_scr[pl.ds(t * Lq, Lq), :] = prof[t]

    # dynamic one-row REF slice — a (1, B_TILE) row block fails Mosaic's
    # (8, 128) tiling requirement, so the whole target block stays
    # resident and is row-sliced per step
    tb = target_ref[pl.ds(i, 1), :][0, :]
    prof = [prof_scr[pl.ds(t * Lq, Lq), :] for t in range(5)]
    d, newh, newe = _row_body(
        i, tb, h_scr[...], e_scr[...], prof, qlens, tlens, w, jcell, jfull,
        Lq, o_del, e_del, o_ins, e_ins, _ablate)
    # pack 4 rows per int32 word: bits 8*(i&3). The z block (index i//4)
    # is revisited for 4 consecutive steps, so the OR accumulates in VMEM.
    sub = (i & 3) << 3
    word = (d << sub)[None]
    if "z" not in _ablate:       # diagnostics: z-write share of step cost
        z_ref[...] = jnp.where(sub == 0, word, z_ref[...] | word)
    h_scr[...] = newh
    e_scr[...] = newe

    # final score h[qlen]: write every step; the last active row wins
    hq = jnp.sum(jnp.where(jfull == qlens[None, :], newh, 0), axis=0)
    score_ref[...] = hq[None, :]


@partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                   "interpret", "_ablate"))
def sw_global_batch_pallas(query, qlens, target, tlens, mats, matsel,
                           o_del: int, e_del: int, o_ins: int, e_ins: int,
                           w, interpret: bool = False, _ablate: str = ""):
    """Banded global DP for a padded batch.  query [B, Lq], target [B, Lt]
    (codes 0-4, pad 4), per-lane band w [B].  Returns (score [B] int32,
    z [ceil(Lt/4), Lq, Bp] int32 with four packed direction bytes per word,
    target row i at bits 8*(i&3)) — z stays on device for
    global_traceback."""
    B, Lq = query.shape
    Lt = target.shape[1]
    Lt4 = (Lt + 3) // 4
    mat_b = mats[matsel].reshape(B, 25)
    Bp = (B + B_TILE - 1) // B_TILE * B_TILE
    pad = Bp - B

    def padb(x, fill=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    qT = padb(query.astype(jnp.int32)).T
    tT = padb(target.astype(jnp.int32)).T
    mT = padb(mat_b.astype(jnp.int32)).T
    ql = padb(qlens.astype(jnp.int32))[None, :]
    tl = padb(jnp.maximum(tlens.astype(jnp.int32), 1))[None, :]
    wv = padb(jnp.maximum(w.astype(jnp.int32), 1))[None, :]

    lane = lambda d: pl.BlockSpec((d, B_TILE), lambda b, i: (0, b))
    score, z = pl.pallas_call(
        partial(_glob_kernel, Lq=Lq, o_del=o_del, e_del=e_del,
                o_ins=o_ins, e_ins=e_ins, _ablate=_ablate),
        grid=(Bp // B_TILE, Lt),
        in_specs=[lane(Lq),
                  pl.BlockSpec((Lt, B_TILE), lambda b, i: (0, b)),
                  lane(25), lane(1), lane(1), lane(1)],
        out_specs=[lane(1),
                   pl.BlockSpec((1, Lq, B_TILE), lambda b, i: (i // 4, 0, b))],
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                   jax.ShapeDtypeStruct((Lt4, Lq, Bp), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((Lq + 1, B_TILE), jnp.int32),
                        pltpu.VMEM((Lq, B_TILE), jnp.int32),
                        pltpu.VMEM((5 * Lq, B_TILE), jnp.int32)],
        interpret=interpret,
    )(qT, tT, mT, ql, tl, wv)
    return score[0, :B], z


@partial(jax.jit, static_argnames=("max_ops",))
def global_traceback(z, qlens, tlens, w, max_ops: int = 64):
    """Traceback over the direction bytes (ops/sw.py:203-218), whole batch
    in lockstep.  z [Lt4, Lq, Bp] from sw_global_batch_pallas (4 packed
    bytes per word, target row i at bits 8*(i&3)); returns
    (ops [max_ops, B] int32 packed op|len<<4 in REFERENCE order,
    n_ops [B], overflow [B] bool).  One per-lane row-gather per step."""
    Lt4, Lq, Bp = z.shape
    B = qlens.shape[0]
    # per-lane rows: flatten to [Bp, Lt4*Lq] so each step is one row-gather
    zb = z.reshape(Lt4 * Lq, Bp).T
    i0 = tlens.astype(jnp.int32) - 1
    k0 = jnp.minimum(i0 + w.astype(jnp.int32) + 1, qlens.astype(jnp.int32)) - 1

    st = dict(
        i=i0, k=k0, which=jnp.zeros((B,), jnp.int32),
        ops=jnp.zeros((max_ops, B), jnp.int32),
        n=jnp.zeros((B,), jnp.int32),
        last_op=jnp.full((B,), -1, jnp.int32),
        last_len=jnp.zeros((B,), jnp.int32),
        ov=jnp.zeros((B,), jnp.bool_),
    )

    def push(st, op, ln, mask):
        """Run-length push: extend the open run or emit it and open a new
        one (scalar push(), ops/sw.py:197-201)."""
        same = mask & (st["last_op"] == op)
        newr = mask & (~same)
        # emit the open run when a different op arrives
        emit = newr & (st["last_op"] >= 0)
        oh = (jnp.arange(max_ops, dtype=jnp.int32)[:, None]
              == jnp.minimum(st["n"], max_ops - 1)[None, :]) & emit[None, :]
        packed = st["last_op"] | (st["last_len"] << 4)
        ops = jnp.where(oh, packed[None, :], st["ops"])
        n = jnp.where(emit, st["n"] + 1, st["n"])
        ov = st["ov"] | (emit & (st["n"] >= max_ops))
        return dict(st, ops=ops, n=n, ov=ov,
                    last_op=jnp.where(newr, op, st["last_op"]),
                    last_len=jnp.where(same, st["last_len"] + ln,
                                       jnp.where(newr, ln, st["last_len"])))

    def cond(st):
        return ((st["i"] >= 0) & (st["k"] >= 0)).any()

    def step(st):
        act = (st["i"] >= 0) & (st["k"] >= 0)
        isafe = jnp.where(act, st["i"], 0)
        ksafe = jnp.where(act, st["k"], 0)
        row = (isafe >> 2) * Lq + ksafe
        word = jnp.take_along_axis(zb[:B], row[:, None], axis=1)[:, 0]
        byte = (word >> ((isafe & 3) << 3)) & 0xFF
        which = (byte >> (st["which"] << 1)) & 3
        is_m = act & (which == 0)
        is_d = act & (which == 1)
        is_i = act & (which >= 2)
        st = push(st, jnp.int32(0), jnp.int32(1), is_m)
        st = push(st, jnp.int32(2), jnp.int32(1), is_d)
        st = push(st, jnp.int32(1), jnp.int32(1), is_i)
        return dict(st,
                    i=jnp.where(is_m | is_d, st["i"] - 1, st["i"]),
                    k=jnp.where(is_m | is_i, st["k"] - 1, st["k"]),
                    which=jnp.where(act, which, st["which"]))

    st = jax.lax.while_loop(cond, step, st)
    # tails: if i >= 0 push(D, i+1); if k >= 0 push(I, k+1)
    st = push(st, jnp.int32(2), st["i"] + 1, st["i"] >= 0)
    st = push(st, jnp.int32(1), st["k"] + 1, st["k"] >= 0)
    # flush the open run (op 3 never matches a real last_op)
    st = push(st, jnp.int32(3), jnp.int32(0), jnp.ones((B,), jnp.bool_))
    # ops were emitted end-to-start; reverse each lane's prefix
    idx = jnp.arange(max_ops, dtype=jnp.int32)[:, None]
    rev = jnp.clip(st["n"][None, :] - 1 - idx, 0, max_ops - 1)
    ops_rev = jnp.take_along_axis(st["ops"], rev, axis=0)
    ops_rev = jnp.where(idx < st["n"][None, :], ops_rev, 0)
    return ops_rev, st["n"], st["ov"]


def decode_cigars(ops: np.ndarray, n_ops: np.ndarray):
    """[max_ops, B], [B] -> list of [(op, len), ...] per lane."""
    out = []
    for b in range(ops.shape[1]):
        n = int(n_ops[b])
        out.append([(int(ops[j, b]) & 15, int(ops[j, b]) >> 4)
                    for j in range(n)])
    return out
