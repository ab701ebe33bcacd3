"""Batched SMEM seeding on device (JAX, TPU-first).

Runs the reference's bwt_smem1a / bwt_seed_strategy1 / mem_collect_intv
semantics (/root/reference/lib/aln/bwt.c:306-396, memchain.c:50-106) as a
lockstep state machine over a batch of reads: every `while_loop` iteration
advances each active lane by one step (one bidirectional FM extension = two
batched occ4 gathers). Lane-divergent control flow is handled with masks;
variable-length seed lists live in fixed-capacity per-lane buffers.

Output seed sets are bit-identical to the host smem.collect_intv (ground
truth; tested in tests/test_seed_batch.py). Lanes that overflow the seed
capacity are flagged so the caller can re-run them on the host path.
"""
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..index.fmindex import BisIndex
from .fm import FMArrays

BIG = jnp.int32(0x7FFFFFFF)

PH_SCAN, PH_FWD, PH_BACK, PH_DONE = 0, 1, 2, 3


def _popcount32_np(x: np.ndarray) -> np.ndarray:
    """SWAR popcount of a uint32 numpy array."""
    x = x.astype(np.uint32)
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> np.uint32(24)).astype(np.int64)


def _fused_tab(words: np.ndarray, occ_cp: np.ndarray, seq_len: int) -> np.ndarray:
    """Fused occ+BWT table: one 32-byte row per 64 BWT bases —
    [c0, c1, c2, c3, w0, w1, w2, w3] as 8 uint32 — so every occ4 query is a
    SINGLE row gather (XLA TPU gathers cost per row, not per byte; the
    separate words/checkpoint layout spent ~3 gather-rows per query).
    Same idea as the C++ runtime's ilv2 blocks (align_host.cpp)."""
    words = np.asarray(words, np.uint32)
    cp = np.asarray(occ_cp).astype(np.int64)  # [n128+1, 4]
    n64 = (int(seq_len) + 63) >> 6
    wpad = np.zeros(n64 * 4, np.uint32)
    wpad[:len(words)] = words
    w4 = wpad.reshape(n64, 4)
    M = np.uint32(0x55555555)
    inv = ~wpad
    pc = np.stack([
        _popcount32_np(((inv >> np.uint32(1)) & inv) & M),
        _popcount32_np(((inv >> np.uint32(1)) & wpad) & M),
        _popcount32_np(((wpad >> np.uint32(1)) & inv) & M),
        _popcount32_np(((wpad >> np.uint32(1)) & wpad) & M),
    ], axis=1)                                   # [n64*4, 4] per-word counts
    blk_counts = pc.reshape(n64, 4, 4).sum(axis=1)  # [n64, 4] per-64-block
    b = np.arange(n64)
    base = cp[b >> 1]                            # 128-base checkpoints
    odd_add = np.where((b & 1)[:, None] == 1,
                       blk_counts[(b >> 1) << 1], 0)
    tab = np.empty((n64, 8), np.uint32)
    tab[:, :4] = (base + odd_add).astype(np.uint32)
    tab[:, 4:] = w4
    return tab


@dataclass(frozen=True)
class FMPair:
    """Parent+daughter FM arrays fused for per-lane index selection.
    Index id 0 = daughter, 1 = parent (reference bwt_t bwt[2], bwa.h:42-50).
    The occ+BWT state lives in `tab` (see _fused_tab): one 32-byte row per
    64 bases, so occ4 / bwt_char / invPsi are single-row gathers."""
    tab: jnp.ndarray       # [2, n64, 8] uint32 fused occ+BWT rows
    L2: jnp.ndarray        # [2, 5] int32
    primary: jnp.ndarray   # [2] int32
    seq_len: jnp.ndarray   # int32 (same for both strands)
    sa_samples: jnp.ndarray  # [2, n_sa] int32

    @classmethod
    def from_index(cls, idx: BisIndex) -> "FMPair":
        if idx.dau.sa_samples.dtype.itemsize == 8:
            raise NotImplementedError(
                "device seeding uses int32 ranks; wide (>=2^31) indexes run "
                "on the native engine (BISCUIT_TPU_ENGINE=native)")
        n = int(idx.dau.seq_len)
        tab = np.stack([_fused_tab(idx.dau.words, idx.dau.occ_cp, n),
                        _fused_tab(idx.par.words, idx.par.occ_cp, n)])
        dau = FMArrays.from_strand(idx.dau)
        par = FMArrays.from_strand(idx.par)
        return cls(
            tab=jnp.asarray(tab),
            L2=jnp.stack([dau.L2, par.L2]),
            primary=jnp.stack([dau.primary, par.primary]),
            seq_len=dau.seq_len,
            sa_samples=jnp.stack([dau.sa_samples, par.sa_samples]),
        )


jax.tree_util.register_pytree_node(
    FMPair,
    lambda f: ((f.tab, f.L2, f.primary, f.seq_len, f.sa_samples), None),
    lambda _, ch: FMPair(*ch),
)


def _occ4_from_row(row: jnp.ndarray, kk: jnp.ndarray) -> jnp.ndarray:
    """Class counts up to position kk (exclusive of positions > kk) given the
    fused 64-base row of kk's block. row [..., 8] uint32, kk [...] int32."""
    acc = row[..., :4].astype(jnp.int32)
    w4 = row[..., 4:]
    w_idx = ((kk >> 4) & 3)[..., None]
    t_low = (~kk & 15).astype(jnp.uint32)[..., None]
    jj = jnp.arange(4, dtype=jnp.int32)
    sel_part = jj == w_idx
    active = jj <= w_idx
    wm = jnp.where(sel_part, (w4 >> (t_low << 1)) << (t_low << 1), w4)
    inv = ~wm
    lo1 = wm & jnp.uint32(0x55555555)
    c0 = jax.lax.population_count(((inv >> 1) & inv) & jnp.uint32(0x55555555)).astype(jnp.int32)
    c1 = jax.lax.population_count((inv >> 1) & lo1).astype(jnp.int32)
    c2 = jax.lax.population_count((wm >> 1) & (inv & jnp.uint32(0x55555555))).astype(jnp.int32)
    c3 = jax.lax.population_count((wm >> 1) & lo1).astype(jnp.int32)
    corr = jnp.where(sel_part, t_low.astype(jnp.int32), 0)
    counts = jnp.stack([
        jnp.sum(jnp.where(active, c0 - corr, 0), axis=-1),
        jnp.sum(jnp.where(active, c1, 0), axis=-1),
        jnp.sum(jnp.where(active, c2, 0), axis=-1),
        jnp.sum(jnp.where(active, c3, 0), axis=-1),
    ], axis=-1)
    return acc + counts


def occ4_sel(fm: FMPair, which: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """occ4 with a per-lane strand-index selector `which` in {0,1}.
    One fused-table row gather per query."""
    k = k.astype(jnp.int32)
    is_neg = k < 0
    is_full = k == fm.seq_len
    ksafe = jnp.clip(k, 0, fm.seq_len - 1)
    prim = fm.primary[which]
    kk = ksafe - (ksafe >= prim).astype(jnp.int32)
    row = fm.tab[which, kk >> 6]
    res = _occ4_from_row(row, kk)
    totals = (fm.L2[:, 1:5] - fm.L2[:, 0:4])[which]
    res = jnp.where(is_full[..., None], totals, res)
    res = jnp.where(is_neg[..., None], 0, res)
    return res


def extend_sel(fm: FMPair, which: jnp.ndarray, x_q: jnp.ndarray,
               x_o: jnp.ndarray, s: jnp.ndarray, is_back: jnp.ndarray):
    """Batched bwt_extend against a per-lane-selected strand index.
    x_q: the rank on the QUERIED index (x[!is_back]); x_o: the other rank.
    Returns (new_xq [B,4], new_xo [B,4], sizes [B,4]) where new_xq is the
    queried-axis update (L2+1+tk) and new_xo the cumulative other axis."""
    tk = occ4_sel(fm, which, x_q - 1)
    tl = occ4_sel(fm, which, x_q - 1 + s)
    sizes = tl - tk
    L2w = fm.L2[which]
    new_xq = L2w[..., :4] + 1 + tk
    prim = fm.primary[which]
    crosses = ((x_q <= prim) & (x_q + s - 1 >= prim)).astype(jnp.int32)
    b3 = x_o + crosses
    b2 = b3 + sizes[..., 3]
    b1 = b2 + sizes[..., 2]
    b0 = b1 + sizes[..., 1]
    new_xo = jnp.stack([b0, b1, b2, b3], axis=-1)
    del is_back  # axis selection is done by the caller
    return new_xq, new_xo, sizes


@partial(jax.jit, static_argnames=("C", "S", "max_iters"))
def smem_batch(fm: FMPair, q: jnp.ndarray, lens: jnp.ndarray,
               parent: jnp.ndarray, tasks: jnp.ndarray, n_tasks: jnp.ndarray,
               min_seed_len: jnp.ndarray,
               C: int = 160, S: int = 96, max_iters: int = 100000):
    """Run smem1a restarts for a batch of reads.

    q       [B, L] int32 (nt4 codes, converted read; pad with 4)
    lens    [B]    int32
    parent  [B]    int32 — 1: parent (bwt=par, fwd-ext on dau), 0: daughter
    tasks   [B, T, 3] int32 — (x, min_intv, cont); cont=1 means scan-style
            auto-continue at the returned end (pass 1); cont=0 single run
    n_tasks [B]
    min_seed_len [B] — seeds shorter than this are not stored (but still
            participate in the containment-dedup rule, as in the reference)

    Returns (seeds [B, S, 5] int32 (start, end, x0, x1, size), n_seeds [B],
             overflow [B] bool, iters int32).
    """
    B, L = q.shape
    T = tasks.shape[1]
    fm_id = parent            # backward extensions query bwt  = bwt[parent]
    fmc_id = 1 - parent       # forward  extensions query bwtc = bwt[1-parent]

    state = dict(
        phase=jnp.full((B,), PH_SCAN, jnp.int32),
        t_idx=jnp.zeros((B,), jnp.int32),
        tasks=tasks.astype(jnp.int32),
        x=jnp.zeros((B,), jnp.int32),
        min_intv=jnp.ones((B,), jnp.int32),
        i=jnp.zeros((B,), jnp.int32),
        ret=jnp.zeros((B,), jnp.int32),
        ik=jnp.zeros((B, 4), jnp.int32),          # x0, x1, s, end
        buf=jnp.zeros((B, 2, C, 4), jnp.int32),   # two slots: prev/curr
        prev_slot=jnp.zeros((B,), jnp.int32),
        n_prev=jnp.zeros((B,), jnp.int32),
        n_curr=jnp.zeros((B,), jnp.int32),
        j=jnp.zeros((B,), jnp.int32),
        call_emits=jnp.zeros((B,), jnp.int32),    # emits in current smem1a
        last_emit_start=jnp.zeros((B,), jnp.int32),
        seeds=jnp.zeros((B, S, 5), jnp.int32),
        n_seeds=jnp.zeros((B,), jnp.int32),
        overflow=jnp.zeros((B,), jnp.bool_),
        iters=jnp.int32(0),
    )

    lane = jnp.arange(B)

    def get_q(i):
        """q[lane, i] with out-of-range -> 4."""
        ii = jnp.clip(i, 0, L - 1)
        v = q[lane, ii]
        return jnp.where((i < 0) | (i >= lens), 4, v)

    def cond(st):
        return (st["phase"] != PH_DONE).any() & (st["iters"] < max_iters)

    def step(st):
        phase = st["phase"]
        scan = phase == PH_SCAN
        fwd = phase == PH_FWD
        back = phase == PH_BACK

        # ---------------- SCAN ----------------
        task = st["tasks"][lane, jnp.clip(st["t_idx"], 0, T - 1)]  # [B, 3]
        tasks_left = st["t_idx"] < n_tasks
        tx, tmi = task[:, 0], task[:, 1]
        q_at_tx = get_q(tx)
        task_done = scan & (~tasks_left)
        task_past_end = scan & tasks_left & (tx >= lens)
        task_amb = scan & tasks_left & (tx < lens) & (q_at_tx >= 4)
        task_init = scan & tasks_left & (tx < lens) & (q_at_tx < 4)

        new_phase = jnp.where(task_done, PH_DONE, phase)
        # advance past end: next task
        t_idx = jnp.where(task_past_end, st["t_idx"] + 1, st["t_idx"])
        # ambiguous base: x++ in-place (matches both scan-continue and the
        # single-task smem1a early return x+1 for q[x]>3: cont tasks keep
        # scanning; non-cont tasks with q[x]>3 return immediately -> emulate
        # by bumping x when cont else skipping task)
        cont = task[:, 2] == 1
        bump = task_amb & cont
        skip = task_amb & (~cont)
        tasks_upd = st["tasks"].at[lane, jnp.clip(st["t_idx"], 0, T - 1), 0].set(
            jnp.where(bump, tx + 1, tx))
        t_idx = jnp.where(skip, t_idx + 1, t_idx)

        # init: start forward phase
        c0 = jnp.clip(q_at_tx, 0, 3)
        L2f = fm.L2[fm_id]
        L2c = fm.L2[fmc_id]
        ik_x0 = L2f[lane, c0] + 1
        ik_x1 = L2c[lane, 3 - c0] + 1
        ik_s = L2f[lane, c0 + 1] - L2f[lane, c0]
        ik_new = jnp.stack([ik_x0, ik_x1, ik_s, tx + 1], axis=-1)
        ik = jnp.where(task_init[:, None], ik_new, st["ik"])
        x = jnp.where(task_init, tx, st["x"])
        min_intv = jnp.where(task_init, jnp.maximum(tmi, 1), st["min_intv"])
        i = jnp.where(task_init, tx + 1, st["i"])
        n_curr = jnp.where(task_init, 0, st["n_curr"])
        new_phase = jnp.where(task_init, PH_FWD, new_phase)

        # ---------------- extension (FWD or BACK lanes) ----------------
        qi = get_q(st["i"])
        prevj = st["buf"][lane, st["prev_slot"], jnp.clip(st["j"], 0, C - 1)]  # [B,4]
        back_c = jnp.where((st["i"] < 0) | (qi > 3), -1, qi)
        fwd_need = fwd & (st["i"] < lens) & (qi < 4)
        back_need = back & (back_c >= 0) & (st["j"] < st["n_prev"])
        need = fwd_need | back_need

        which = jnp.where(fwd, fmc_id, fm_id)
        x_q = jnp.where(fwd, st["ik"][:, 1], prevj[:, 0])
        x_o = jnp.where(fwd, st["ik"][:, 0], prevj[:, 1])
        s_in = jnp.where(fwd, st["ik"][:, 2], prevj[:, 2])
        # guard inactive lanes with safe ranks
        x_q = jnp.where(need, x_q, 1)
        s_in = jnp.where(need, s_in, 1)
        new_xq, new_xo, sizes = extend_sel(fm, which, x_q, x_o, s_in, back)
        # ok[c] for the relevant c
        fwd_c = 3 - jnp.clip(qi, 0, 3)
        c_sel = jnp.where(fwd, fwd_c, jnp.clip(back_c, 0, 3))
        ok_q = new_xq[lane, c_sel]   # queried-axis rank
        ok_o = new_xo[lane, c_sel]
        ok_s = sizes[lane, c_sel]
        # map back to (x0, x1): FWD queried axis = x1; BACK queried axis = x0
        ok_x0 = jnp.where(fwd, ok_o, ok_q)
        ok_x1 = jnp.where(fwd, ok_q, ok_o)

        # ---------------- FWD logic ----------------
        at_end = fwd & ((st["i"] >= lens) | (qi >= 4))
        size_changed = fwd_need & (ok_s != st["ik"][:, 2])
        push_ik = at_end | size_changed
        # push ik into curr
        curr_slot = 1 - st["prev_slot"]
        can_push = st["n_curr"] < C
        buf = st["buf"]
        buf = buf.at[lane, curr_slot, jnp.clip(st["n_curr"], 0, C - 1)].set(
            jnp.where((push_ik & can_push)[:, None], st["ik"], buf[lane, curr_slot, jnp.clip(st["n_curr"], 0, C - 1)]))
        n_curr = jnp.where(push_ik & can_push, n_curr + 1, n_curr)
        small = fwd_need & (ok_s < min_intv)
        fwd_finish = at_end | (size_changed & small)
        # continue forward
        adv = fwd_need & (~fwd_finish)
        ik = jnp.where(adv[:, None],
                       jnp.stack([ok_x0, ok_x1, ok_s, st["i"] + 1], axis=-1), ik)
        i = jnp.where(adv, st["i"] + 1, i)

        # finish forward: reverse curr into prev
        # prev[k] = curr[n_curr-1-k]; do with a full-[C] masked permute
        def reverse_into_prev(buf, n_c, lanes_mask, curr_slot, prev_slot):
            kidx = jnp.arange(C)
            src = jnp.clip(n_c[:, None] - 1 - kidx[None, :], 0, C - 1)  # [B, C]
            curr_vals = buf[lane[:, None], curr_slot[:, None], src]      # [B, C, 4]
            valid = kidx[None, :] < n_c[:, None]
            prev_vals = buf[lane[:, None], prev_slot[:, None], kidx[None, :]]
            merged = jnp.where((lanes_mask[:, None] & valid)[:, :, None],
                               curr_vals, prev_vals)
            return buf.at[lane[:, None], prev_slot[:, None], kidx[None, :]].set(merged)

        buf = reverse_into_prev(buf, n_curr, fwd_finish, curr_slot, st["prev_slot"])
        # ret = end of longest match = last pushed entry's end = curr[n_curr-1].end
        last_entry = buf[lane, st["prev_slot"], 0]  # after reverse, prev[0] = longest
        ret = jnp.where(fwd_finish, last_entry[:, 3], st["ret"])
        n_prev = jnp.where(fwd_finish, n_curr, st["n_prev"])
        n_curr = jnp.where(fwd_finish, 0, n_curr)
        i = jnp.where(fwd_finish, x - 1, i)
        j = jnp.where(fwd_finish, 0, st["j"])
        call_emits = jnp.where(fwd_finish, 0, st["call_emits"])
        last_emit_start = jnp.where(fwd_finish, BIG, st["last_emit_start"])
        new_phase = jnp.where(fwd_finish, PH_BACK, new_phase)

        # ---------------- BACK logic ----------------
        back_act = back & (st["j"] < st["n_prev"])
        keep = back_act & ((back_c < 0) | (ok_s < min_intv))
        emit = keep & (n_curr == 0) & \
            ((st["call_emits"] == 0) | (st["i"] + 1 < st["last_emit_start"]))
        # store the seed if long enough
        start = st["i"] + 1
        end = prevj[:, 3]
        store = emit & (end - start >= min_seed_len)
        can_store = st["n_seeds"] < S
        seed_row = jnp.stack([start, end, prevj[:, 0], prevj[:, 1], prevj[:, 2]], axis=-1)
        seeds = st["seeds"].at[lane, jnp.clip(st["n_seeds"], 0, S - 1)].set(
            jnp.where((store & can_store)[:, None], seed_row,
                      st["seeds"][lane, jnp.clip(st["n_seeds"], 0, S - 1)]))
        n_seeds = jnp.where(store & can_store, st["n_seeds"] + 1, st["n_seeds"])
        overflow = st["overflow"] | (store & ~can_store)
        call_emits = jnp.where(emit, call_emits + 1, call_emits)
        last_emit_start = jnp.where(emit, start, last_emit_start)

        # append to curr when extension keeps the interval alive
        curr_last = buf[lane, curr_slot, jnp.clip(n_curr - 1, 0, C - 1)]
        append = back_act & (~keep) & ((n_curr == 0) | (ok_s != curr_last[:, 2]))
        can_append = n_curr < C
        app_row = jnp.stack([ok_x0, ok_x1, ok_s, prevj[:, 3]], axis=-1)
        buf = buf.at[lane, curr_slot, jnp.clip(n_curr, 0, C - 1)].set(
            jnp.where((append & can_append)[:, None], app_row,
                      buf[lane, curr_slot, jnp.clip(n_curr, 0, C - 1)]))
        n_curr = jnp.where(append & can_append, n_curr + 1, n_curr)

        j = jnp.where(back_act, j + 1, j)
        row_done = back & (j >= st["n_prev"])
        back_done = row_done & (n_curr == 0)
        back_next = row_done & (n_curr != 0)
        # next backward row: swap slots
        prev_slot = jnp.where(back_next, curr_slot, st["prev_slot"])
        n_prev = jnp.where(back_next, n_curr, n_prev)
        n_curr = jnp.where(back_next, 0, n_curr)
        i = jnp.where(back_next, st["i"] - 1, i)
        j = jnp.where(back_next, 0, j)

        # smem1a finished: continue scan task or advance to next task
        cur_t = jnp.clip(st["t_idx"], 0, T - 1)
        cont_l = st["tasks"][lane, cur_t, 2] == 1
        tasks_upd = tasks_upd.at[lane, cur_t, 0].set(
            jnp.where(back_done & cont_l, ret, tasks_upd[lane, cur_t, 0]))
        t_idx = jnp.where(back_done & (~cont_l), t_idx + 1, t_idx)
        new_phase = jnp.where(back_done, PH_SCAN, new_phase)

        return dict(phase=new_phase, t_idx=t_idx, tasks=tasks_upd, x=x,
                    min_intv=min_intv, i=i, ret=ret, ik=ik, buf=buf,
                    prev_slot=prev_slot, n_prev=n_prev, n_curr=n_curr, j=j,
                    call_emits=call_emits, last_emit_start=last_emit_start,
                    seeds=seeds, n_seeds=n_seeds, overflow=overflow,
                    iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return final["seeds"], final["n_seeds"], final["overflow"], final["iters"]


@jax.jit
def sa_batch(fm: FMPair, which: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Batched SA lookup (bwt_sa walk) with per-lane strand selection.
    The fused invPsi needs ONE tab-row gather per step: the BWT char and its
    occ rank come from the same 64-base block row."""

    def inv_psi(which, kk):
        prim = fm.primary[which]
        j = kk - (kk >= prim).astype(jnp.int32)
        row = fm.tab[which, j >> 6]
        w = jnp.take_along_axis(row, (4 + ((j >> 4) & 3))[..., None],
                                axis=-1)[..., 0]
        c = ((w >> (((~j & 15) << 1).astype(jnp.uint32))) & 3).astype(jnp.int32)
        o4 = _occ4_from_row(row, j)
        occs = jnp.take_along_axis(o4, c[..., None], axis=-1)[..., 0]
        return jnp.where(kk == prim, 0, fm.L2[which, c] + occs)

    def body(state):
        kk, add, act = state
        k2 = inv_psi(which, kk)
        kk = jnp.where(act, k2, kk)
        add = add + act.astype(jnp.int32)
        act = (kk & 31) != 0
        return kk, add, act

    def cond(state):
        return state[2].any()

    add0 = jnp.zeros_like(k)
    act0 = (k & 31) != 0
    kf, add, _ = jax.lax.while_loop(cond, body, (k, add0, act0))
    n_sa = fm.sa_samples.shape[1]
    return add + fm.sa_samples.reshape(-1)[which * n_sa + (kf >> 5)]


def collect_intv_batch(fm: FMPair, reads, lens, parents, opt,
                       C: int = 160, S: int = 96):
    """Device-backed mem_collect_intv over a batch: pass 1 (SMEM scan) on
    device, pass-2 re-seeding tasks derived on host from pass-1 output, pass 2
    + pass 3 on device, then the reference's final sort. Returns
    (list of per-read seed tuples (start, end, x0, x1, s), overflow mask)."""
    import numpy as np
    B, L = reads.shape
    q = jnp.asarray(reads, dtype=jnp.int32)
    lens_j = jnp.asarray(lens, dtype=jnp.int32)
    par_j = jnp.asarray(parents, dtype=jnp.int32)
    msl = jnp.full((B,), opt.min_seed_len, jnp.int32)
    start_width = 1  # MEM_F_SELF_OVLP unsupported on the device path

    # pass 1: one auto-continue scan task per lane
    tasks1 = np.zeros((B, 1, 3), np.int32)
    tasks1[:, 0, 1] = start_width
    tasks1[:, 0, 2] = 1
    s1, n1, ov1, _ = smem_batch(fm, q, lens_j, par_j, jnp.asarray(tasks1),
                                jnp.ones((B,), jnp.int32), msl, C=C, S=S)
    s1 = np.asarray(s1)
    n1 = np.asarray(n1)
    ov = np.array(ov1)

    # pass 2 tasks (host logic; memchain.c:76-85)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    task_lists = [[] for _ in range(B)]
    for b in range(B):
        for k in range(n1[b]):
            start, end, _x0, _x1, size = s1[b, k]
            if end - start < split_len or size > opt.split_width:
                continue
            task_lists[b].append(((start + end) >> 1, size + 1, 0))
    T = max(1, max(len(t) for t in task_lists))
    tasks2 = np.zeros((B, T, 3), np.int32)
    n_tasks2 = np.zeros(B, np.int32)
    for b, tl in enumerate(task_lists):
        for ti, t in enumerate(tl):
            tasks2[b, ti] = t
        n_tasks2[b] = len(tl)
    if n_tasks2.any():
        s2, n2, ov2, _ = smem_batch(fm, q, lens_j, par_j, jnp.asarray(tasks2),
                                    jnp.asarray(n_tasks2), msl, C=C, S=S)
        s2 = np.asarray(s2)
        n2 = np.asarray(n2)
        ov |= np.asarray(ov2)
    else:
        s2 = np.zeros((B, 0, 5), np.int32)
        n2 = np.zeros(B, np.int32)

    # pass 3
    if opt.max_mem_intv > 0:
        s3, n3, ov3 = seed_strategy_batch(fm, q, lens_j, par_j,
                                          int(opt.min_seed_len),
                                          int(opt.max_mem_intv), S=48)
        s3 = np.asarray(s3)
        n3 = np.asarray(n3)
        ov |= np.asarray(ov3)
    else:
        s3 = np.zeros((B, 0, 5), np.int32)
        n3 = np.zeros(B, np.int32)

    out = []
    for b in range(B):
        mem = [tuple(int(v) for v in s1[b, k]) for k in range(n1[b])]
        mem += [tuple(int(v) for v in s2[b, k]) for k in range(n2[b])]
        mem += [tuple(int(v) for v in s3[b, k]) for k in range(n3[b])]
        mem.sort(key=lambda s: (s[0] << 32) | s[1])
        out.append(mem)
    return out, ov


@partial(jax.jit, static_argnames=("S", "max_iters"))
def seed_strategy_batch(fm: FMPair, q: jnp.ndarray, lens: jnp.ndarray,
                        parent: jnp.ndarray, min_seed_len: int,
                        max_intv: int, S: int = 32, max_iters: int = 100000):
    """Pass-3 LAST-like forward-only seeding (bwt_seed_strategy1) for a batch.
    Returns (seeds [B, S, 5], n_seeds [B], overflow [B])."""
    B, L = q.shape
    fm_id = parent
    fmc_id = 1 - parent
    lane = jnp.arange(B)

    state = dict(
        x=jnp.zeros((B,), jnp.int32),
        i=jnp.zeros((B,), jnp.int32),
        ik=jnp.zeros((B, 3), jnp.int32),
        in_run=jnp.zeros((B,), jnp.bool_),
        seeds=jnp.zeros((B, S, 5), jnp.int32),
        n_seeds=jnp.zeros((B,), jnp.int32),
        overflow=jnp.zeros((B,), jnp.bool_),
        iters=jnp.int32(0),
    )

    def get_q(i):
        ii = jnp.clip(i, 0, L - 1)
        v = q[lane, ii]
        return jnp.where((i < 0) | (i >= lens), 4, v)

    def cond(st):
        return ((st["x"] < lens) | st["in_run"]).any() & (st["iters"] < max_iters)

    def step(st):
        x, i, ik, in_run = st["x"], st["i"], st["ik"], st["in_run"]
        active_scan = (~in_run) & (x < lens)
        qx = get_q(x)
        start_run = active_scan & (qx < 4)
        skip = active_scan & (qx >= 4)
        x = jnp.where(skip, x + 1, x)

        c0 = jnp.clip(qx, 0, 3)
        L2f = fm.L2[fm_id]
        L2c = fm.L2[fmc_id]
        ik_new = jnp.stack([L2f[lane, c0] + 1, L2c[lane, 3 - c0] + 1,
                            L2f[lane, c0 + 1] - L2f[lane, c0]], axis=-1)
        ik = jnp.where(start_run[:, None], ik_new, ik)
        i = jnp.where(start_run, x + 1, i)
        in_run = in_run | start_run

        qi = get_q(i)
        run_end_len = in_run & (i >= lens)        # reached read end: x = len
        run_amb = in_run & (i < lens) & (qi >= 4)  # ambiguous: return i+1
        need = in_run & (i < lens) & (qi < 4)
        x_q = jnp.where(need, ik[:, 1], 1)
        s_in = jnp.where(need, ik[:, 2], 1)
        new_xq, new_xo, sizes = extend_sel(fm, fmc_id, x_q, ik[:, 0], s_in,
                                           jnp.zeros((B,), jnp.bool_))
        c = 3 - jnp.clip(qi, 0, 3)
        ok_x1 = new_xq[lane, c]
        ok_x0 = new_xo[lane, c]
        ok_s = sizes[lane, c]
        hit = need & (ok_s < max_intv) & (i - x >= min_seed_len)
        # the reference only pushes hits with a nonzero interval
        # (mem_collect_intv: `if (m.x[2] > 0) kv_push`), but the scan still
        # restarts at i+1 either way
        store_hit = hit & (ok_s > 0)
        can_store = st["n_seeds"] < S
        seed_row = jnp.stack([x, i + 1, ok_x0, ok_x1, ok_s], axis=-1)
        seeds = st["seeds"].at[lane, jnp.clip(st["n_seeds"], 0, S - 1)].set(
            jnp.where((store_hit & can_store)[:, None], seed_row,
                      st["seeds"][lane, jnp.clip(st["n_seeds"], 0, S - 1)]))
        n_seeds = jnp.where(store_hit & can_store, st["n_seeds"] + 1, st["n_seeds"])
        overflow = st["overflow"] | (store_hit & ~can_store)
        ik = jnp.where((need & ~hit)[:, None],
                       jnp.stack([ok_x0, ok_x1, ok_s], axis=-1), ik)
        i = jnp.where(need & ~hit, i + 1, i)
        # run terminations
        x = jnp.where(run_end_len, lens, x)
        x = jnp.where(run_amb | hit, i + 1, x)
        in_run = in_run & ~(run_end_len | run_amb | hit)
        return dict(x=x, i=i, ik=ik, in_run=in_run, seeds=seeds,
                    n_seeds=n_seeds, overflow=overflow, iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return final["seeds"], final["n_seeds"], final["overflow"]
