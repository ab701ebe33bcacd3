"""TPU-native SMEM seeding: per-(read, position) parallel forward extensions.

The reference computes SMEMs with a sequential bidirectional algorithm
(bwt_smem1a). That shape is hostile to SPMD hardware, so this module uses an
equivalent formulation that is embarrassingly parallel:

  * For every start position p, forward-extend q[p..] one base per step and
    record e(p) = the longest end with >= 1 occurrence, plus the bi-interval
    at that point. All (read, p) lanes are independent: the kernel is a
    fixed-bound while loop whose body is two batched occ4 gathers + VPU ops —
    no scatters, no variable-length state.
  * The SMEM set is exactly the maximal matches: p is an SMEM start iff
    e(p) > max_{p' < p} e(p') — a prefix-max filter (cheap postprocess).
    The bi-interval of a given substring is unique, so the recorded intervals
    equal the reference's.
  * Pass 3 (bwt_seed_strategy1) piggybacks on the same extension run: record
    the first end where (interval < max_mem_intv and length >= min_seed_len);
    the sequential restart chain is then resolved on the host from f3/e data.
  * Pass 2 (re-seeding inside a long SMEM at `mid` with min_intv = occ+1) uses
    the same kernel with a per-lane occurrence threshold and start positions
    spanning [mid - window, mid]; candidates covering mid + the prefix-max
    filter reproduce bwt_smem1a(mid, min_intv).

Parity with the host smem.collect_intv is exact (tests/test_seed_parallel.py).
"""
from functools import partial
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .seed_batch import FMPair, occ4_sel


def _forward_extend_core(fm: FMPair, q: jnp.ndarray, lens: jnp.ndarray,
                         parents: jnp.ndarray, starts: jnp.ndarray,
                         read_of: jnp.ndarray, min_intv: jnp.ndarray,
                         min_seed_len: int, max_mem_intv: int,
                         max_iters: int):
    """Traced body shared by forward_extend_all and seed_collect_device."""
    B, L = q.shape
    N = starts.shape[0]
    lens_l = lens[read_of]
    par_l = parents[read_of]
    fmc_id = 1 - par_l

    def get_q(i):
        ii = jnp.clip(i, 0, L - 1)
        v = q[read_of, ii]
        return jnp.where((i < 0) | (i >= lens_l), 4, v)

    q0 = get_q(starts)
    valid0 = q0 < 4
    c0 = jnp.clip(q0, 0, 3)
    L2f = fm.L2[par_l]
    L2c = fm.L2[fmc_id]
    lane = jnp.arange(N)
    x0 = L2f[lane, c0] + 1
    x1 = L2c[lane, 3 - c0] + 1
    s0 = L2f[lane, c0 + 1] - L2f[lane, c0]
    ok_init = valid0 & (s0 >= min_intv)

    state = dict(
        i=starts + 1,
        x0=jnp.where(valid0, x0, 0),
        x1=jnp.where(valid0, x1, 0),
        s=jnp.where(valid0, s0, 0),
        active=valid0 & (ok_init | (max_mem_intv > 0)),
        best_end=jnp.where(ok_init, starts + 1, starts),
        best_x0=jnp.where(ok_init, x0, 0),
        best_x1=jnp.where(ok_init, x1, 0),
        best_s=jnp.where(ok_init, s0, 0),
        f3_end=jnp.zeros((N,), jnp.int32),
        f3_x0=jnp.zeros((N,), jnp.int32),
        f3_x1=jnp.zeros((N,), jnp.int32),
        f3_s=jnp.zeros((N,), jnp.int32),
        f3_done=jnp.zeros((N,), jnp.bool_),
        ret3=jnp.where(valid0, lens_l, starts + 1),  # default: ran to read end
        it=jnp.int32(0),
    )

    track3 = max_mem_intv > 0

    def cond(st):
        return st["active"].any() & (st["it"] < max_iters)

    def step(st):
        i = st["i"]
        qi = get_q(i)
        stop_amb = st["active"] & (qi >= 4) & (i < lens_l)
        stop_end = st["active"] & (i >= lens_l)
        run = st["active"] & (qi < 4) & (i < lens_l)

        # forward extension on the complement index
        xq = jnp.where(run, st["x1"], 1)
        s_in = jnp.where(run, st["s"], 1)
        tk = occ4_sel(fm, fmc_id, xq - 1)
        tl = occ4_sel(fm, fmc_id, xq - 1 + s_in)
        sizes = tl - tk
        L2w = fm.L2[fmc_id]
        new_x1v = L2w[..., :4] + 1 + tk
        prim = fm.primary[fmc_id]
        crosses = ((xq <= prim) & (xq + s_in - 1 >= prim)).astype(jnp.int32)
        b3 = st["x0"] + crosses
        b2 = b3 + sizes[..., 3]
        b1 = b2 + sizes[..., 2]
        b0 = b1 + sizes[..., 1]
        x0v = jnp.stack([b0, b1, b2, b3], axis=-1)
        c = 3 - jnp.clip(qi, 0, 3)
        ok_x1 = new_x1v[lane, c]
        ok_x0 = x0v[lane, c]
        ok_s = sizes[lane, c]

        good = run & (ok_s >= min_intv)
        best_end = jnp.where(good, i + 1, st["best_end"])
        best_x0 = jnp.where(good, ok_x0, st["best_x0"])
        best_x1 = jnp.where(good, ok_x1, st["best_x1"])
        best_s = jnp.where(good, ok_s, st["best_s"])

        if track3:
            hit3 = run & (~st["f3_done"]) & (ok_s < max_mem_intv) & \
                (i - starts >= min_seed_len)
            f3_end = jnp.where(hit3, i + 1, st["f3_end"])
            f3_x0 = jnp.where(hit3, ok_x0, st["f3_x0"])
            f3_x1 = jnp.where(hit3, ok_x1, st["f3_x1"])
            f3_s = jnp.where(hit3, ok_s, st["f3_s"])
            f3_done = st["f3_done"] | hit3
            ret3 = jnp.where(hit3, i + 1, st["ret3"])
        else:
            f3_end, f3_x0, f3_x1, f3_s = st["f3_end"], st["f3_x0"], st["f3_x1"], st["f3_s"]
            f3_done = st["f3_done"]
            ret3 = st["ret3"]
        ret3 = jnp.where(stop_amb & ~f3_done, i + 1, ret3)

        # continue while the >=min_intv match can still grow, or (pass 3)
        # until the first hit is recorded
        cont = run & ((ok_s >= min_intv) | (track3 & ~f3_done))
        active = st["active"] & ~(stop_amb | stop_end) & cont
        return dict(
            i=jnp.where(run, i + 1, i),
            x0=jnp.where(run, ok_x0, st["x0"]),
            x1=jnp.where(run, ok_x1, st["x1"]),
            s=jnp.where(run, ok_s, st["s"]),
            active=active,
            best_end=best_end, best_x0=best_x0, best_x1=best_x1, best_s=best_s,
            f3_end=f3_end, f3_x0=f3_x0, f3_x1=f3_x1, f3_s=f3_s,
            f3_done=f3_done, ret3=ret3,
            it=st["it"] + 1,
        )

    out = jax.lax.while_loop(cond, step, state)
    # pack into one array: a single device->host transfer per kernel call
    # (transfer latency dominates on tunneled TPU setups)
    return jnp.stack([out["best_end"], out["best_x0"], out["best_x1"],
                      out["best_s"], out["f3_end"], out["f3_x0"],
                      out["f3_x1"], out["f3_s"],
                      out["f3_done"].astype(jnp.int32), out["ret3"]])


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv", "max_iters"))
def forward_extend_all(fm: FMPair, q: jnp.ndarray, lens: jnp.ndarray,
                       parents: jnp.ndarray, starts: jnp.ndarray,
                       read_of: jnp.ndarray, min_intv: jnp.ndarray,
                       min_seed_len: int, max_mem_intv: int,
                       max_iters: int = 512):
    """Forward-extend every lane (read_of[l], starts[l]) until the interval
    drops below min_intv[l] (and, when max_mem_intv > 0, until the pass-3
    first-hit is recorded).

    q [B, L] int32; lens/parents [B]; starts/read_of/min_intv [N] lanes.
    Returns per-lane arrays:
      best_end, best_x0, best_x1, best_s : longest >=min_intv match from p
      f3_end, f3_x0, f3_x1, f3_s, f3_done: pass-3 first hit (end=i+1)
      ret3: seed_strategy1 return value (restart position)
    """
    return _forward_extend_core(fm, q, lens, parents, starts, read_of,
                                min_intv, min_seed_len, max_mem_intv,
                                max_iters)


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv", "S1", "S3"))
def seed_collect_device(fm: FMPair, q: jnp.ndarray, lens: jnp.ndarray,
                        parents: jnp.ndarray,
                        min_seed_len: int, max_mem_intv: int,
                        S1: int = 48, S3: int = 16):
    """Pass 1 (+3) of mem_collect_intv entirely on device, with on-device
    compaction so the host transfer is O(B * S) instead of O(B * L).

    Runs the per-position forward extension over every (read, p) lane, then:
      * pass 1: prefix-max filter (an SMEM starts at p iff its end exceeds
        every earlier end) + min_seed_len filter, compacted to [B, S1, 5]
        rows (start, end, x0, x1, s) in ascending-start order;
      * pass 3 (bwt_seed_strategy1): resolves the sequential restart chain
        with one [B]-frontier while_loop, compacted to [B, S3, 5].
    Returns (seeds1 [B,S1,5], n1 [B], ovf1 [B], seeds3 [B,S3,5], n3 [B],
    ovf3 [B]) — all int32.  Pass 2 re-seeding runs as a separate
    forward_extend_all call (the task set is data-dependent).
    """
    B, L = q.shape
    starts = jnp.tile(jnp.arange(L, dtype=jnp.int32), B)
    read_of = jnp.repeat(jnp.arange(B, dtype=jnp.int32), L)
    packed = _forward_extend_core(
        fm, q, lens, parents, starts, read_of,
        jnp.ones((B * L,), jnp.int32), min_seed_len, max_mem_intv,
        max_iters=L + 2)
    o = packed.reshape(10, B, L)
    e = o[0]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    prior = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32),
         jax.lax.cummax(e, axis=1)[:, :-1]], axis=1)
    valid = pos < lens[:, None]
    is_max = (e > prior) & (e > pos) & valid
    keep1 = is_max & (e - pos >= min_seed_len)
    # stable compaction to the first S1 kept columns (ascending p)
    order = jnp.argsort(jnp.where(keep1, pos, jnp.int32(L)), axis=1)[:, :S1]
    take = jnp.take_along_axis
    m1 = take(keep1, order, axis=1)
    rows1 = jnp.stack([
        jnp.where(m1, order, 0),
        jnp.where(m1, take(e, order, axis=1), 0),
        jnp.where(m1, take(o[1], order, axis=1), 0),
        jnp.where(m1, take(o[2], order, axis=1), 0),
        jnp.where(m1, take(o[3], order, axis=1), 0),
    ], axis=-1)
    n1 = keep1.sum(axis=1).astype(jnp.int32)
    ovf1 = n1 > S1

    # ---- pass 3: frontier walk of the restart chain (host loop equivalent:
    # p advances by ret3 jumps, ambiguous bases advance by 1). Scatter-free:
    # S3 unrolled "advance to next hit" while_loops, one [B,5] select each —
    # TPU scatters are serialized, so per-slot stacking beats .at[] updates.
    if max_mem_intv > 0:
        f3_end, f3_x0, f3_x1, f3_s = o[4], o[5], o[6], o[7]
        f3_done = o[8] != 0
        ret3 = o[9]
        lane = jnp.arange(B)

        def at_hit(p):
            pc = jnp.clip(p, 0, L - 1)
            return ((p < lens) & (q[lane, pc] < 4) & f3_done[lane, pc]
                    & (f3_s[lane, pc] > 0))

        def advance_to_hit(p):
            def cond(p):
                return ((p < lens) & ~at_hit(p)).any()

            def body(p):
                pc = jnp.clip(p, 0, L - 1)
                amb = q[lane, pc] >= 4
                stay = at_hit(p) | (p >= lens)
                nxt = jnp.where(amb, p + 1, ret3[lane, pc])
                return jnp.where(stay, p, nxt)
            return jax.lax.while_loop(cond, body, p)

        p = jnp.zeros(B, jnp.int32)
        slot_rows = []
        founds = []
        for _slot in range(S3):
            p = advance_to_hit(p)
            pc = jnp.clip(p, 0, L - 1)
            found = p < lens
            row = jnp.stack([p, f3_end[lane, pc], f3_x0[lane, pc],
                             f3_x1[lane, pc], f3_s[lane, pc]], axis=-1)
            slot_rows.append(jnp.where(found[:, None], row, 0))
            founds.append(found)
            p = jnp.where(found, ret3[lane, pc], p)
        seeds3 = jnp.stack(slot_rows, axis=1)           # [B, S3, 5]
        n3 = jnp.stack(founds, axis=1).sum(axis=1).astype(jnp.int32)
        p = advance_to_hit(p)
        ovf3 = p < lens                                 # hits beyond S3
    else:
        seeds3 = jnp.zeros((B, S3, 5), jnp.int32)
        n3 = jnp.zeros(B, jnp.int32)
        ovf3 = jnp.zeros(B, bool)

    return rows1, n1, ovf1, seeds3, n3, ovf3


_PACK_KEYS = ("best_end", "best_x0", "best_x1", "best_s", "f3_end", "f3_x0",
              "f3_x1", "f3_s", "f3_done", "ret3")


def _unpack(packed: np.ndarray):
    return {k: packed[i] for i, k in enumerate(_PACK_KEYS)}


def collect_intv_flat(fm: FMPair, reads, lens, parents, opt,
                      S1: int = 48, S3: int = 16):
    """Device-parallel mem_collect_intv with no per-read host loops.

    Pass 1+3 run in one device kernel with on-device compaction
    (seed_collect_device); pass 2 is a second kernel whose lane set and
    postprocess are vectorized numpy. Returns flat arrays sorted by
    (lane, start<<32|end, pass-insertion-order) — the host collect_intv's
    stable ks_introsort-key order:
      lane_of [M] int32, rows [M, 5] int32 (start, end, x0, x1, s),
      overflow [B] bool (lanes needing the host fallback; rare cap spill).
    """
    B, L = reads.shape
    q = jnp.asarray(reads, dtype=jnp.int32)
    lens_j = jnp.asarray(lens, dtype=jnp.int32)
    par_j = jnp.asarray(parents, dtype=jnp.int32)

    s1, n1, ovf1, s3, n3, ovf3 = seed_collect_device(
        fm, q, lens_j, par_j, int(opt.min_seed_len), int(opt.max_mem_intv),
        S1=S1, S3=S3)
    s1 = np.asarray(s1); n1 = np.asarray(n1)
    s3 = np.asarray(s3); n3 = np.asarray(n3)
    overflow = np.asarray(ovf1) | np.asarray(ovf3)

    m1 = np.arange(S1)[None, :] < np.minimum(n1, S1)[:, None]
    lane1, slot1 = np.nonzero(m1)
    rows1 = s1[lane1, slot1]

    # ---- pass 2 lanes: fixed P2W-wide window per task (negative starts are
    # born-dead in the kernel and can never pass the end>mid filter)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    t_mask = m1 & ((s1[:, :, 1] - s1[:, :, 0]) >= split_len) \
        & (s1[:, :, 4] <= opt.split_width)
    tb, ts = np.nonzero(t_mask)
    rows2 = np.zeros((0, 5), np.int32)
    lane2 = np.zeros(0, np.int32)
    if len(tb):
        P2W = min(L, 192)
        mids = (s1[tb, ts, 0] + s1[tb, ts, 1]) >> 1
        mins = (s1[tb, ts, 4] + 1).astype(np.int32)
        T = len(tb)
        t_start = (mids[:, None] - P2W + 1
                   + np.arange(P2W, dtype=np.int32)[None, :]).ravel()
        t_read = np.repeat(tb.astype(np.int32), P2W)
        t_minintv = np.repeat(mins, P2W)
        n2 = T * P2W
        bucket = 256
        while bucket < n2:
            bucket <<= 1
        t_start = np.concatenate([t_start, np.full(bucket - n2, L, np.int32)])
        t_read = np.concatenate([t_read, np.zeros(bucket - n2, np.int32)])
        t_minintv = np.concatenate([t_minintv, np.ones(bucket - n2, np.int32)])
        out2 = np.asarray(forward_extend_all(
            fm, q, lens_j, par_j, jnp.asarray(t_start), jnp.asarray(t_read),
            jnp.asarray(t_minintv), 0, 0, max_iters=L + 2))
        e2 = out2[0][:n2].reshape(T, P2W)
        # candidates cover mid and beat the running (masked) prefix max;
        # run_max updates regardless of the min_seed_len emission filter
        me = np.where(e2 > mids[:, None], e2, -1)
        prior = np.concatenate(
            [np.full((T, 1), -1, me.dtype),
             np.maximum.accumulate(me, axis=1)[:, :-1]], axis=1)
        p_arr = mids[:, None] - P2W + 1 + np.arange(P2W, dtype=np.int32)[None, :]
        keep2 = (e2 > mids[:, None]) & (e2 > prior) \
            & (e2 - p_arr >= opt.min_seed_len)
        ti, tj = np.nonzero(keep2)
        flat = ti * P2W + tj
        rows2 = np.stack([p_arr[ti, tj], e2[ti, tj], out2[1][flat],
                          out2[2][flat], out2[3][flat]], axis=-1).astype(np.int32)
        lane2 = tb[ti].astype(np.int32)

    m3 = np.arange(S3)[None, :] < np.minimum(n3, S3)[:, None]
    lane3, slot3 = np.nonzero(m3)
    rows3 = s3[lane3, slot3]

    lane_of = np.concatenate([lane1.astype(np.int32), lane2,
                              lane3.astype(np.int32)])
    rows = np.concatenate([rows1, rows2, rows3]).astype(np.int32, copy=False)
    # stable (lane, start, end) order == host's stable sort on start<<32|end
    order = np.lexsort((rows[:, 1], rows[:, 0], lane_of))
    return lane_of[order], rows[order], overflow


def collect_intv_parallel(fm: FMPair, reads, lens, parents, opt) -> Tuple[List[List[Tuple]], np.ndarray]:
    """Device-parallel mem_collect_intv. Returns per-lane seed lists
    (start, end, x0, x1, s), sorted like the reference, plus an overflow mask
    (lanes that spilled the device seed caps and need the host fallback)."""
    B, L = reads.shape
    lane_of, rows, overflow = collect_intv_flat(fm, reads, lens, parents, opt)
    seeds_all: List[List[Tuple]] = [[] for _ in range(B)]
    for b, row in zip(lane_of, rows):
        seeds_all[b].append(tuple(int(v) for v in row))
    return seeds_all, overflow
