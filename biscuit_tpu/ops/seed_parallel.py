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


_PACK_KEYS = ("best_end", "best_x0", "best_x1", "best_s", "f3_end", "f3_x0",
              "f3_x1", "f3_s", "f3_done", "ret3")


def _unpack(packed: np.ndarray):
    return {k: packed[i] for i, k in enumerate(_PACK_KEYS)}


def collect_intv_parallel(fm: FMPair, reads, lens, parents, opt) -> Tuple[List[List[Tuple]], np.ndarray]:
    """Device-parallel mem_collect_intv. Returns per-lane seed lists
    (start, end, x0, x1, s), sorted like the reference, plus an overflow mask
    (always False; kept for interface compatibility)."""
    B, L = reads.shape
    q = jnp.asarray(reads, dtype=jnp.int32)
    lens_j = jnp.asarray(lens, dtype=jnp.int32)
    par_j = jnp.asarray(parents, dtype=jnp.int32)

    # pass 1 + 3: all (read, p) lanes
    starts = np.tile(np.arange(L, dtype=np.int32), B)
    read_of = np.repeat(np.arange(B, dtype=np.int32), L)
    out = forward_extend_all(fm, q, lens_j, par_j, jnp.asarray(starts),
                             jnp.asarray(read_of),
                             jnp.ones((B * L,), jnp.int32),
                             int(opt.min_seed_len), int(opt.max_mem_intv),
                             max_iters=L + 2)
    o = {k: v.reshape(B, L) for k, v in _unpack(np.asarray(out)).items()}

    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    seeds_all: List[List[Tuple]] = []
    p2_tasks = []  # (lane, mid, min_intv)
    for b in range(B):
        n = int(lens[b])
        e = o["best_end"][b, :n]
        # maximal matches: e(p) strictly above the running prefix max
        prior = np.concatenate([[-1], np.maximum.accumulate(e)[:-1]])
        is_max = (e > prior) & (e > np.arange(n))  # nonempty match
        mem = []
        for p in np.nonzero(is_max)[0]:
            end = int(e[p])
            if end - p >= opt.min_seed_len:
                mem.append((int(p), end, int(o["best_x0"][b, p]),
                            int(o["best_x1"][b, p]), int(o["best_s"][b, p])))
        seeds_all.append(mem)
        for (sb, se, _x0, _x1, size) in mem:
            if se - sb >= split_len and size <= opt.split_width:
                p2_tasks.append((b, (sb + se) >> 1, size + 1))

    # pass 2: lanes = (task, p) for p in [mid - P2W + 1, mid]
    if p2_tasks:
        P2W = min(L, 192)
        t_read = []
        t_start = []
        t_minintv = []
        for (b, mid, mi) in p2_tasks:
            lo = max(0, mid - P2W + 1)
            for p in range(lo, mid + 1):
                t_read.append(b)
                t_start.append(p)
                t_minintv.append(mi)
        # pad the lane count to a bucket so the kernel compiles once per
        # bucket, not once per batch (padding lanes start past the read end
        # and are born inactive)
        n2 = len(t_start)
        bucket = 256
        while bucket < n2:
            bucket <<= 1
        pad = bucket - n2
        t_read += [0] * pad
        t_start += [int(lens[0])] * pad
        t_minintv += [1] * pad
        out2 = forward_extend_all(fm, q, lens_j, par_j,
                                  jnp.asarray(np.array(t_start, np.int32)),
                                  jnp.asarray(np.array(t_read, np.int32)),
                                  jnp.asarray(np.array(t_minintv, np.int32)),
                                  0, 0, max_iters=L + 2)
        o2 = _unpack(np.asarray(out2))
        off = 0
        for (b, mid, mi) in p2_tasks:
            lo = max(0, mid - P2W + 1)
            width = mid + 1 - lo
            e2 = o2["best_end"][off:off + width]
            x0_2 = o2["best_x0"][off:off + width]
            x1_2 = o2["best_x1"][off:off + width]
            s_2 = o2["best_s"][off:off + width]
            off += width
            run_max = -1
            for j in range(width):
                p = lo + j
                end = int(e2[j])
                if end <= mid:      # must cover mid
                    continue
                if end <= run_max:  # contained in an earlier candidate
                    continue
                run_max = max(run_max, end)
                if end - p >= opt.min_seed_len:
                    seeds_all[b].append((p, end, int(x0_2[j]), int(x1_2[j]),
                                         int(s_2[j])))

    # pass 3: resolve the sequential restart chain from the per-start data
    if opt.max_mem_intv > 0:
        for b in range(B):
            n = int(lens[b])
            p = 0
            while p < n:
                if reads[b, p] >= 4:
                    p += 1
                    continue
                if o["f3_done"][b, p]:
                    if o["f3_s"][b, p] > 0:
                        seeds_all[b].append((int(p), int(o["f3_end"][b, p]),
                                             int(o["f3_x0"][b, p]),
                                             int(o["f3_x1"][b, p]),
                                             int(o["f3_s"][b, p])))
                    p = int(o["ret3"][b, p])
                else:
                    p = int(o["ret3"][b, p])

    for mem in seeds_all:
        mem.sort(key=lambda s: (s[0] << 32) | s[1])
    return seeds_all, np.zeros(B, bool)
