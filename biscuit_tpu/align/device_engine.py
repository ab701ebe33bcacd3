"""Device (TPU) alignment engine: batched seeding + SA lookup + extension.

Replaces the three hot stages of worker1 with batched JAX kernels while
reusing the exact host logic (chaining, region bookkeeping) via the
extension-request generator protocol (region.chain2region_gen). Output is
identical to the host engine (tested in tests/test_device_engine.py).

Batch flow per call (round-4 production configuration):
  1. host: read clipping + in-silico conversion; build (read, parent) lanes
  2. device: 3-pass SMEM seed collection — the log machine by default
     (ops/seed_batch._collect_sm_log; BISCUIT_TPU_SEEDER selects
     log/pool/merged/fused)
  3. device: batched SA walks for seed occurrence positions
  4. device: chaining as the lockstep B-tree replay
     (ops/chain_batch.chain_scan_batch via chain.mem_chain_batch;
     cap-overflow lanes rerun the host walk), then host chain filtering
  5. device: banded extension (Pallas SW kernel), scheduled in lockstep
     rounds across lanes; batched mate rescue (ops/sw_local) in PE
  6. host: region merge + downstream (mark primary, pairing, SAM)
"""
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MemOpt, MEM_F_PE, MEM_F_NO_RESCUE
from ..index.fmindex import BisIndex
from ..ops import sw
from ..ops.seed_batch import (FMPair, collect_intv_batch,
                              collect_intv_flat_sm, sa_batch_np)
from ..ops.sw_batch import sw_extend_batch
from ..ops.pallas_sw import sw_extend_batch_pallas
from ..ops.pallas_global import (decode_cigars, global_traceback,
                                 sw_global_batch_pallas)
from . import sam as sammod
from . import trace
from .chain import (mem_chain, mem_chain_batch, mem_chain_flt,
                    mem_flt_chained_seeds)
from .pair import PeStat, pestat
from .region import (AlnRegs, chain2region_gen, drive_gen, mark_primary,
                     matesw, matesw_batch, merge_regions)
from .smem import collect_intv
from .pipeline import AlignerState, bsconvert, worker2_pe, worker2_se
from .io_helpers import read_clipping

import os
import sys
import time

PROFILE = os.environ.get("BISCUIT_TPU_PROFILE") == "1"


def _plog(msg):
    if PROFILE:
        print(f"[device-engine {time.time():.1f}] {msg}", file=sys.stderr, flush=True)


# stage wall-clock accumulator (BISCUIT_TPU_PROFILE=1): device-dispatching
# stages (seed, sa, extend, cigar) vs host stages (chain, worker2) — the
# "device share of align time" figure (VERDICT r2 item 2)
_STAGE_T: Dict[str, float] = {}
# rescue counts as device since r4: the per-candidate ksw_align2 runs as
# one batched device dispatch (ops/sw_local); only the tiny sequential
# insert replay stays on host
_DEVICE_STAGES = ("seed", "sa", "extend", "cigar", "rescue", "chain_scan")


class _stage:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        _STAGE_T[self.name] = (_STAGE_T.get(self.name, 0.0)
                               + time.perf_counter() - self.t0)


def stage_report() -> Dict[str, float]:
    """Per-stage seconds + the device share; printed by the CLI at end of
    run under BISCUIT_TPU_PROFILE=1."""
    total = sum(_STAGE_T.values())
    dev = sum(_STAGE_T.get(k, 0.0) for k in _DEVICE_STAGES)
    rep = dict(_STAGE_T)
    rep["total_s"] = total
    rep["device_share"] = dev / total if total else 0.0
    return rep


SA_PREFETCH_CAP = 64


def _pow2(n: int, lo: int = 128) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


class DeviceAligner:
    def __init__(self, st: AlignerState):
        self.st = st
        self.fmpair = FMPair.from_index(st.idx)
        # Mosaic SW kernel on TPU backends; XLA elsewhere (tests run on CPU).
        # BISCUIT_TPU_PALLAS=0/1 overrides.
        env = os.environ.get("BISCUIT_TPU_PALLAS")
        if env is not None:
            self.use_pallas = env not in ("0", "")
        else:
            self.use_pallas = jax.default_backend() == "tpu"

    # ------------------------------------------------------------------
    def sw_local_batch_fn(self, opt: MemOpt):
        """(reqs, xsubo) -> [KswResult]: the batched exact-ksw_align2
        kernel for mate rescue (ops/sw_local). reqs carry matsel as
        parent: mats[0]=ctmat, mats[1]=gamat (region._matesw_prepare)."""
        from ..ops.sw_local import sw_align_batch

        mats_np = np.stack([np.asarray(opt.ctmat, np.int64),
                            np.asarray(opt.gamat, np.int64)])

        def fn(reqs, xsubo):
            return sw_align_batch(reqs, opt.o_del, opt.e_del, opt.o_ins,
                                  opt.e_ins, mats_np, xsubo=xsubo)
        return fn

    # ------------------------------------------------------------------
    def _collect_seeds(self, opt: MemOpt, lanes: List[Tuple]):
        """lanes: list of (seq, parent). Returns per-lane seed lists and SA
        position lookup tables."""
        st = self.st
        B = len(lanes)
        Bb = _pow2(B)  # lane-count bucket: bounded set of compiled shapes
        L = max(s.l_seq for s, _p in lanes)
        L = max((L + 31) // 32 * 32, 32)  # shape bucket
        q = np.full((Bb, L), 4, dtype=np.int32)
        lens = np.zeros(Bb, np.int32)
        parents = np.zeros(Bb, np.int32)
        for i, (s, p) in enumerate(lanes):
            conv = bsconvert(s, p)
            q[i, :s.l_seq] = conv
            lens[i] = s.l_seq
            parents[i] = p
        _plog(f"seeding start B={B} bucket={Bb} L={L}")
        seeds, overflow = collect_intv_batch(self.fmpair, q, lens, parents, opt)
        seeds = seeds[:B]
        overflow = overflow[:B]
        _plog(f"seeding done ({sum(len(s) for s in seeds)} seeds)")
        # host fallback for overflowing lanes (defensive; the parallel seeder
        # has no fixed seed capacity, so this should not trigger)
        for i in np.nonzero(overflow)[0]:
            s, p = lanes[i]
            fm, fmc = st.fm_pair(p)
            seeds[i] = collect_intv(opt, fm, fmc, bsconvert(s, p))

        # batched SA for up to SA_PREFETCH_CAP occurrences per seed
        jobs_which = []
        jobs_rank = []
        index: List[List[Tuple[int, int]]] = []  # per lane: (offset, kmax)
        off = 0
        for i, lane_seeds in enumerate(seeds):
            lane_idx = []
            for (_sb, _se, x0, _x1, size) in lane_seeds:
                kmax = min(size, SA_PREFETCH_CAP)
                lane_idx.append((off, kmax))
                for k in range(kmax):
                    jobs_which.append(parents[i])
                    jobs_rank.append(x0 + k)
                off += kmax
            index.append(lane_idx)
        if jobs_rank:
            nj = len(jobs_rank)
            njb = _pow2(nj)
            rdt = np.int64 if self.fmpair.wide else np.int32
            jw = np.zeros(njb, np.int32)
            jr = np.ones(njb, rdt)  # rank 1 pads: cheap short walks
            jw[:nj] = jobs_which
            jr[:nj] = jobs_rank
            _plog(f"sa_batch start n={nj} bucket={njb}")
            pos = sa_batch_np(self.fmpair, jw, jr)[:nj]
            _plog("sa_batch done")
        else:
            pos = np.zeros(0, np.int32)

        lookups = []
        for i, lane_idx in enumerate(index):
            p = int(parents[i])
            fm = self.st.fm[p]

            def mk(lane_idx=lane_idx, fm=fm):
                def sa_lookup(seed_i, k, x0):
                    o, kmax = lane_idx[seed_i]
                    if k < kmax:
                        return int(pos[o + k])
                    return fm.sa_s(x0 + k)  # beyond prefetch: scalar walk
                return sa_lookup
            lookups.append(mk())
        return seeds, lookups

    # ------------------------------------------------------------------
    def _extend_scheduled(self, opt: MemOpt, jobs: List):
        """jobs: generators yielding 6-tuples (qs, rs, aw, pen, h0, parent).
        Runs them all to completion with batched device SW rounds."""
        active: List[list] = []
        for gen in jobs:
            try:
                active.append([gen, next(gen)])
            except StopIteration:
                pass
        def bucket(n, step=64):
            return max((n + step - 1) // step * step, step)

        B0 = _pow2(len(active)) if active else 0
        rounds = 0
        while active:
            rounds += 1
            _plog(f"extend round {rounds}: {len(active)} lanes")
            B = B0  # keep one shape for all rounds of this batch
            # bucket padded shapes so the jitted kernel compiles a bounded
            # number of variants on TPU
            Lq = bucket(max(max(len(e[1][0]), 1) for e in active))
            Lt = bucket(max(max(len(e[1][1]), 1) for e in active))
            q = np.zeros((B, Lq), np.int32)
            t = np.zeros((B, Lt), np.int32)
            qlens = np.ones(B, np.int32)
            tlens = np.ones(B, np.int32)
            ws = np.ones(B, np.int32)
            ebs = np.zeros(B, np.int32)
            h0s = np.ones(B, np.int32)
            msel = np.zeros(B, np.int32)
            for i, (gen, (qs, rs, aw, pen, h0, parent)) in enumerate(active):
                q[i, :len(qs)] = qs
                qlens[i] = len(qs)
                t[i, :len(rs)] = rs
                tlens[i] = len(rs)
                ws[i] = aw
                ebs[i] = pen
                h0s[i] = h0
                msel[i] = parent
            # the Pallas Mosaic kernel is ~20x the XLA fori_loop version on
            # TPU (VMEM-resident DP state); XLA remains the CPU-test path
            sw_fn = sw_extend_batch_pallas if self.use_pallas else sw_extend_batch
            out = sw_fn(jnp.asarray(q), jnp.asarray(qlens),
                        jnp.asarray(t), jnp.asarray(tlens),
                        self._mats(opt), jnp.asarray(msel),
                        opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                        jnp.asarray(ws), jnp.asarray(ebs),
                        opt.zdrop, jnp.asarray(h0s))
            res = np.asarray(out)  # [6, B]: score,qle,tle,gtle,gscore,max_off
            nxt = []
            for i, entry in enumerate(active):
                gen = entry[0]
                r = tuple(int(x) for x in res[:, i])
                try:
                    entry[1] = gen.send(r)
                    nxt.append(entry)
                except StopIteration:
                    pass
            active = nxt

    def _mats(self, opt: MemOpt):
        if not hasattr(self, "_mats_cache"):
            self._mats_cache = jnp.asarray(
                np.stack([opt.gamat, opt.ctmat]).astype(np.int32))
        return self._mats_cache

    # ------------------------------------------------------------------
    def sw_global_batch(self, opt: MemOpt, requests):
        """Batched ksw_global2 + CIGAR on device (ops/pallas_global).
        requests: list of (key, query, rseq, w, parent).  Returns
        {key: (score, cigar)} bit-identical to sw.sw_global (the scalar
        oracle; lanes whose traceback overflows max_ops fall back to it).
        Bucketed by pow2-padded (Lq, Lt) to bound compiled shapes."""
        out = {}
        buckets: Dict[Tuple[int, int], list] = {}
        for req in requests:
            _k, q, r, w, _p = req
            kb = (_pow2(len(q), 32), _pow2(len(r), 32))
            buckets.setdefault(kb, []).append(req)
        for (Lq, Lt), all_reqs in buckets.items():
            # bound the on-device direction tensor (~Lt*Lq*B bytes packed;
            # an unchunked prefill round could pad one bucket to tens of
            # thousands of lanes and OOM HBM next to the resident FM
            # tables): sweep the bucket in pow2 lane chunks
            z_budget = int(os.environ.get("BISCUIT_TPU_GLOBAL_Z_MB",
                                          "512")) << 20
            per_lane = max(1, Lq * Lt)  # z bytes per lane (4-packed int32)
            max_lanes = 128
            while max_lanes * 2 * per_lane <= z_budget and max_lanes < 16384:
                max_lanes *= 2
            for c0 in range(0, len(all_reqs), max_lanes):
                out.update(self._sw_global_chunk(
                    opt, Lq, Lt, all_reqs[c0:c0 + max_lanes]))
        return out

    def _sw_global_chunk(self, opt: MemOpt, Lq: int, Lt: int, reqs):
        out = {}
        B = _pow2(len(reqs), 128)
        q = np.full((B, Lq), 4, np.int32)
        t = np.full((B, Lt), 4, np.int32)
        qlens = np.ones(B, np.int32)
        tlens = np.ones(B, np.int32)
        ws = np.ones(B, np.int32)
        msel = np.zeros(B, np.int32)
        for i, (_key, qq, rr, w, parent) in enumerate(reqs):
            q[i, :len(qq)] = qq
            qlens[i] = len(qq)
            t[i, :len(rr)] = rr
            tlens[i] = len(rr)
            ws[i] = w
            msel[i] = 1 if parent else 0
        score, z = sw_global_batch_pallas(
            jnp.asarray(q), jnp.asarray(qlens), jnp.asarray(t),
            jnp.asarray(tlens), self._mats(opt), jnp.asarray(msel),
            opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
            jnp.asarray(ws), interpret=not self.use_pallas)
        ops, n_ops, ov = global_traceback(
            z, jnp.asarray(qlens), jnp.asarray(tlens), jnp.asarray(ws))
        scores = np.asarray(score)
        ovh = np.asarray(ov)
        cigars = decode_cigars(np.asarray(ops), np.asarray(n_ops))
        for i, (key, qq, rr, w, parent) in enumerate(reqs):
            if ovh[i]:
                mat = (opt.ctmat if parent else opt.gamat)
                out[key] = sw.sw_global(
                    qq, rr, mat, opt.o_del, opt.e_del, opt.o_ins,
                    opt.e_ins, int(w))
            else:
                out[key] = (int(scores[i]), cigars[i])
        return out


    # ------------------------------------------------------------------
    def regs_for_batch(self, opt: MemOpt, seqs) -> List[AlnRegs]:
        """worker1 for a batch (SE or PE layout handled by caller policy):
        returns one AlnRegs per seq in `seqs`, each merged."""
        st = self.st
        idx = st.idx
        # lane policy (bwamem.c:311-375): order matters for emission parity
        lane_plan: List[Tuple[int, int]] = []  # (seq_idx, parent)
        pe = bool(opt.flag & MEM_F_PE)
        for i, s in enumerate(seqs):
            if not pe:
                if not (opt.parent & 1) or (opt.parent >> 1):
                    lane_plan.append((i, 0))
                if not (opt.parent & 1) or not (opt.parent >> 1):
                    lane_plan.append((i, 1))
            else:
                if i % 2 == 0:
                    lane_plan.append((i, 1))
                    if not opt.parent:
                        lane_plan.append((i, 0))
                else:
                    lane_plan.append((i, 0))
                    if not opt.parent:
                        lane_plan.append((i, 1))
        lanes = [(seqs[i], p) for i, p in lane_plan]
        with _stage("seed"):
            seeds, lookups = self._collect_seeds(opt, lanes)

        # chaining: the B-tree scan runs on device as a lockstep plane
        # machine (ops/chain_batch.py); capacity-overflow lanes (and the
        # byte-exact -v4 trace mode) rerun the host path
        all_regs: List[AlnRegs] = [AlnRegs() for _ in seqs]
        gens = []
        dev_chains = [None] * len(lane_plan)
        if (os.environ.get("BISCUIT_TPU_DEVICE_CHAIN", "1") != "0"
                and trace.verbose < 4):
            with _stage("chain_scan"):
                jobs = [(seqs[si].l_seq, parent, seeds[li], lookups[li])
                        for li, (si, parent) in enumerate(lane_plan)]
                dev_chains = mem_chain_batch(opt, idx, jobs)
        with _stage("chain"):
            for li, (si, parent) in enumerate(lane_plan):
                s = seqs[si]
                chns = dev_chains[li]
                if chns is None:
                    fm, fmc = st.fm_pair(parent)
                    chns = mem_chain(opt, fm, fmc, idx, s.l_seq,
                                     bsconvert(s, parent), parent,
                                     seeds_intv=seeds[li],
                                     sa_lookup=lookups[li])
                chns = mem_chain_flt(opt, chns)
                mem_flt_chained_seeds(opt, idx, s.l_seq, s.seq, chns, parent)
                gens.append((chain2region_gen(opt, idx, s.l_seq, s.seq,
                                              parent, chns, all_regs[si]),
                             parent))
        # The reference runs a read's two strand passes sequentially
        # (bwamem.c:327-333): the second pass's containment checks must see
        # the first pass's regions, and chain2region_gen captures reg0 =
        # len(regs) when its body first runs. So lanes of the same read are
        # chained into one sequential generator; different reads run in
        # lockstep batches.
        _plog("chaining done")
        by_read: Dict[int, List] = {}
        for gen_parent, (si, _p) in zip(gens, lane_plan):
            by_read.setdefault(si, []).append(gen_parent)
        with _stage("extend"):
            self._extend_scheduled(
                opt, [_chain_generators(lst) for lst in by_read.values()])
        _plog("extension done")

        with _stage("chain"):
            for si, s in enumerate(seqs):
                merge_regions(opt, idx, s.seq, s.l_seq, all_regs[si])
        return all_regs


class _PendingSW(Exception):
    """Raised by the recording global_fn: the request joined the batch."""


def prefill_setSAM(opt: MemOpt, idx, dev: DeviceAligner, items) -> None:
    """Fill reg.cigar/NM/ZC/ZR/md for every (seq, reg) on device before
    reg2sam runs (alnreg_setSAM is idempotent: prefilled regions are
    skipped by the host calls, any missed region falls back to the host
    scalar — over-approximation is safe, under is only slower).

    The band-doubling retry loop of mem_alnreg_setSAM
    (/root/reference/src/mem_alnreg_format.c:56-70) is driven at batch
    level: each round re-enters alnreg_setSAM with a cache-backed
    global_fn; an uncached (region, w) records its request and raises,
    and the round's requests run as ONE device sweep."""
    cache = {}
    pending = [(s, r) for s, r in items if r.n_cigar == 0]
    rounds = 0
    while pending:
        rounds += 1
        requests = []
        seen = set()

        def make_fn(reg):
            def fn(query, rseq, w):
                key = (id(reg), int(w))
                if key in cache:
                    return cache[key]
                if key not in seen:
                    seen.add(key)
                    requests.append((key, query, rseq, int(w), reg.parent))
                raise _PendingSW
            return fn

        nxt = []
        for seq, reg in pending:
            try:
                sammod.alnreg_setSAM(opt, idx, seq, reg,
                                     global_fn=make_fn(reg))
            except _PendingSW:
                nxt.append((seq, reg))
        if not requests:
            break
        _plog(f"setSAM round {rounds}: {len(requests)} global alignments")
        cache.update(dev.sw_global_batch(opt, requests))
        pending = nxt


def _setSAM_candidates(opt: MemOpt, seq, regs):
    """Over-approximate the regions reg2sam will format (score>=T or
    within the XA drop ratio of the best; unmapped rb/re excluded)."""
    best = max((r.score for r in regs), default=0)
    floor = min(opt.T, best * opt.XA_drop_ratio)
    return [(seq, r) for r in regs
            if r.rb >= 0 and r.re >= 0 and r.score >= floor]


def _chain_generators(gen_parent_list):
    """Run several (gen, parent) sequentially as one generator, tagging each
    yielded 5-tuple request with its lane's parent (for matrix selection)."""
    for gen, parent in gen_parent_list:
        try:
            req = next(gen)
        except StopIteration:
            continue
        while True:
            result = yield req + (parent,)
            try:
                req = gen.send(result)
            except StopIteration:
                break


class DeviceSeeder:
    """TPU seed provider for the hybrid device engine.

    Runs the whole of mem_collect_intv (memchain.c:50-106) on the
    accelerator — per-position forward extension with on-device compaction
    (ops/seed_parallel.seed_collect_device) — plus batched SA walks for the
    leading occurrences of every seed, and packages the result as a
    zero-copy seed injection for the C++ batch entries (align_host.cpp
    SeedInj). The branchy stages (chaining, extension, SAM) stay in C++.

    Injection is purely an offload: lanes the device cannot cover (seed-cap
    overflow, unsupported flags) keep `has=0` and self-seed in C++, so
    output is byte-identical with or without a seeder.
    """

    # Occurrences prefetched per seed on device; the tail walks in C++
    # (fm_sa_batch tiles). Default 0: on the tunneled rig the D2H cost of
    # the sa_pos array dwarfs the host walk cost (measured end-to-end sweep,
    # 20k reads: CAP=64 183 r/s, CAP=16 1068 r/s, CAP=0 1792 r/s); with a
    # locally attached chip a nonzero cap wins — override via env.
    SA_CAP = int(os.environ.get("BISCUIT_TPU_SA_CAP", "0"))
    SWEEP = 4096         # lanes per device sweep (bounds kernel buffers)
    JOB_CAP = 1 << 20    # SA jobs per sa_batch call

    def __init__(self, st: AlignerState):
        self.st = st
        self.fmpair = FMPair.from_index(st.idx)

    def lane_keys(self, opt: MemOpt, n: int, pe: bool):
        """Lane keys (read*2+parent) matching the C++ batch lane policy
        (bwamem.c:311-375; align_host.cpp bt_align_*_batch)."""
        pp = opt.parent
        keys = []
        for i in range(n):
            if not pe:
                if not (pp & 1) or (pp >> 1):
                    keys.append(i * 2)
                if not (pp & 1) or not (pp >> 1):
                    keys.append(i * 2 + 1)
            else:
                first = 1 if i % 2 == 0 else 0
                keys.append(i * 2 + first)
                if not pp:
                    keys.append(i * 2 + (1 - first))
        return np.asarray(keys, np.int64)

    def build_injection(self, opt: MemOpt, seqs, pe: bool):
        """Returns (SeedInjC, keepalive) or None (seeder not applicable)."""
        from ..config import MEM_F_SELF_OVLP
        from .native_engine import SeedInjC, _ptr
        import ctypes as Ct
        if opt.flag & MEM_F_SELF_OVLP:  # start_width=2 seeding: C++ path
            return None
        n = len(seqs)
        if n == 0:
            return None
        keys = self.lane_keys(opt, n, pe)
        B = len(keys)
        maxlen = max(s.l_seq for s in seqs)
        L = max((maxlen + 31) // 32 * 32, 32)

        rows_parts, keyrow_parts = [], []
        ovf_by_lane = np.zeros(B, bool)
        for lo in range(0, B, self.SWEEP):
            sub = keys[lo:lo + self.SWEEP]
            nb = len(sub)
            Bb = _pow2(nb)
            q = np.full((Bb, L), 4, dtype=np.int32)
            lens = np.zeros(Bb, np.int32)
            parents = np.zeros(Bb, np.int32)
            for j, key in enumerate(sub):
                s = seqs[key >> 1]
                p = int(key & 1)
                q[j, :s.l_seq] = bsconvert(s, p)
                lens[j] = s.l_seq
                parents[j] = p
            lane_of, rows, overflow = collect_intv_flat_sm(
                self.fmpair, q, lens, parents, opt)
            keep = lane_of < nb
            lane_of, rows = lane_of[keep], rows[keep]
            ovf_by_lane[lo:lo + nb] = overflow[:nb]
            rows_parts.append(rows)
            keyrow_parts.append(sub[lane_of])

        rows = np.concatenate(rows_parts) if rows_parts else \
            np.zeros((0, 5), np.int32)
        keys_of_row = np.concatenate(keyrow_parts) if keyrow_parts else \
            np.zeros(0, np.int64)
        # drop rows of overflowed lanes (they self-seed in C++)
        has = np.zeros(2 * n, np.uint8)
        ok_keys = keys[~ovf_by_lane]
        has[ok_keys] = 1
        rk = has[keys_of_row] == 1
        rows, keys_of_row = rows[rk], keys_of_row[rk]
        # group rows by lane key (stable: preserves in-lane seed order)
        order = np.argsort(keys_of_row, kind="stable")
        rows = np.ascontiguousarray(rows[order])
        keys_of_row = keys_of_row[order]
        M = len(rows)
        lane_off = np.zeros(2 * n + 1, np.int64)
        lane_off[1:] = np.cumsum(np.bincount(keys_of_row.astype(np.int64),
                                             minlength=2 * n))

        # batched SA prefetch: first min(s, SA_CAP) occurrences per seed
        sizes = rows[:, 4].astype(np.int64)
        kmax = np.minimum(sizes, self.SA_CAP)
        sa_off = np.zeros(M + 1, np.int64)
        sa_off[1:] = np.cumsum(kmax)
        total = int(sa_off[-1])
        sa_pos = np.zeros(max(total, 1), np.int64)
        if total:
            rdt = np.int64 if self.fmpair.wide else np.int32
            which_all = np.repeat((keys_of_row & 1).astype(np.int32), kmax)
            base = np.repeat(rows[:, 2].astype(np.int64), kmax)
            within = np.arange(total, dtype=np.int64) - \
                np.repeat(sa_off[:-1], kmax)
            ranks_all = (base + within).astype(rdt)
            for lo in range(0, total, self.JOB_CAP):
                hi = min(lo + self.JOB_CAP, total)
                nj = hi - lo
                njb = _pow2(nj)
                jw = np.zeros(njb, np.int32)
                jr = np.ones(njb, rdt)
                jw[:nj] = which_all[lo:hi]
                jr[:nj] = ranks_all[lo:hi]
                pos = sa_batch_np(self.fmpair, jw, jr)[:nj]
                sa_pos[lo:hi] = pos.astype(np.int64)

        rows_se = np.ascontiguousarray(rows[:, :2].astype(np.int32)) if M \
            else np.zeros((1, 2), np.int32)
        rows_xs = np.ascontiguousarray(rows[:, 2:5].astype(np.int64)) if M \
            else np.zeros((1, 3), np.int64)
        inj = SeedInjC()
        inj.has = Ct.cast(_ptr(has), Ct.c_void_p)
        inj.lane_off = Ct.cast(_ptr(lane_off), Ct.c_void_p)
        inj.rows_se = Ct.cast(_ptr(rows_se), Ct.c_void_p)
        inj.rows_xs = Ct.cast(_ptr(rows_xs), Ct.c_void_p)
        inj.sa_off = Ct.cast(_ptr(sa_off), Ct.c_void_p)
        inj.sa_pos = Ct.cast(_ptr(sa_pos), Ct.c_void_p)
        keep_alive = (has, lane_off, rows_se, rows_xs, sa_off, sa_pos)
        return inj, keep_alive


def process_seqs_hybrid(opt: MemOpt, st: AlignerState, seqs, n_processed: int,
                        pes0=None, rg_id: str = "",
                        engine=None, seeder: Optional[DeviceSeeder] = None):
    """The production TPU engine: device seeding + SA (DeviceSeeder) injected
    into the C++ chain/extend/SAM stages (process_seqs_native).

    SE chunks larger than one device sweep are PIPELINED: an injector
    thread builds sub-batch k+1's injection (device compute + the tunneled
    D2H of packed seed rows) while the C++ stages align sub-batch k (the
    ctypes call releases the GIL), so the injection cost is hidden behind
    the host align instead of serialized in front of it — the kt_pipeline
    idea applied to the host<->device boundary. Output is byte-identical:
    sub-batches pass n_processed offsets through, and reads are
    independent in SE. PE keeps the whole-chunk path (insert-size stats
    span the chunk, bwamem.c:464-467).

    Measured on the tunneled rig (5 Mbp / 20k reads, 2 A/B passes):
    serial 4005/4340 vs pipelined 3856/4605 reads/s — a wash within the
    tunnel's jitter, because the ~2 MB/s D2H dominates BOTH arms (~90%
    of hybrid time is the injection transfer; overlap can only hide the
    smaller C++ term). The design case is a locally-attached chip, where
    injection ~= device compute ~= C++ time and the overlap halves
    wall-clock. Pipelined runs are also markedly more consistent (no
    cold first pass). BISCUIT_TPU_HYBRID_PIPELINE=0 selects serial."""
    from .native_engine import NativeAligner, process_seqs_native
    nat = engine if isinstance(engine, NativeAligner) else NativeAligner(st)
    sdr = seeder or DeviceSeeder(st)
    pe = bool(opt.flag & MEM_F_PE)
    if pe or len(seqs) <= DEVICE_BATCH or \
            os.environ.get("BISCUIT_TPU_HYBRID_PIPELINE", "1") == "0":
        process_seqs_native(opt, st, seqs, n_processed, pes0, rg_id,
                            engine=nat, seeder=sdr)
        return
    import queue
    import threading
    subs = [seqs[lo:lo + DEVICE_BATCH]
            for lo in range(0, len(seqs), DEVICE_BATCH)]
    q: "queue.Queue" = queue.Queue(maxsize=1)

    def _injector():
        try:
            for sub in subs:
                for s in sub:
                    read_clipping(s, opt.adaptor1, opt)
                q.put((sub, sdr.build_injection(opt, sub, False)))
        except BaseException as e:  # surface in the consumer
            q.put(e)

    th = threading.Thread(target=_injector, daemon=True)
    th.start()
    lo = 0
    for _ in subs:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        sub, inj = item
        process_seqs_native(opt, st, sub, n_processed + lo, pes0, rg_id,
                            engine=nat, inj_pre=inj, pre_clipped=True)
        lo += len(sub)
    th.join()


# reads per device sweep. The lane-refill pool pays its straggler tail once
# per POOL, so deeper sweeps amortize it (r3 chip sweep at 5 Mbp: 4k-entry
# pools 32.1k, 32k-entry pools 44.8k reads/s compute-only); each read
# contributes up to 2 pool entries (both conversions), so 16384 reads hits
# the measured 32k-entry sweet spot.
DEVICE_BATCH = int(os.environ.get("BISCUIT_TPU_DEVICE_BATCH", "16384"))


def process_seqs_device(opt: MemOpt, st: AlignerState, seqs, n_processed: int,
                        pes0=None, rg_id: str = "",
                        engine: Optional[DeviceAligner] = None) -> None:
    """mem_process_seqs with the device-backed worker1."""
    dev = engine or DeviceAligner(st)
    pe = bool(opt.flag & MEM_F_PE)
    if pe:
        for i in range(0, len(seqs), 2):
            s1, s2 = seqs[i], seqs[i + 1]
            if s1.name != s2.name and not (
                    s1.name[:-1] == s2.name[:-1] and s1.name[-1] == "1"
                    and s2.name[-1] == "2"):
                raise RuntimeError(
                    f'paired reads have different names: "{s1.name}", "{s2.name}"')
    for s in seqs:
        read_clipping(s, opt.adaptor1 if (not pe or s.id % 2 == 0)
                      else opt.adaptor2, opt)
    step = DEVICE_BATCH * 2 if pe else DEVICE_BATCH
    all_regs: List[AlnRegs] = []
    for lo in range(0, len(seqs), step):
        all_regs.extend(dev.regs_for_batch(opt, seqs[lo:lo + step]))
    # device-side CIGAR: batch-prefill alnreg_setSAM results before the
    # host worker2 loops (skipped at -v4: the byte-exact debug traces
    # interleave setSAM output in host order)
    prefill = (os.environ.get("BISCUIT_TPU_DEVICE_CIGAR", "1") != "0"
               and trace.verbose < 4)
    if not (opt.flag & MEM_F_PE):
        if prefill:
            with _stage("cigar"):
                items = []
                for i, s in enumerate(seqs):
                    items.extend(_setSAM_candidates(opt, s, all_regs[i]))
                prefill_setSAM(opt, st.idx, dev, items)
        with _stage("worker2"):
            for i, s in enumerate(seqs):
                worker2_se(opt, st, s, all_regs[i], n_processed, i, rg_id)
    else:
        n_pairs = len(seqs) >> 1
        pes = pes0 if pes0 is not None else pestat(opt, st.idx, all_regs)
        if prefill:
            # mate rescue mutates the region lists; run it for the whole
            # batch first, then prefill, then worker2 skips rescue.
            # Batched path: every candidate's ksw_align2 in one device
            # dispatch (ops/sw_local), sequential per-pair replay on host —
            # bit-identical to the scalar loop (BISCUIT_TPU_DEVICE_RESCUE=0
            # falls back to it).
            if not (opt.flag & MEM_F_NO_RESCUE):
                with _stage("rescue"):
                    pairs = [((seqs[i << 1], seqs[(i << 1) | 1]),
                              (all_regs[i << 1], all_regs[(i << 1) | 1]))
                             for i in range(n_pairs)]
                    if os.environ.get("BISCUIT_TPU_DEVICE_RESCUE", "1") != "0":
                        matesw_batch(opt, st.idx, pes, pairs,
                                     dev.sw_local_batch_fn(opt))
                    else:
                        for sq, rp in pairs:
                            matesw(opt, st.idx, pes, sq, rp)
            with _stage("cigar"):
                items = []
                for i, s in enumerate(seqs):
                    items.extend(_setSAM_candidates(opt, s, all_regs[i]))
                prefill_setSAM(opt, st.idx, dev, items)
        with _stage("worker2"):
            for i in range(n_pairs):
                worker2_pe(opt, st, (seqs[i << 1], seqs[(i << 1) | 1]),
                           (all_regs[i << 1], all_regs[(i << 1) | 1]), pes,
                           n_processed, i, rg_id, skip_rescue=prefill)
    if PROFILE:
        rep = stage_report()
        _plog("stages: " + ", ".join(
            f"{k}={v:.2f}s" for k, v in rep.items() if k != "device_share")
            + f", device_share={rep['device_share']:.2f}")
