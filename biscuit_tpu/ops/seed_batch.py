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
import os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: the device kernels cost 15-70 s to
# compile over this rig's tunneled TPU, paid once per (shape-bucket) per
# PROCESS without it. Opt out with BISCUIT_TPU_XLA_CACHE=0 or point it at
# a different directory. Harmless on CPU (entries are keyed by backend).
_cache = os.environ.get(
    "BISCUIT_TPU_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "biscuit_tpu", "xla"))
if _cache and _cache != "0":
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

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


def _fused_tab(words: np.ndarray, occ_cp: np.ndarray, seq_len: int,
               wide: bool = False) -> np.ndarray:
    """Fused occ+BWT table: one 32-byte row per 64 BWT bases —
    [c0, c1, c2, c3, w0, w1, w2, w3] as 8 uint32 — so every occ4 query is a
    SINGLE row gather (XLA TPU gathers cost per row, not per byte; the
    separate words/checkpoint layout spent ~3 gather-rows per query).
    Same idea as the C++ runtime's ilv2 blocks (align_host.cpp).

    wide=True (strands >= 2^31 chars, e.g. human): counts no longer fit a
    uint32, so the row becomes 12 uint32 — [lo0..lo3, hi0..hi3, w0..w3] —
    still ONE row gather per query (gathers are row-rate-bound, not
    byte-bound, so the 48-byte row costs the same as the 32-byte one)."""
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
    tot = (base + odd_add).astype(np.uint64)
    if wide:
        tab = np.empty((n64, 12), np.uint32)
        tab[:, 0:4] = (tot & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        tab[:, 4:8] = (tot >> np.uint64(32)).astype(np.uint32)
        tab[:, 8:] = w4
    else:
        tab = np.empty((n64, 8), np.uint32)
        tab[:, :4] = tot.astype(np.uint32)
        tab[:, 4:] = w4
    return tab


@dataclass(frozen=True)
class FMPair:
    """Parent+daughter FM arrays fused for per-lane index selection.
    Index id 0 = daughter, 1 = parent (reference bwt_t bwt[2], bwa.h:42-50).
    The occ+BWT state lives in `tab` (see _fused_tab): one 32-byte row per
    64 bases, so occ4 / bwt_char / invPsi are single-row gathers.

    wide=True: ranks/SA are int64 (strands >= 2^31 chars, reference
    bwtint_t semantics) and tab rows carry split 64-bit counts. All kernels
    must then run under jax.experimental.enable_x64 (the public wrappers
    below do this) so int64 survives tracing.

    shard_axis set (only ever inside a shard_map body): `tab` is this
    device's row-contiguous SLICE of the flattened [2*n64_global, W] fused
    table and `sa_samples` the matching slice of the flattened
    [2*n_sa_global] samples, partitioned over the named mesh axis. Every
    occ4/invPsi/SA gather becomes shard-local-gather + masked-zero + psum
    over that axis (exactly one shard owns each row, so the psum
    reconstructs it bit-exactly on all shards). This is SURVEY §2d's "or
    shard, for big genomes" clause: the reference holds bwt_t bwt[2]
    resident in host RAM (bwa.h:42-50); at human scale the fused tables
    (~15 GB) exceed one v5e's 16 GB HBM, so they partition across the mesh
    instead — HBM capacity scales with devices while the psum adds latency,
    not bandwidth (gathers are row-rate-bound; see docs/SCALING.md)."""
    tab: jnp.ndarray       # [2, n64, 8|12] uint32 fused rows ([R_loc, W] sharded)
    L2: jnp.ndarray        # [2, 5] int32|int64
    primary: jnp.ndarray   # [2] int32|int64
    seq_len: jnp.ndarray   # int32|int64 (same for both strands)
    sa_samples: jnp.ndarray  # [2, n_sa] int32|int64 ([S_loc] sharded)
    wide: bool = False     # static (pytree aux): selects the rank dtype
    sa_intv: int = 32      # static: SA sampling interval (power of two)
    shard_axis: str | None = None  # static: mesh axis of the table shards
    n64_global: int = 0    # static: per-strand row count of the FULL table
    n_sa_global: int = 0   # static: per-strand SA count of the FULL table

    @property
    def rdt(self):
        """Rank dtype: int64 on wide indexes, int32 otherwise."""
        return jnp.int64 if self.wide else jnp.int32

    @classmethod
    def from_index(cls, idx: BisIndex) -> "FMPair":
        wide = idx.dau.sa_samples.dtype.itemsize == 8
        sa_intv = int(getattr(idx.dau, "sa_intv", 32))
        assert sa_intv == int(getattr(idx.par, "sa_intv", 32))
        n = int(idx.dau.seq_len)
        tab = np.stack([_fused_tab(idx.dau.words, idx.dau.occ_cp, n, wide),
                        _fused_tab(idx.par.words, idx.par.occ_cp, n, wide)])
        if wide:
            with jax.enable_x64(True):
                L2 = np.stack([idx.dau.L2, idx.par.L2]).astype(np.int64)
                prim = np.asarray([idx.dau.primary, idx.par.primary],
                                  np.int64)
                sa = np.stack([idx.dau.sa_samples,
                               idx.par.sa_samples]).astype(np.int64)
                sa[:, 0] = -1  # '$' row sentinel (bwt.c:84,94-96 wrap)
                return cls(tab=jnp.asarray(tab), L2=jnp.asarray(L2),
                           primary=jnp.asarray(prim),
                           seq_len=jnp.int64(idx.dau.seq_len),
                           sa_samples=jnp.asarray(sa), wide=True,
                           sa_intv=sa_intv)
        dau = FMArrays.from_strand(idx.dau)
        par = FMArrays.from_strand(idx.par)
        return cls(
            tab=jnp.asarray(tab),
            L2=jnp.stack([dau.L2, par.L2]),
            primary=jnp.stack([dau.primary, par.primary]),
            seq_len=dau.seq_len,
            sa_samples=jnp.stack([dau.sa_samples, par.sa_samples]),
            sa_intv=sa_intv,
        )


jax.tree_util.register_pytree_node(
    FMPair,
    lambda f: ((f.tab, f.L2, f.primary, f.seq_len, f.sa_samples),
               (f.wide, f.sa_intv, f.shard_axis, f.n64_global,
                f.n_sa_global)),
    lambda aux, ch: FMPair(*ch, wide=aux[0], sa_intv=aux[1],
                           shard_axis=aux[2], n64_global=aux[3],
                           n_sa_global=aux[4]),
)


def fm_shard_arrays(fm: FMPair, n_shards: int):
    """Host-side prep for index sharding: flatten the [2, n64, W] fused
    table to [2*n64, W] rows and the [2, n_sa] SA samples to [2*n_sa], each
    zero-padded so n_shards divides the leading axis (pad rows land past
    every addressable global id, so no query ever selects one).

    Returns (tab_flat [Rp, W] np.uint32, sa_flat [Sp], n64, n_sa) — feed
    tab_flat/sa_flat through shard_map with in_specs P(axis, None)/P(axis)
    and rebuild the local FMPair with shard_axis=axis, n64_global=n64,
    n_sa_global=n_sa (see parallel/mesh.sharded_index_seed_fn)."""
    n64 = int(fm.tab.shape[1])
    W = int(fm.tab.shape[-1])
    tab_flat = np.asarray(fm.tab).reshape(2 * n64, W)
    Rp = -(-2 * n64 // n_shards) * n_shards
    if Rp != 2 * n64:
        tab_flat = np.concatenate(
            [tab_flat, np.zeros((Rp - 2 * n64, W), np.uint32)])
    n_sa = int(fm.sa_samples.shape[1])
    sa_flat = np.asarray(fm.sa_samples).reshape(-1)
    Sp = -(-2 * n_sa // n_shards) * n_shards
    if Sp != 2 * n_sa:
        sa_flat = np.concatenate(
            [sa_flat, np.zeros((Sp - 2 * n_sa,), sa_flat.dtype)])
    return tab_flat, sa_flat, n64, n_sa


def _sel2(pair: jnp.ndarray, which: jnp.ndarray) -> jnp.ndarray:
    """pair[which] for a [2, ...] array and per-lane `which` in {0,1} as a
    where-select instead of a gather.  XLA TPU per-lane gathers are
    row-rate-bound (~50 us per 4k rows regardless of operand size, measured
    on v5e); a 2-way select is a free VPU op."""
    a0, a1 = pair[0], pair[1]
    if a0.ndim == 0:
        return jnp.where(which == 1, a1, a0)
    w = (which == 1).reshape(which.shape + (1,) * a0.ndim)
    return jnp.where(w, a1, a0)


def _pick_oh(plane: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """plane [..., B, N] -> [..., B]: element idx[b] of the minor axis via a
    one-hot multiply-reduce (pure VPU) instead of take_along_axis (gather).
    Out-of-range idx yields 0 (callers clip, matching take_along_axis)."""
    N = plane.shape[-1]
    oh = jnp.arange(N, dtype=jnp.int32) == idx[..., None]
    return jnp.sum(jnp.where(oh, plane, 0), axis=-1)


def _occ4_from_row(row: jnp.ndarray, kk: jnp.ndarray) -> jnp.ndarray:
    """Class counts up to position kk (exclusive of positions > kk) given the
    fused 64-base row of kk's block. row [..., 8] uint32, kk [...] int32.
    Wide rows ([..., 12], split 64-bit counts) yield int64 counts; kk may be
    int64 then (only its low bits matter within a 64-base block)."""
    if row.shape[-1] == 12:
        acc = (row[..., 0:4].astype(jnp.int64)
               | (row[..., 4:8].astype(jnp.int64) << 32))
        w4 = row[..., 8:]
    else:
        acc = row[..., :4].astype(jnp.int32)
        w4 = row[..., 4:]
    w_idx = ((kk >> 4) & 3).astype(jnp.int32)[..., None]
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


def _tab_row(fm: FMPair, which: jnp.ndarray, blk: jnp.ndarray) -> jnp.ndarray:
    """Fused-table row for per-lane strand `which` and 64-base block `blk`.

    Fast path: ONE gather on the [2*n64, W] view (the TPU design point —
    occ4/invPsi cost a single row gather).  When the flattened table
    exceeds 2^31 ELEMENTS (human-scale wide indexes on the CPU backend;
    such a table cannot fit a v5e's HBM anyway), XLA:CPU's internal gather
    offsets overflow int32 and scribble memory — so gather each strand
    separately (both operands stay < 2^31 elements) and 2-way select.
    BISCUIT_TPU_SPLIT_TAB=1 forces the split path for testing.

    Sharded path (fm.shard_axis set): the local tab is [R_local, W] rows
    [start, start+R_local) of the flattened global table, start derived
    from this device's axis_index. Out-of-shard queries gather a clamped
    row, zero it, and the psum over the shard axis reconstructs every row
    on every device (exactly one shard owns each row)."""
    if fm.shard_axis is not None:
        R = fm.tab.shape[0]
        g = which.astype(fm.rdt) * fm.n64_global + blk.astype(fm.rdt)
        start = (jax.lax.axis_index(fm.shard_axis).astype(fm.rdt) * R)
        loc = g - start
        ok = (loc >= 0) & (loc < R)
        row = fm.tab[jnp.clip(loc, 0, R - 1).astype(jnp.int32)]
        row = jnp.where(ok[..., None], row, 0)
        return jax.lax.psum(row, fm.shard_axis)
    n64 = fm.tab.shape[1]
    W = fm.tab.shape[-1]
    if 2 * n64 * W <= 0x7FFFFFFF \
            and not os.environ.get("BISCUIT_TPU_SPLIT_TAB"):
        return fm.tab.reshape(2 * n64, W)[which * n64 + blk]
    # the split path halves the operand; past ~11 Gbp PER STRAND even one
    # strand's table overflows XLA:CPU's int32 gather offsets — fail loudly
    # instead of scribbling memory (advisor r4)
    assert n64 * W <= 0x7FFFFFFF, (
        f"single-strand fused table has {n64 * W} elements >= 2^31; "
        "XLA:CPU gather offsets would overflow — this regime needs the "
        "sharded-index path (FMPair.shard_axis)")
    r0 = fm.tab[0][blk]
    r1 = fm.tab[1][blk]
    w = (which == 1).reshape(which.shape + (1,))
    return jnp.where(w, r1, r0)


def occ4_sel(fm: FMPair, which: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """occ4 with a per-lane strand-index selector `which` in {0,1}.
    One fused-table row gather per query."""
    k = k.astype(fm.rdt)
    is_neg = k < 0
    is_full = k == fm.seq_len
    ksafe = jnp.clip(k, 0, fm.seq_len - 1)
    prim = _sel2(fm.primary, which)
    kk = ksafe - (ksafe >= prim).astype(fm.rdt)
    row = _tab_row(fm, which, kk >> 6)
    res = _occ4_from_row(row, kk)
    totals = _sel2(fm.L2[:, 1:5] - fm.L2[:, 0:4], which)
    res = jnp.where(is_full[..., None], totals, res)
    res = jnp.where(is_neg[..., None], 0, res)
    return res


def extend_sel(fm: FMPair, which: jnp.ndarray, x_q: jnp.ndarray,
               x_o: jnp.ndarray, s: jnp.ndarray, is_back: jnp.ndarray):
    """Batched bwt_extend against a per-lane-selected strand index.
    x_q: the rank on the QUERIED index (x[!is_back]); x_o: the other rank.
    Returns (new_xq [B,4], new_xo [B,4], sizes [B,4]) where new_xq is the
    queried-axis update (L2+1+tk) and new_xo the cumulative other axis.

    The two occ4 lookups (tk at x_q-1, tl at x_q-1+s) ride ONE fused-table
    gather of 2B concatenated rows: TPU gathers are near-fixed-cost below
    ~4k rows (see _sel2), so one 2B-row gather per extension step costs
    about half of two B-row gathers."""
    wb = jnp.broadcast_to(which, x_q.shape)
    occ2 = occ4_sel(fm, jnp.concatenate([wb, wb]),
                    jnp.concatenate([x_q - 1, x_q - 1 + s]))
    B = x_q.shape[0]
    tk, tl = occ2[:B], occ2[B:]
    sizes = tl - tk
    L2w = _sel2(fm.L2, which)
    new_xq = L2w[..., :4] + 1 + tk
    prim = _sel2(fm.primary, which)
    crosses = ((x_q <= prim) & (x_q + s - 1 >= prim)).astype(jnp.int32)
    b3 = x_o + crosses
    b2 = b3 + sizes[..., 3]
    b1 = b2 + sizes[..., 2]
    b0 = b1 + sizes[..., 1]
    new_xo = jnp.stack([b0, b1, b2, b3], axis=-1)
    del is_back  # axis selection is done by the caller
    return new_xq, new_xo, sizes


def _pick0(plane: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """plane [..., N, B] -> [..., B]: element idx[b] of axis -2 via a
    one-hot multiply-reduce.  The B-minor ("transposed") counterpart of
    _pick_oh: with B a multiple of 128 every tile is dense, whereas a
    [B, N] layout pads N up to 128 lanes and burns 128/N of the VPU on
    every masked pass (N is 4-64 for all the state-machine planes)."""
    N = plane.shape[-2]
    oh = jnp.arange(N, dtype=jnp.int32)[:, None] == idx[None, :]
    return jnp.sum(jnp.where(oh, plane, 0), axis=-2)


def _write0(plane: jnp.ndarray, idx: jnp.ndarray, rows: jnp.ndarray,
            mask: jnp.ndarray) -> jnp.ndarray:
    """plane [K, N, B]: plane[:, idx[b], b] = rows[:, b] where mask[b],
    as a one-hot masked select over the dense B-minor layout."""
    N = plane.shape[1]
    oh = (jnp.arange(N, dtype=jnp.int32)[:, None] == idx[None, :]) \
        & mask[None, :]
    return jnp.where(oh[None], rows[:, None, :], plane)


def _sel2T(pair: jnp.ndarray, which: jnp.ndarray) -> jnp.ndarray:
    """pair [2, K] selected per lane -> [K, B] (B-minor)."""
    w = (which == 1)[None, :]
    return jnp.where(w, pair[1][:, None], pair[0][:, None])


def _occ4_from_rowT(rowT: jnp.ndarray, kk: jnp.ndarray) -> jnp.ndarray:
    """_occ4_from_row with component-major operands: rowT [8, B] uint32
    ([12, B] wide), kk [B] -> counts [4, B].  Same bit math; every
    elementwise op runs on dense [4, B]/[1, B] tiles instead of the
    [B, 4]-padded-to-[B, 128] layout."""
    if rowT.shape[0] == 12:
        acc = (rowT[0:4].astype(jnp.int64)
               | (rowT[4:8].astype(jnp.int64) << 32))
        w4 = rowT[8:]
    else:
        acc = rowT[:4].astype(jnp.int32)
        w4 = rowT[4:]
    w_idx = ((kk >> 4) & 3).astype(jnp.int32)[None, :]
    t_low = (~kk & 15).astype(jnp.uint32)[None, :]
    jj = jnp.arange(4, dtype=jnp.int32)[:, None]
    sel_part = jj == w_idx
    active = jj <= w_idx
    wm = jnp.where(sel_part, (w4 >> (t_low << 1)) << (t_low << 1), w4)
    inv = ~wm
    lo1 = wm & jnp.uint32(0x55555555)
    c0 = jax.lax.population_count(
        ((inv >> 1) & inv) & jnp.uint32(0x55555555)).astype(jnp.int32)
    c1 = jax.lax.population_count((inv >> 1) & lo1).astype(jnp.int32)
    c2 = jax.lax.population_count(
        (wm >> 1) & (inv & jnp.uint32(0x55555555))).astype(jnp.int32)
    c3 = jax.lax.population_count((wm >> 1) & lo1).astype(jnp.int32)
    corr = jnp.where(sel_part, t_low.astype(jnp.int32), 0)
    counts = jnp.stack([
        jnp.sum(jnp.where(active, c0 - corr, 0), axis=0),
        jnp.sum(jnp.where(active, c1, 0), axis=0),
        jnp.sum(jnp.where(active, c2, 0), axis=0),
        jnp.sum(jnp.where(active, c3, 0), axis=0),
    ], axis=0)
    return acc + counts


def occ4_selT(fm: FMPair, which: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """occ4_sel returning counts component-major [4, B] (B-minor layout
    for the state machines).  One row gather + one [8, B] transpose."""
    k = k.astype(fm.rdt)
    is_neg = k < 0
    is_full = k == fm.seq_len
    ksafe = jnp.clip(k, 0, fm.seq_len - 1)
    prim = _sel2(fm.primary, which)
    kk = ksafe - (ksafe >= prim).astype(fm.rdt)
    row = _tab_row(fm, which, kk >> 6)
    res = _occ4_from_rowT(row.T, kk)
    totalsT = _sel2T(fm.L2[:, 1:5] - fm.L2[:, 0:4], which)
    res = jnp.where(is_full[None], totalsT, res)
    res = jnp.where(is_neg[None], 0, res)
    return res


def extend_selT(fm: FMPair, which: jnp.ndarray, x_q: jnp.ndarray,
                x_o: jnp.ndarray, s: jnp.ndarray, is_back: jnp.ndarray):
    """extend_sel with component-major outputs (new_xq, new_xo, sizes each
    [4, B]); same single 2B-row fused gather."""
    wb = jnp.broadcast_to(which, x_q.shape)
    occ2 = occ4_selT(fm, jnp.concatenate([wb, wb]),
                     jnp.concatenate([x_q - 1, x_q - 1 + s]))
    B = x_q.shape[0]
    tk, tl = occ2[:, :B], occ2[:, B:]
    sizes = tl - tk
    L2wT = _sel2T(fm.L2[:, :4], which)
    new_xq = L2wT + 1 + tk
    prim = _sel2(fm.primary, which)
    crosses = ((x_q <= prim) & (x_q + s - 1 >= prim)).astype(jnp.int32)
    b3 = x_o + crosses
    b2 = b3 + sizes[3]
    b1 = b2 + sizes[2]
    b0 = b1 + sizes[1]
    new_xo = jnp.stack([b0, b1, b2, b3], axis=0)
    del is_back  # axis selection is done by the caller
    return new_xq, new_xo, sizes


def _onehot_write(arr: jnp.ndarray, idx: jnp.ndarray, row: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """arr[b, idx[b], :] = row[b] where mask[b], WITHOUT a scatter.
    XLA TPU scatter serializes (~µs per row); a one-hot masked select is a
    pure VPU pass over [B, C, W] — the profitable trade for small C."""
    C = arr.shape[1]
    oh = (jnp.arange(C, dtype=jnp.int32)[None, :] == idx[:, None]) \
        & mask[:, None]
    return jnp.where(oh[..., None], row[:, None, :], arr)


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
    rdt = fm.rdt              # rank dtype: int64 on wide indexes

    # Array layout note: every multi-component per-lane structure is stored
    # as COMPONENT PLANES with the capacity axis last ([K, B, N], not
    # [B, N, K]).  TPU tiles the two minor dims to (8, 128): a trailing
    # component dim of 3-5 would pad to 128 lanes and waste ~30x bandwidth
    # on every masked full-array select in the loop body.
    # On wide indexes every rank-or-position plane is rdt=int64 (positions
    # too: they mix with ranks in the ik/buf/seed stacks, and a uniform
    # dtype keeps the while-loop carry stable).
    state = dict(
        phase=jnp.full((B,), PH_SCAN, jnp.int32),
        t_idx=jnp.zeros((B,), jnp.int32),
        tasks=tasks.astype(rdt).transpose(2, 0, 1),  # [3, B, T]
        x=jnp.zeros((B,), rdt),
        min_intv=jnp.ones((B,), rdt),
        i=jnp.zeros((B,), rdt),
        ret=jnp.zeros((B,), rdt),
        ik=jnp.zeros((4, B), rdt),                # x0, x1, s, end planes
        # prev/curr interval lists: two C-slots concatenated on one axis so
        # every update is a one-hot masked select (TPU scatters serialize)
        buf=jnp.zeros((4, B, 2 * C), rdt),
        prev_slot=jnp.zeros((B,), jnp.int32),
        n_prev=jnp.zeros((B,), jnp.int32),
        n_curr=jnp.zeros((B,), jnp.int32),
        j=jnp.zeros((B,), jnp.int32),
        call_emits=jnp.zeros((B,), jnp.int32),    # emits in current smem1a
        last_emit_start=jnp.zeros((B,), rdt),
        rev=jnp.zeros((B,), jnp.bool_),           # first BACK row reversed
        seeds=jnp.zeros((5, B, S), rdt),          # start, end, x0, x1, s
        n_seeds=jnp.zeros((B,), jnp.int32),
        overflow=jnp.zeros((B,), jnp.bool_),
        iters=jnp.int32(0),
    )

    # loop-invariant per-lane L2 rows, hoisted out of the while body
    L2f = _sel2(fm.L2, fm_id)     # [B, 5]
    L2c = _sel2(fm.L2, fmc_id)

    def get_q(i):
        """q[lane, i] with out-of-range -> 4 (one-hot, not gather)."""
        ii = jnp.clip(i, 0, L - 1)
        v = _pick_oh(q, ii)
        return jnp.where((i < 0) | (i >= lens), 4, v)

    def pick(plane, idx):
        """plane [K, B, N] -> [K, B]: element idx[b] of every component."""
        return _pick_oh(plane, idx)

    def write(plane, idx, rows, mask):
        """plane[k, b, idx[b]] = rows[k, b] where mask[b] — scatter-free."""
        N = plane.shape[2]
        oh = (jnp.arange(N, dtype=jnp.int32)[None, :] == idx[:, None]) \
            & mask[:, None]
        return jnp.where(oh[None], rows[:, :, None], plane)

    def cond(st):
        return (st["phase"] != PH_DONE).any() & (st["iters"] < max_iters)

    def step(st):
        phase = st["phase"]
        scan = phase == PH_SCAN
        fwd = phase == PH_FWD
        back = phase == PH_BACK

        # ---------------- SCAN ----------------
        cur_t = jnp.clip(st["t_idx"], 0, T - 1)
        task = pick(st["tasks"], cur_t)           # [3, B]
        tasks_left = st["t_idx"] < n_tasks
        tx, tmi = task[0], task[1]
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
        cont = task[2] == 1
        bump = task_amb & cont
        skip = task_amb & (~cont)
        # the tasks[lane, t_idx, 0] rewrite is deferred to the end of the
        # step and combined with the back_done continue-at-ret rewrite
        t_idx = jnp.where(skip, t_idx + 1, t_idx)

        # init: start forward phase
        c0 = jnp.clip(q_at_tx, 0, 3)
        l2f_c0 = _pick_oh(L2f, c0)
        ik_x0 = l2f_c0 + 1
        ik_x1 = _pick_oh(L2c, 3 - c0) + 1
        ik_s = _pick_oh(L2f, c0 + 1) - l2f_c0
        ik_new = jnp.stack([ik_x0, ik_x1, ik_s, tx + 1])   # [4, B]
        ik = jnp.where(task_init[None], ik_new, st["ik"])
        x = jnp.where(task_init, tx, st["x"])
        min_intv = jnp.where(task_init, jnp.maximum(tmi, 1), st["min_intv"])
        i = jnp.where(task_init, tx + 1, st["i"])
        n_curr = jnp.where(task_init, 0, st["n_curr"])
        new_phase = jnp.where(task_init, PH_FWD, new_phase)

        # ---------------- extension (FWD or BACK lanes) ----------------
        qi = get_q(st["i"])
        # rev lanes read the prev row back-to-front (see fwd_finish below)
        jidx = jnp.where(st["rev"], st["n_prev"] - 1 - st["j"], st["j"])
        prevj = pick(st["buf"],
                     st["prev_slot"] * C + jnp.clip(jidx, 0, C - 1))  # [4,B]
        back_c = jnp.where((st["i"] < 0) | (qi > 3), -1, qi)
        fwd_need = fwd & (st["i"] < lens) & (qi < 4)
        back_need = back & (back_c >= 0) & (st["j"] < st["n_prev"])
        need = fwd_need | back_need

        which = jnp.where(fwd, fmc_id, fm_id)
        x_q = jnp.where(fwd, st["ik"][1], prevj[0])
        x_o = jnp.where(fwd, st["ik"][0], prevj[1])
        s_in = jnp.where(fwd, st["ik"][2], prevj[2])
        # guard inactive lanes with safe ranks
        x_q = jnp.where(need, x_q, 1)
        s_in = jnp.where(need, s_in, 1)
        new_xq, new_xo, sizes = extend_sel(fm, which, x_q, x_o, s_in, back)
        # ok[c] for the relevant c
        fwd_c = 3 - jnp.clip(qi, 0, 3)
        c_sel = jnp.where(fwd, fwd_c, jnp.clip(back_c, 0, 3))
        ok_q = _pick_oh(new_xq, c_sel)   # queried-axis rank
        ok_o = _pick_oh(new_xo, c_sel)
        ok_s = _pick_oh(sizes, c_sel)
        # map back to (x0, x1): FWD queried axis = x1; BACK queried axis = x0
        ok_x0 = jnp.where(fwd, ok_o, ok_q)
        ok_x1 = jnp.where(fwd, ok_q, ok_o)

        # ---------------- FWD logic ----------------
        at_end = fwd & ((st["i"] >= lens) | (qi >= 4))
        size_changed = fwd_need & (ok_s != st["ik"][2])
        push_ik = at_end | size_changed
        curr_slot = 1 - st["prev_slot"]

        # ---------------- BACK decisions (emit / seed store) -------------
        back_act = back & (st["j"] < st["n_prev"])
        keep = back_act & ((back_c < 0) | (ok_s < min_intv))
        emit = keep & (n_curr == 0) & \
            ((st["call_emits"] == 0) | (st["i"] + 1 < st["last_emit_start"]))
        start = st["i"] + 1
        end = prevj[3]
        store = emit & (end - start >= min_seed_len)
        can_store = st["n_seeds"] < S
        seed_rows = jnp.stack([start, end, prevj[0], prevj[1], prevj[2]])
        seeds = write(st["seeds"], jnp.minimum(st["n_seeds"], S - 1),
                      seed_rows, store & can_store)
        n_seeds = jnp.where(store & can_store, st["n_seeds"] + 1, st["n_seeds"])
        overflow = st["overflow"] | (store & ~can_store)
        call_emits = jnp.where(emit, st["call_emits"] + 1, st["call_emits"])
        last_emit_start = jnp.where(emit, start, st["last_emit_start"])

        # back-append decision (reads pre-write buf; fwd/back lanes disjoint)
        curr_last_s = pick(st["buf"][2:3],
                           curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))[0]
        append = back_act & (~keep) & ((n_curr == 0) | (ok_s != curr_last_s))
        app_rows = jnp.stack([ok_x0, ok_x1, ok_s, prevj[3]])   # [4, B]

        # ONE one-hot write covers both curr-list growth events — the fwd
        # push of ik and the back append — they target the same curr[n_curr]
        wrow = jnp.where(fwd[None], st["ik"], app_rows)
        want_grow = push_ik | append
        grow = want_grow & (n_curr < C)
        buf = write(st["buf"], curr_slot * C + jnp.minimum(n_curr, C - 1),
                    wrow, grow)
        n_curr = jnp.where(grow, n_curr + 1, n_curr)
        # interval-list capacity spill: flag the lane so the caller reruns
        # it on the host path instead of silently dropping the entry
        overflow = overflow | (want_grow & ~grow)

        small = fwd_need & (ok_s < min_intv)
        fwd_finish = at_end | (size_changed & small)
        # continue forward
        adv = fwd_need & (~fwd_finish)
        ik = jnp.where(adv[None],
                       jnp.stack([ok_x0, ok_x1, ok_s, st["i"] + 1]), ik)
        i = jnp.where(adv, st["i"] + 1, i)

        # finish forward: enter BACK over the curr list in REVERSED order.
        # The host reverses curr into prev here (smem1a); a physical reverse
        # costs a full-buffer permute+select every iteration, so instead the
        # curr slot becomes prev in place and a per-lane `rev` flag makes
        # the FIRST backward row read it back-to-front (later rows are
        # appended in scan order, like the host's, and read forward).
        ret = jnp.where(
            fwd_finish,
            pick(buf[3:4], curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))[0],
            st["ret"])
        rev = st["rev"] | fwd_finish
        n_prev = jnp.where(fwd_finish, n_curr, st["n_prev"])
        n_curr = jnp.where(fwd_finish, 0, n_curr)
        i = jnp.where(fwd_finish, x - 1, i)
        j = jnp.where(fwd_finish, 0, st["j"])
        call_emits = jnp.where(fwd_finish, 0, call_emits)
        last_emit_start = jnp.where(fwd_finish, BIG, last_emit_start)
        new_phase = jnp.where(fwd_finish, PH_BACK, new_phase)

        j = jnp.where(back_act, j + 1, j)
        row_done = back & (j >= st["n_prev"])
        back_done = row_done & (n_curr == 0)
        back_next = row_done & (n_curr != 0)
        # next backward row: swap slots; rows after the first read forward
        rev = rev & ~back_next
        prev_slot = jnp.where(back_next | fwd_finish, curr_slot,
                              st["prev_slot"])
        n_prev = jnp.where(back_next, n_curr, n_prev)
        n_curr = jnp.where(back_next, 0, n_curr)
        i = jnp.where(back_next, st["i"] - 1, i)
        j = jnp.where(back_next, 0, j)

        # smem1a finished: continue scan task or advance to next task.
        # Both rewrites of tasks[lane, t_idx, 0] — the scan ambiguous-base
        # bump and the continue-at-ret — land in one one-hot select
        # (disjoint lane sets: scan vs back phase).
        newx = jnp.where(bump, tx + 1, ret)
        tmask = bump | (back_done & cont)
        ohT = (jnp.arange(T, dtype=jnp.int32)[None, :] == cur_t[:, None]) \
            & tmask[:, None]                                      # [B, T]
        col0 = jnp.arange(3, dtype=jnp.int32) == 0
        tasks_upd = jnp.where(col0[:, None, None] & ohT[None],
                              newx[None, :, None], st["tasks"])
        t_idx = jnp.where(back_done & (~cont), t_idx + 1, t_idx)
        new_phase = jnp.where(back_done, PH_SCAN, new_phase)

        return dict(phase=new_phase, t_idx=t_idx, tasks=tasks_upd, x=x,
                    min_intv=min_intv, i=i, ret=ret, ik=ik, buf=buf,
                    prev_slot=prev_slot, n_prev=n_prev, n_curr=n_curr, j=j,
                    call_emits=call_emits, last_emit_start=last_emit_start,
                    rev=rev, seeds=seeds, n_seeds=n_seeds, overflow=overflow,
                    iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    # restore the public [B, S, 5] seed layout from the component planes
    return (final["seeds"].transpose(1, 2, 0), final["n_seeds"],
            final["overflow"], final["iters"])


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width",
                                   "C", "S", "T2", "max_iters"))
def smem3_batch(fm: FMPair, q: jnp.ndarray, lens: jnp.ndarray,
                parent: jnp.ndarray, min_seed_len: int, max_mem_intv: int,
                split_len: int, split_width: int,
                C: int = 160, S: int = 192, T2: int = 16,
                max_iters: int = 200000):
    """All three mem_collect_intv passes in ONE lockstep while_loop.

    The fused-3-dispatch formulation (_collect_sm_fused) runs pass 1 to the
    slowest lane, then pass 2 to ITS slowest lane, then pass 3 — the batch
    pays sum-of-per-pass-maxes iterations while the mean lane is idle ~70%
    of them (measured: 584+292+95 iterations vs a 287-mean per-lane total
    on 1%-error reads). Here each lane advances through its OWN pass
    schedule — p1 scan task, p2 re-seed tasks derived on demand from its
    own pass-1 seeds, p3 forward-only seed_strategy — so the batch runs
    max-of-per-lane-totals iterations (~1.7x fewer extension steps).

    Pass-2 task derivation is scatter-free and happens inside the loop: a
    stage-2 lane's t-th task is the t-th pass-1 seed (slot < its n1
    snapshot, insertion order) with end-start >= split_len and
    occ <= split_width, picked by a cumsum-rank one-hot over the seed
    planes (memchain.c:76-85 semantics). Lanes that spill S seeds, C
    intervals, or T2 pass-2 tasks flag `overflow` and rerun on the host.

    Returns (seeds [B, S, 5] (start, end, x0, x1, size) in the reference's
    p1,p2,p3 insertion order, n_seeds [B], overflow [B], iters)."""
    B, L = q.shape
    fm_id = parent
    fmc_id = 1 - parent
    rdt = fm.rdt
    msl = jnp.asarray(min_seed_len, jnp.int32)
    PH_P3 = 4

    state = dict(
        phase=jnp.full((B,), PH_SCAN, jnp.int32),
        stage=jnp.ones((B,), jnp.int32),          # 1, 2, 3
        t_idx=jnp.zeros((B,), jnp.int32),
        x1next=jnp.zeros((B,), rdt),              # stage-1 scan restart x
        n1s=jnp.zeros((B,), jnp.int32),           # n_seeds snapshot at p1 end
        x=jnp.zeros((B,), rdt),
        min_intv=jnp.ones((B,), rdt),
        i=jnp.zeros((B,), rdt),
        ret=jnp.zeros((B,), rdt),
        ik=jnp.zeros((4, B), rdt),
        buf=jnp.zeros((4, B, 2 * C), rdt),
        prev_slot=jnp.zeros((B,), jnp.int32),
        n_prev=jnp.zeros((B,), jnp.int32),
        n_curr=jnp.zeros((B,), jnp.int32),
        j=jnp.zeros((B,), jnp.int32),
        call_emits=jnp.zeros((B,), jnp.int32),
        last_emit_start=jnp.zeros((B,), rdt),
        rev=jnp.zeros((B,), jnp.bool_),
        seeds=jnp.zeros((5, B, S), rdt),
        n_seeds=jnp.zeros((B,), jnp.int32),
        overflow=jnp.zeros((B,), jnp.bool_),
        iters=jnp.int32(0),
    )

    L2f = _sel2(fm.L2, fm_id)     # [B, 5] loop-invariant
    L2c = _sel2(fm.L2, fmc_id)
    slot_r = jnp.arange(S, dtype=jnp.int32)[None, :]

    def get_q(i):
        ii = jnp.clip(i, 0, L - 1)
        v = _pick_oh(q, ii)
        return jnp.where((i < 0) | (i >= lens), 4, v)

    def pick(plane, idx):
        return _pick_oh(plane, idx)

    def write(plane, idx, rows, mask):
        N = plane.shape[2]
        oh = (jnp.arange(N, dtype=jnp.int32)[None, :] == idx[:, None]) \
            & mask[:, None]
        return jnp.where(oh[None], rows[:, :, None], plane)

    def cond(st):
        return (st["phase"] != PH_DONE).any() & (st["iters"] < max_iters)

    def step(st):
        phase, stage = st["phase"], st["stage"]
        scan12 = (phase == PH_SCAN) & (stage < 3)
        scan3 = (phase == PH_SCAN) & (stage == 3)
        fwd = phase == PH_FWD
        back = phase == PH_BACK
        p3e = phase == PH_P3

        # ------------- stage-1/2 SCAN: on-demand task derivation ---------
        # stage-2 task t = t-th qualifying pass-1 seed (cumsum rank pick)
        sst, sen, ssz = st["seeds"][0], st["seeds"][1], st["seeds"][4]
        m2 = (slot_r < st["n1s"][:, None]) \
            & (sen - sst >= split_len) & (ssz <= split_width)
        n_t2 = m2.sum(axis=1).astype(jnp.int32)
        oh2 = m2 & ((jnp.cumsum(m2, axis=1) - 1) == st["t_idx"][:, None])
        t2mid = jnp.sum(jnp.where(oh2, (sst + sen) >> 1, 0), axis=1)
        t2mi = jnp.sum(jnp.where(oh2, ssz + 1, 0), axis=1)

        is1 = stage == 1
        n_tasks_cur = jnp.where(is1, 1, jnp.minimum(n_t2, T2))
        tx = jnp.where(is1, st["x1next"], t2mid)
        tmi = jnp.where(is1, jnp.ones((B,), rdt), t2mi)
        cont = is1                                 # stage-1 task is cont=1
        tasks_left = st["t_idx"] < n_tasks_cur
        q_at_tx = get_q(tx)
        task_done = scan12 & (~tasks_left)
        task_past_end = scan12 & tasks_left & (tx >= lens)
        task_amb = scan12 & tasks_left & (tx < lens) & (q_at_tx >= 4)
        task_init = scan12 & tasks_left & (tx < lens) & (q_at_tx < 4)

        # stage transitions on task exhaustion (one iteration each)
        go2 = task_done & is1
        go3 = task_done & (stage == 2)
        n1snap = jnp.where(go2, st["n_seeds"], st["n1s"])
        t_idx = jnp.where(go2, 0, st["t_idx"])
        overflow = st["overflow"] | (go3 & (n_t2 > T2))  # >T2 tasks: spill
        if max_mem_intv > 0:
            stage_n = jnp.where(go2, 2, jnp.where(go3, 3, stage))
            x = jnp.where(go3, 0, st["x"])
            new_phase = phase
        else:
            stage_n = jnp.where(go2, 2, stage)
            x = st["x"]
            new_phase = jnp.where(go3, PH_DONE, phase)

        bump = task_amb & cont
        skip = task_amb & (~cont)
        t_idx = jnp.where(skip | task_past_end, t_idx + 1, t_idx)

        c0 = jnp.clip(q_at_tx, 0, 3)
        l2f_c0 = _pick_oh(L2f, c0)
        ik_x0 = l2f_c0 + 1
        ik_x1 = _pick_oh(L2c, 3 - c0) + 1
        ik_s = _pick_oh(L2f, c0 + 1) - l2f_c0
        ik_new12 = jnp.stack([ik_x0, ik_x1, ik_s, tx + 1])
        ik = jnp.where(task_init[None], ik_new12, st["ik"])
        x = jnp.where(task_init, tx, x)
        min_intv = jnp.where(task_init, jnp.maximum(tmi, 1), st["min_intv"])
        i = jnp.where(task_init, tx + 1, st["i"])
        n_curr = jnp.where(task_init, 0, st["n_curr"])
        new_phase = jnp.where(task_init, PH_FWD, new_phase)

        # ------------- stage-3 SCAN (bwt_seed_strategy1 outer loop) ------
        qx3 = get_q(st["x"])  # stage-3 scans x itself, not a task x
        p3_end = scan3 & (st["x"] >= lens)
        p3_start = scan3 & (st["x"] < lens) & (qx3 < 4)
        p3_skip = scan3 & (st["x"] < lens) & (qx3 >= 4)
        new_phase = jnp.where(p3_end, PH_DONE, new_phase)
        x = jnp.where(p3_skip, st["x"] + 1, x)
        c03 = jnp.clip(qx3, 0, 3)
        l2f_c03 = _pick_oh(L2f, c03)
        ik_new3 = jnp.stack([l2f_c03 + 1, _pick_oh(L2c, 3 - c03) + 1,
                             _pick_oh(L2f, c03 + 1) - l2f_c03,
                             jnp.zeros((B,), rdt)])
        ik = jnp.where(p3_start[None], ik_new3, ik)
        i = jnp.where(p3_start, st["x"] + 1, i)
        new_phase = jnp.where(p3_start, PH_P3, new_phase)

        # ------------- extension (FWD, BACK, or P3 lanes) ----------------
        qi = get_q(st["i"])
        jidx = jnp.where(st["rev"], st["n_prev"] - 1 - st["j"], st["j"])
        prevj = pick(st["buf"],
                     st["prev_slot"] * C + jnp.clip(jidx, 0, C - 1))
        back_c = jnp.where((st["i"] < 0) | (qi > 3), -1, qi)
        fwdlike = fwd | p3e          # both extend ik on the fmc strand
        fwd_need = fwdlike & (st["i"] < lens) & (qi < 4)
        back_need = back & (back_c >= 0) & (st["j"] < st["n_prev"])
        need = fwd_need | back_need

        which = jnp.where(fwdlike, fmc_id, fm_id)
        x_q = jnp.where(fwdlike, st["ik"][1], prevj[0])
        x_o = jnp.where(fwdlike, st["ik"][0], prevj[1])
        s_in = jnp.where(fwdlike, st["ik"][2], prevj[2])
        x_q = jnp.where(need, x_q, 1)
        s_in = jnp.where(need, s_in, 1)
        new_xq, new_xo, sizes = extend_sel(fm, which, x_q, x_o, s_in, back)
        fwd_c = 3 - jnp.clip(qi, 0, 3)
        c_sel = jnp.where(fwdlike, fwd_c, jnp.clip(back_c, 0, 3))
        ok_q = _pick_oh(new_xq, c_sel)
        ok_o = _pick_oh(new_xo, c_sel)
        ok_s = _pick_oh(sizes, c_sel)
        ok_x0 = jnp.where(fwdlike, ok_o, ok_q)
        ok_x1 = jnp.where(fwdlike, ok_q, ok_o)

        # ------------- FWD logic (stages 1-2) -----------------------------
        at_end = fwd & ((st["i"] >= lens) | (qi >= 4))
        size_changed = fwd & (st["i"] < lens) & (qi < 4) \
            & (ok_s != st["ik"][2])
        push_ik = at_end | size_changed
        curr_slot = 1 - st["prev_slot"]

        # ------------- BACK decisions (emit / store) ----------------------
        back_act = back & (st["j"] < st["n_prev"])
        keep = back_act & ((back_c < 0) | (ok_s < min_intv))
        emit = keep & (n_curr == 0) & \
            ((st["call_emits"] == 0) | (st["i"] + 1 < st["last_emit_start"]))
        start = st["i"] + 1
        end = prevj[3]
        store = emit & (end - start >= msl)

        # ------------- P3 decisions ---------------------------------------
        p3_need = p3e & (st["i"] < lens) & (qi < 4)
        p3_endlen = p3e & (st["i"] >= lens)
        p3_amb = p3e & (st["i"] < lens) & (qi >= 4)
        p3_hit = p3_need & (ok_s < max_mem_intv) & (st["i"] - st["x"] >= msl)
        p3_store = p3_hit & (ok_s > 0)

        # ------------- ONE seed write for BACK-emit and P3-hit ------------
        can_store = st["n_seeds"] < S
        do_store = (store | p3_store) & can_store
        seed_rows = jnp.where(
            p3e[None],
            jnp.stack([st["x"], st["i"] + 1, ok_x0, ok_x1, ok_s]),
            jnp.stack([start, end, prevj[0], prevj[1], prevj[2]]))
        seeds = write(st["seeds"], jnp.minimum(st["n_seeds"], S - 1),
                      seed_rows, do_store)
        n_seeds = jnp.where(do_store, st["n_seeds"] + 1, st["n_seeds"])
        overflow = overflow | ((store | p3_store) & ~can_store)
        call_emits = jnp.where(emit, st["call_emits"] + 1, st["call_emits"])
        last_emit_start = jnp.where(emit, start, st["last_emit_start"])

        # back-append / fwd-push of the interval list (stages 1-2 only)
        curr_last_s = pick(st["buf"][2:3],
                           curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))[0]
        append = back_act & (~keep) & ((n_curr == 0) | (ok_s != curr_last_s))
        app_rows = jnp.stack([ok_x0, ok_x1, ok_s, prevj[3]])
        wrow = jnp.where(fwd[None], st["ik"], app_rows)
        want_grow = push_ik | append
        grow = want_grow & (n_curr < C)
        buf = write(st["buf"], curr_slot * C + jnp.minimum(n_curr, C - 1),
                    wrow, grow)
        n_curr = jnp.where(grow, n_curr + 1, n_curr)
        overflow = overflow | (want_grow & ~grow)

        small = fwd & (st["i"] < lens) & (qi < 4) & (ok_s < min_intv)
        fwd_finish = at_end | (size_changed & small)
        adv = (fwd & (st["i"] < lens) & (qi < 4) & (~fwd_finish)) \
            | (p3_need & (~p3_hit))                 # p3 continue-forward
        ik = jnp.where(adv[None],
                       jnp.stack([ok_x0, ok_x1, ok_s, st["i"] + 1]), ik)
        i = jnp.where(adv, st["i"] + 1, i)

        ret = jnp.where(
            fwd_finish,
            pick(buf[3:4], curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))[0],
            st["ret"])
        rev = st["rev"] | fwd_finish
        n_prev = jnp.where(fwd_finish, n_curr, st["n_prev"])
        n_curr = jnp.where(fwd_finish, 0, n_curr)
        i = jnp.where(fwd_finish, x - 1, i)
        j = jnp.where(fwd_finish, 0, st["j"])
        call_emits = jnp.where(fwd_finish, 0, call_emits)
        last_emit_start = jnp.where(fwd_finish, BIG, last_emit_start)
        new_phase = jnp.where(fwd_finish, PH_BACK, new_phase)

        j = jnp.where(back_act, j + 1, j)
        row_done = back & (j >= st["n_prev"])
        back_done = row_done & (n_curr == 0)
        back_next = row_done & (n_curr != 0)
        rev = rev & ~back_next
        prev_slot = jnp.where(back_next | fwd_finish, curr_slot,
                              st["prev_slot"])
        n_prev = jnp.where(back_next, n_curr, n_prev)
        n_curr = jnp.where(back_next, 0, n_curr)
        i = jnp.where(back_next, st["i"] - 1, i)
        j = jnp.where(back_next, 0, j)

        # smem1a finished: stage 1 continues its scan task at ret; stage 2
        # advances to its next derived task
        x1next = jnp.where(bump, tx + 1,
                           jnp.where(back_done & cont, ret, st["x1next"]))
        t_idx = jnp.where(back_done & (~cont), t_idx + 1, t_idx)
        new_phase = jnp.where(back_done, PH_SCAN, new_phase)

        # p3 run terminations → back to stage-3 scan
        x = jnp.where(p3_endlen, lens.astype(rdt), x)
        x = jnp.where(p3_amb | p3_hit, st["i"] + 1, x)
        new_phase = jnp.where(p3_endlen | p3_amb | p3_hit, PH_SCAN, new_phase)

        return dict(phase=new_phase, stage=stage_n, t_idx=t_idx,
                    x1next=x1next, n1s=n1snap, x=x, min_intv=min_intv, i=i,
                    ret=ret, ik=ik, buf=buf, prev_slot=prev_slot,
                    n_prev=n_prev, n_curr=n_curr, j=j, call_emits=call_emits,
                    last_emit_start=last_emit_start, rev=rev, seeds=seeds,
                    n_seeds=n_seeds, overflow=overflow,
                    iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return (final["seeds"].transpose(1, 2, 0), final["n_seeds"],
            final["overflow"], final["iters"])


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width", "lanes",
                                   "C", "S", "T2", "max_iters",
                                   "claim_every", "_force_iters",
                                   "_ablate_gather"))
def smem3_pool_batch(fm: FMPair, pool: jnp.ndarray,
                     min_seed_len: int, max_mem_intv: int,
                     split_len: int, split_width: int, lanes: int = 1024,
                     C: int = 32, S: int = 128, T2: int = 16,
                     max_iters: int = 500000, claim_every: int = 1,
                     _force_iters: int = 0, _ablate_gather: bool = False):
    """smem3_batch with LANE REFILL: B persistent lanes drain an N-read
    pool, each lane claiming the next read the moment it finishes its own.

    Why: in the per-read-per-lane machine the batch runs to the SLOWEST
    lane — measured mean/max per-lane work is ~290/777 iterations on
    1%-error reads, i.e. ~63% of every iteration's gather rows are spent
    on idle lanes. With refill the straggler tail only appears once at
    pool exhaustion, so iteration count approaches total-work/B.

    The claim is scatter-free and costs ONE extra B-row gather on
    iterations where any lane claims: read metadata (len, parent) is
    packed into two trailing columns of the pool row, so q/len/parent
    arrive in a single row gather; the claimed read index is
    next_ctr + cumsum(claim_mask) (pure VPU).

    Seeds carry a read-id plane; output order is restored by the stable
    (read, start, end) sort exactly as in the per-lane machine. A lane
    whose seed buffer fills stops claiming (healthy lanes absorb the
    rest) and flags its current read id in `ov_rd`; the caller reruns
    flagged reads on the host. Reads with len 0 (padding) terminate in a
    few iterations and emit nothing.

    Diagnostics only (tools/seed_diag.py; NEVER production): the machine
    is lockstep SIMD, so per-iteration cost is data-independent except
    for gather locality. _force_iters=K runs exactly K iterations with
    the claim recycling pool reads (ridx mod N) so gather traffic stays
    realistic; _ablate_gather=True replaces the extend_sel + claim row
    gathers with same-shape VPU fakes. t(full) - t(ablated) over the
    same forced K isolates the gather share of iteration cost.

    pool  [N, L+2] int32/rdt rows: [codes..., len, parent]
    Returns (seeds [B, S, 6] (start, end, x0, x1, size, read_id),
             n_seeds [B], ov_rd [B, 8] read ids (-1 empty), ov_spill bool,
             iters)."""
    N, Lp2 = pool.shape
    L = Lp2 - 2
    B = lanes
    rdt = fm.rdt
    msl = jnp.asarray(min_seed_len, jnp.int32)
    PH_P3, PH_CLAIM = 4, 5
    OVCAP = 8

    state = dict(
        phase=jnp.full((B,), PH_CLAIM, jnp.int32),
        stage=jnp.ones((B,), jnp.int32),
        rd=jnp.full((B,), -1, jnp.int32),         # current read id
        q_cur=jnp.full((B, L), 4, rdt),
        len_cur=jnp.zeros((B,), rdt),
        par_cur=jnp.zeros((B,), jnp.int32),
        rbase=jnp.zeros((B,), jnp.int32),         # n_seeds at claim time
        next_ctr=jnp.int32(0),
        t_idx=jnp.zeros((B,), jnp.int32),
        x1next=jnp.zeros((B,), rdt),
        n1s=jnp.zeros((B,), jnp.int32),
        x=jnp.zeros((B,), rdt),
        min_intv=jnp.ones((B,), rdt),
        i=jnp.zeros((B,), rdt),
        ret=jnp.zeros((B,), rdt),
        ik=jnp.zeros((4, B), rdt),
        buf=jnp.zeros((4, B, 2 * C), rdt),
        prev_slot=jnp.zeros((B,), jnp.int32),
        n_prev=jnp.zeros((B,), jnp.int32),
        n_curr=jnp.zeros((B,), jnp.int32),
        j=jnp.zeros((B,), jnp.int32),
        call_emits=jnp.zeros((B,), jnp.int32),
        last_emit_start=jnp.zeros((B,), rdt),
        rev=jnp.zeros((B,), jnp.bool_),
        seeds=jnp.zeros((6, B, S), rdt),          # + read-id plane
        n_seeds=jnp.zeros((B,), jnp.int32),
        ov_rd=jnp.full((B, OVCAP), -1, jnp.int32),
        ov_n=jnp.zeros((B,), jnp.int32),
        ov_spill=jnp.bool_(False),
        iters=jnp.int32(0),
    )

    slot_r = jnp.arange(S, dtype=jnp.int32)[None, :]

    def pick(plane, idx):
        return _pick_oh(plane, idx)

    def write(plane, idx, rows, mask):
        Np = plane.shape[2]
        oh = (jnp.arange(Np, dtype=jnp.int32)[None, :] == idx[:, None]) \
            & mask[:, None]
        return jnp.where(oh[None], rows[:, :, None], plane)

    def cond(st):
        if _force_iters > 0:
            return st["iters"] < _force_iters
        # pool reads only matter while some lane can still claim them; if
        # every lane's seed buffer filled, stop (the host reruns the
        # unclaimed tail — see next_ctr in the return value)
        claimable = (st["n_seeds"] <= S - 48).any()
        live = (st["phase"] != PH_DONE).any() \
            | ((st["next_ctr"] < N) & claimable)
        return live & (st["iters"] < max_iters)

    def step(st):
        # ------------- CLAIM: idle lanes pull the next pool read ----------
        idle = (st["phase"] == PH_DONE) | (st["phase"] == PH_CLAIM)
        # a lane with a full-ish seed buffer stops claiming: a new read
        # could not store seeds, so healthy lanes absorb the remainder
        lane_ok = st["n_seeds"] <= S - 48

        def do_claim(op):
            q0, l0, p0, rd0, rb0, ph0, sg0, ti0, x10, nc0 = op
            claim_try = idle & lane_ok
            order = jnp.cumsum(claim_try.astype(jnp.int32)) - 1
            if _force_iters > 0:        # diag: recycle the pool forever
                ridx = (nc0 + order) % N
                claim = claim_try
                nc1 = ((nc0 + claim_try.astype(jnp.int32).sum()) % N
                       ).astype(jnp.int32)
            else:
                ridx = nc0 + order
                claim = claim_try & (ridx < N)
                nc1 = jnp.minimum(nc0 + claim_try.astype(jnp.int32).sum(),
                                  N).astype(jnp.int32)
            if _ablate_gather:
                rows_cl = (jnp.zeros((B, Lp2), pool.dtype)
                           + ridx[:, None].astype(pool.dtype))
            else:
                rows_cl = pool[jnp.where(claim, ridx, 0)]  # ONE B-row gather
            return (jnp.where(claim[:, None], rows_cl[:, :L], q0),
                    jnp.where(claim, rows_cl[:, L], l0),
                    jnp.where(claim, rows_cl[:, L + 1].astype(jnp.int32),
                              p0),
                    jnp.where(claim, ridx, rd0),
                    jnp.where(claim, st["n_seeds"], rb0),
                    jnp.where(claim, PH_SCAN,
                              jnp.where(idle, PH_DONE, ph0)),
                    jnp.where(claim, 1, sg0),
                    jnp.where(claim, 0, ti0),
                    jnp.where(claim, jnp.zeros((), x10.dtype), x10),
                    nc1)

        ops = (st["q_cur"], st["len_cur"], st["par_cur"], st["rd"],
               st["rbase"], st["phase"], st["stage"], st["t_idx"],
               st["x1next"], st["next_ctr"])
        if claim_every > 1:
            # skip the claim gather entirely on off-beat iterations: lanes
            # idle <=claim_every-1 extra steps (<2% at claim_every=4) and
            # 1-1/claim_every of the claim gathers disappear under lax.cond
            gate = (st["iters"] % claim_every) == 0
            (q_cur, len_cur, par_cur, rd, rbase, phase, stage, t_idx,
             x1next, next_ctr) = jax.lax.cond(
                gate & idle.any(), do_claim, lambda op: op, ops)
        else:
            (q_cur, len_cur, par_cur, rd, rbase, phase, stage, t_idx,
             x1next, next_ctr) = do_claim(ops)

        lens = len_cur
        fm_id = par_cur
        fmc_id = 1 - par_cur
        L2f = _sel2(fm.L2, fm_id)
        L2c = _sel2(fm.L2, fmc_id)

        def get_q(i):
            ii = jnp.clip(i, 0, L - 1)
            v = _pick_oh(q_cur, ii)
            return jnp.where((i < 0) | (i >= lens), 4, v)

        scan12 = (phase == PH_SCAN) & (stage < 3)
        scan3 = (phase == PH_SCAN) & (stage == 3)
        fwd = phase == PH_FWD
        back = phase == PH_BACK
        p3e = phase == PH_P3

        # ------------- stage-1/2 SCAN: on-demand task derivation ----------
        sst, sen, ssz = st["seeds"][0], st["seeds"][1], st["seeds"][4]
        m2 = (slot_r >= rbase[:, None]) & (slot_r < st["n1s"][:, None]) \
            & (sen - sst >= split_len) & (ssz <= split_width)
        n_t2 = m2.sum(axis=1).astype(jnp.int32)
        oh2 = m2 & ((jnp.cumsum(m2, axis=1) - 1) == t_idx[:, None])
        t2mid = jnp.sum(jnp.where(oh2, (sst + sen) >> 1, 0), axis=1)
        t2mi = jnp.sum(jnp.where(oh2, ssz + 1, 0), axis=1)

        is1 = stage == 1
        n_tasks_cur = jnp.where(is1, 1, jnp.minimum(n_t2, T2))
        tx = jnp.where(is1, x1next, t2mid)
        tmi = jnp.where(is1, jnp.ones((B,), rdt), t2mi)
        cont = is1
        tasks_left = t_idx < n_tasks_cur
        q_at_tx = get_q(tx)
        task_done = scan12 & (~tasks_left)
        task_past_end = scan12 & tasks_left & (tx >= lens)
        task_amb = scan12 & tasks_left & (tx < lens) & (q_at_tx >= 4)
        task_init = scan12 & tasks_left & (tx < lens) & (q_at_tx < 4)

        go2 = task_done & is1
        go3 = task_done & (stage == 2)
        n1snap = jnp.where(go2, st["n_seeds"], st["n1s"])
        t_idx = jnp.where(go2, 0, t_idx)
        ovcap_now = go3 & (n_t2 > T2)
        if max_mem_intv > 0:
            stage_n = jnp.where(go2, 2, jnp.where(go3, 3, stage))
            x = jnp.where(go3, 0, st["x"])
            new_phase = phase
        else:
            stage_n = jnp.where(go2, 2, stage)
            x = st["x"]
            new_phase = jnp.where(go3, PH_CLAIM, phase)

        bump = task_amb & cont
        skip = task_amb & (~cont)
        t_idx = jnp.where(skip | task_past_end, t_idx + 1, t_idx)

        c0 = jnp.clip(q_at_tx, 0, 3)
        l2f_c0 = _pick_oh(L2f, c0)
        ik_new12 = jnp.stack([l2f_c0 + 1, _pick_oh(L2c, 3 - c0) + 1,
                              _pick_oh(L2f, c0 + 1) - l2f_c0, tx + 1])
        ik = jnp.where(task_init[None], ik_new12, st["ik"])
        x = jnp.where(task_init, tx, x)
        min_intv = jnp.where(task_init, jnp.maximum(tmi, 1), st["min_intv"])
        i = jnp.where(task_init, tx + 1, st["i"])
        n_curr = jnp.where(task_init, 0, st["n_curr"])
        new_phase = jnp.where(task_init, PH_FWD, new_phase)

        # ------------- stage-3 SCAN --------------------------------------
        qx3 = get_q(st["x"])
        p3_end = scan3 & (st["x"] >= lens)
        p3_start = scan3 & (st["x"] < lens) & (qx3 < 4)
        p3_skip = scan3 & (st["x"] < lens) & (qx3 >= 4)
        new_phase = jnp.where(p3_end, PH_CLAIM, new_phase)
        x = jnp.where(p3_skip, st["x"] + 1, x)
        c03 = jnp.clip(qx3, 0, 3)
        l2f_c03 = _pick_oh(L2f, c03)
        ik_new3 = jnp.stack([l2f_c03 + 1, _pick_oh(L2c, 3 - c03) + 1,
                             _pick_oh(L2f, c03 + 1) - l2f_c03,
                             jnp.zeros((B,), rdt)])
        ik = jnp.where(p3_start[None], ik_new3, ik)
        i = jnp.where(p3_start, st["x"] + 1, i)
        new_phase = jnp.where(p3_start, PH_P3, new_phase)

        # ------------- extension (FWD, BACK, or P3 lanes) -----------------
        qi = get_q(st["i"])
        jidx = jnp.where(st["rev"], st["n_prev"] - 1 - st["j"], st["j"])
        prevj = pick(st["buf"],
                     st["prev_slot"] * C + jnp.clip(jidx, 0, C - 1))
        back_c = jnp.where((st["i"] < 0) | (qi > 3), -1, qi)
        fwdlike = fwd | p3e
        fwd_need = fwdlike & (st["i"] < lens) & (qi < 4)
        back_need = back & (back_c >= 0) & (st["j"] < st["n_prev"])
        need = fwd_need | back_need

        which = jnp.where(fwdlike, fmc_id, fm_id)
        x_q = jnp.where(fwdlike, st["ik"][1], prevj[0])
        x_o = jnp.where(fwdlike, st["ik"][0], prevj[1])
        s_in = jnp.where(fwdlike, st["ik"][2], prevj[2])
        x_q = jnp.where(need, x_q, 1)
        s_in = jnp.where(need, s_in, 1)
        if _ablate_gather:
            new_xq = jnp.stack([x_q + 1, x_q + 2, x_q + 3, x_q + 4], -1)
            new_xo = jnp.stack([x_o + 1, x_o + 2, x_o + 3, x_o + 4], -1)
            sizes = jnp.stack([jnp.maximum(s_in - 1, 0)] * 4, -1)
        else:
            new_xq, new_xo, sizes = extend_sel(fm, which, x_q, x_o, s_in,
                                               back)
        fwd_c = 3 - jnp.clip(qi, 0, 3)
        c_sel = jnp.where(fwdlike, fwd_c, jnp.clip(back_c, 0, 3))
        ok_q = _pick_oh(new_xq, c_sel)
        ok_o = _pick_oh(new_xo, c_sel)
        ok_s = _pick_oh(sizes, c_sel)
        ok_x0 = jnp.where(fwdlike, ok_o, ok_q)
        ok_x1 = jnp.where(fwdlike, ok_q, ok_o)

        # ------------- FWD logic ------------------------------------------
        at_end = fwd & ((st["i"] >= lens) | (qi >= 4))
        size_changed = fwd & (st["i"] < lens) & (qi < 4) \
            & (ok_s != st["ik"][2])
        push_ik = at_end | size_changed
        curr_slot = 1 - st["prev_slot"]

        # ------------- BACK decisions -------------------------------------
        back_act = back & (st["j"] < st["n_prev"])
        keep = back_act & ((back_c < 0) | (ok_s < min_intv))
        emit = keep & (n_curr == 0) & \
            ((st["call_emits"] == 0) | (st["i"] + 1 < st["last_emit_start"]))
        start = st["i"] + 1
        end = prevj[3]
        store = emit & (end - start >= msl)

        # ------------- P3 decisions ---------------------------------------
        p3_need = p3e & (st["i"] < lens) & (qi < 4)
        p3_endlen = p3e & (st["i"] >= lens)
        p3_amb = p3e & (st["i"] < lens) & (qi >= 4)
        p3_hit = p3_need & (ok_s < max_mem_intv) & (st["i"] - st["x"] >= msl)
        p3_store = p3_hit & (ok_s > 0)

        # ------------- seed write (BACK-emit | P3-hit), + read-id plane ---
        can_store = st["n_seeds"] < S
        do_store = (store | p3_store) & can_store
        seed_rows = jnp.where(
            p3e[None],
            jnp.stack([st["x"], st["i"] + 1, ok_x0, ok_x1, ok_s,
                       rd.astype(rdt)]),
            jnp.stack([start, end, prevj[0], prevj[1], prevj[2],
                       rd.astype(rdt)]))
        seeds = write(st["seeds"], jnp.minimum(st["n_seeds"], S - 1),
                      seed_rows, do_store)
        n_seeds = jnp.where(do_store, st["n_seeds"] + 1, st["n_seeds"])
        call_emits = jnp.where(emit, st["call_emits"] + 1, st["call_emits"])
        last_emit_start = jnp.where(emit, start, st["last_emit_start"])

        # interval-list growth
        curr_last_s = pick(st["buf"][2:3],
                           curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))[0]
        append = back_act & (~keep) & ((n_curr == 0) | (ok_s != curr_last_s))
        app_rows = jnp.stack([ok_x0, ok_x1, ok_s, prevj[3]])
        wrow = jnp.where(fwd[None], st["ik"], app_rows)
        want_grow = push_ik | append
        grow = want_grow & (n_curr < C)
        buf = write(st["buf"], curr_slot * C + jnp.minimum(n_curr, C - 1),
                    wrow, grow)
        n_curr = jnp.where(grow, n_curr + 1, n_curr)

        # per-READ overflow: flag the current read id once per event class
        ov_now = ((store | p3_store) & ~can_store) | (want_grow & ~grow) \
            | ovcap_now
        ov_new = ov_now & ((st["ov_n"] == 0)
                           | (pick(st["ov_rd"][None],
                                   jnp.clip(st["ov_n"] - 1, 0, OVCAP - 1))[0]
                              != rd))
        ov_ok = st["ov_n"] < OVCAP
        ohv = (jnp.arange(OVCAP, dtype=jnp.int32)[None, :]
               == jnp.minimum(st["ov_n"], OVCAP - 1)[:, None]) \
            & (ov_new & ov_ok)[:, None]
        ov_rd = jnp.where(ohv, rd[:, None], st["ov_rd"])
        ov_n = jnp.where(ov_new & ov_ok, st["ov_n"] + 1, st["ov_n"])
        ov_spill = st["ov_spill"] | (ov_new & ~ov_ok).any()

        small = fwd & (st["i"] < lens) & (qi < 4) & (ok_s < min_intv)
        fwd_finish = at_end | (size_changed & small)
        adv = (fwd & (st["i"] < lens) & (qi < 4) & (~fwd_finish)) \
            | (p3_need & (~p3_hit))
        ik = jnp.where(adv[None],
                       jnp.stack([ok_x0, ok_x1, ok_s, st["i"] + 1]), ik)
        i = jnp.where(adv, st["i"] + 1, i)

        ret = jnp.where(
            fwd_finish,
            pick(buf[3:4], curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))[0],
            st["ret"])
        rev = st["rev"] | fwd_finish
        n_prev = jnp.where(fwd_finish, n_curr, st["n_prev"])
        n_curr = jnp.where(fwd_finish, 0, n_curr)
        i = jnp.where(fwd_finish, x - 1, i)
        j = jnp.where(fwd_finish, 0, st["j"])
        call_emits = jnp.where(fwd_finish, 0, call_emits)
        last_emit_start = jnp.where(fwd_finish, BIG, last_emit_start)
        new_phase = jnp.where(fwd_finish, PH_BACK, new_phase)

        j = jnp.where(back_act, j + 1, j)
        row_done = back & (j >= st["n_prev"])
        back_done = row_done & (n_curr == 0)
        back_next = row_done & (n_curr != 0)
        rev = rev & ~back_next
        prev_slot = jnp.where(back_next | fwd_finish, curr_slot,
                              st["prev_slot"])
        n_prev = jnp.where(back_next, n_curr, n_prev)
        n_curr = jnp.where(back_next, 0, n_curr)
        i = jnp.where(back_next, st["i"] - 1, i)
        j = jnp.where(back_next, 0, j)

        x1next = jnp.where(bump, tx + 1,
                           jnp.where(back_done & cont, ret, x1next))
        t_idx = jnp.where(back_done & (~cont), t_idx + 1, t_idx)
        new_phase = jnp.where(back_done, PH_SCAN, new_phase)

        x = jnp.where(p3_endlen, lens, x)
        x = jnp.where(p3_amb | p3_hit, st["i"] + 1, x)
        new_phase = jnp.where(p3_endlen | p3_amb | p3_hit, PH_SCAN, new_phase)

        return dict(phase=new_phase, stage=stage_n, rd=rd, q_cur=q_cur,
                    len_cur=len_cur, par_cur=par_cur, rbase=rbase,
                    next_ctr=next_ctr, t_idx=t_idx, x1next=x1next,
                    n1s=n1snap, x=x, min_intv=min_intv, i=i, ret=ret, ik=ik,
                    buf=buf, prev_slot=prev_slot, n_prev=n_prev,
                    n_curr=n_curr, j=j, call_emits=call_emits,
                    last_emit_start=last_emit_start, rev=rev, seeds=seeds,
                    n_seeds=n_seeds, ov_rd=ov_rd, ov_n=ov_n,
                    ov_spill=ov_spill, iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return (final["seeds"].transpose(1, 2, 0), final["n_seeds"],
            final["ov_rd"], final["ov_spill"], final["iters"],
            final["next_ctr"])


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width", "lanes",
                                   "C", "T2", "LOG_LEN", "W", "max_iters",
                                   "claim_every"))
def smem4_pool_batch(fm: FMPair, pool: jnp.ndarray,
                     min_seed_len: int, max_mem_intv: int,
                     split_len: int, split_width: int, lanes: int = 4096,
                     C: int = 32, T2: int = 16, LOG_LEN: int = 8192,
                     W: int = 256, max_iters: int = 500000,
                     claim_every: int = 1):
    """The pool machine with the seed ARCHIVE replaced by an iteration-
    indexed LOG (the round-3 HBM-traffic redesign).

    Measured on the honest 5 Mbp geometry (tools/seed_diag.py): pool
    iteration cost is t(B) ~ 37us + 22ns/lane, and the dominant per-lane
    term was the full [6, B, S] seed-archive rewrite every iteration
    (~26 MB of HBM traffic at B=4096, S=136 — while_loop carries written
    through a one-hot select are re-materialized whole). Two changes
    remove almost all of it:

    * Seeds append to a log [6, LOG_LEN, W]: each iteration the <=W lanes
      that store a seed are compacted (cumsum one-hot) into ONE [6, W] row
      written with lax.dynamic_update_slice at row `iters` — XLA updates
      the carry in place, so per-iteration traffic drops from O(B*S) to
      O(W). Empty slots carry read_id -1; the decode is a flatten +
      filter + the same (read, start, end) stable sort as before.
    * Pass-2 tasks are APPENDED EAGERLY into a [2, B, T2] buffer when a
      qualifying pass-1 seed is stored (end-start >= split_len, occ <=
      split_width — memchain.c:76-85), instead of re-deriving them every
      scan iteration from the seed planes with a [B, S] cumsum-rank scan.

    Capacity spills never truncate silently: more than W stores in one
    iteration or more than T2 tasks flag the READ for host rerun (ov_rd),
    and log exhaustion (iters == LOG_LEN) simply stops the loop — the
    unclaimed pool tail plus every mid-flight lane's read is reported for
    host rerun via (next_ctr, rd, phase).

    pool  [N, L+2] rows: [codes..., len, parent]
    Returns (log [6, LOG_LEN, W] (start, end, x0, x1, size, read_id|-1),
             ov_rd [B, 8], ov_spill bool, iters, next_ctr,
             rd [B], phase [B])."""
    N, Lp2 = pool.shape
    L = Lp2 - 2
    B = lanes
    rdt = fm.rdt
    msl = jnp.asarray(min_seed_len, jnp.int32)
    PH_P3, PH_CLAIM = 4, 5
    OVCAP = 8
    hard_iters = min(int(max_iters), int(LOG_LEN))

    # Query codes packed 8-per-int32 (one nibble each, 0-4): the per-lane
    # query lookup (3x per iteration) is a one-hot reduce over the minor
    # axis, and shrinking it L -> L/8 was measured as the single biggest
    # iteration cost — 3x [B,128] one-hots were ~45us/iter at B=2048 vs
    # ~0.3us for the VMEM-resident extend gather (tools/seed_diag.py).
    L16 = -(-L // 8)
    codes = pool[:, :L].astype(jnp.int32)
    pad_c = jnp.full((N, L16 * 8 - L), 4, jnp.int32)
    c8 = jnp.concatenate([codes, pad_c], axis=1).reshape(N, L16, 8)
    nib_sh = (jnp.arange(8, dtype=jnp.int32) << 2)
    pool_p = jnp.concatenate(
        [jnp.sum(c8 << nib_sh[None, None, :], axis=2, dtype=jnp.int32),
         pool[:, L:].astype(jnp.int32)], axis=1)        # [N, L16+2]

    # Every 2-D per-lane plane is stored B-MINOR ([N, B], not [B, N]): TPU
    # tiles the two minor dims to (8, 128), so a [B, N] layout with N in
    # 4-64 pads N up to 128 lanes and burns 128/N of every masked pass.
    # With B-minor all tiles are dense; the one-hot picks/writes run 2-32x
    # less VPU traffic (measured as the dominant iteration cost at
    # B >= 2048, tools/seed_diag.py).
    state = dict(
        phase=jnp.full((B,), PH_CLAIM, jnp.int32),
        stage=jnp.ones((B,), jnp.int32),
        rd=jnp.full((B,), -1, jnp.int32),
        q_cur=jnp.full((L16, B), 0x44444444, jnp.int32),
        len_cur=jnp.zeros((B,), rdt),
        par_cur=jnp.zeros((B,), jnp.int32),
        next_ctr=jnp.int32(0),
        t_idx=jnp.zeros((B,), jnp.int32),
        x1next=jnp.zeros((B,), rdt),
        tasks=jnp.zeros((2, T2, B), rdt),
        n_t2=jnp.zeros((B,), jnp.int32),
        x=jnp.zeros((B,), rdt),
        min_intv=jnp.ones((B,), rdt),
        i=jnp.zeros((B,), rdt),
        ret=jnp.zeros((B,), rdt),
        ik=jnp.zeros((4, B), rdt),
        buf=jnp.zeros((4, 2 * C, B), rdt),
        prev_slot=jnp.zeros((B,), jnp.int32),
        n_prev=jnp.zeros((B,), jnp.int32),
        n_curr=jnp.zeros((B,), jnp.int32),
        j=jnp.zeros((B,), jnp.int32),
        call_emits=jnp.zeros((B,), jnp.int32),
        last_emit_start=jnp.zeros((B,), rdt),
        rev=jnp.zeros((B,), jnp.bool_),
        log=jnp.full((6, LOG_LEN, W), -1, rdt),
        ov_rd=jnp.full((OVCAP, B), -1, jnp.int32),
        ov_n=jnp.zeros((B,), jnp.int32),
        ov_spill=jnp.bool_(False),
        iters=jnp.int32(0),
    )

    pick = _pick0
    write = _write0

    def cond(st):
        live = (st["phase"] != PH_DONE).any() | (st["next_ctr"] < N)
        return live & (st["iters"] < hard_iters)

    # Stagger the INITIAL claims into waves: at pool start every lane
    # would otherwise claim at iteration 0 and run phase-locked through
    # similar 100 bp reads, producing store bursts of ~45% of all lanes in
    # ONE iteration (measured) — far beyond any reasonable log width W.
    # After the first read per lane, completion times spread naturally
    # (steady-state p99 burst ~ B/40). Waves of <=128 lanes cost <STAG
    # idle iterations once per pool.
    STAG = max(16, B // 128)
    lane_idx = jnp.arange(B, dtype=jnp.int32)

    def step(st):
        # ------------- CLAIM: idle lanes pull the next pool read ----------
        idle = (st["phase"] == PH_DONE) | (st["phase"] == PH_CLAIM)

        def do_claim(op):
            q0, l0, p0, rd0, ph0, sg0, ti0, x10, nt0, nc0 = op
            claim_try = idle & (st["iters"] >= (lane_idx % STAG))
            order = jnp.cumsum(claim_try.astype(jnp.int32)) - 1
            ridx = nc0 + order
            claim = claim_try & (ridx < N)
            nc1 = jnp.minimum(nc0 + claim_try.astype(jnp.int32).sum(),
                              N).astype(jnp.int32)
            rows_cl = pool_p[jnp.where(claim, ridx, 0)].T  # ONE B-row gather
            return (jnp.where(claim[None, :], rows_cl[:L16], q0),
                    jnp.where(claim, rows_cl[L16].astype(rdt), l0),
                    jnp.where(claim, rows_cl[L16 + 1], p0),
                    jnp.where(claim, ridx, rd0),
                    jnp.where(claim, PH_SCAN,
                              jnp.where(idle, PH_DONE, ph0)),
                    jnp.where(claim, 1, sg0),
                    jnp.where(claim, 0, ti0),
                    jnp.where(claim, jnp.zeros((), x10.dtype), x10),
                    jnp.where(claim, 0, nt0),
                    nc1)

        ops = (st["q_cur"], st["len_cur"], st["par_cur"], st["rd"],
               st["phase"], st["stage"], st["t_idx"], st["x1next"],
               st["n_t2"], st["next_ctr"])
        if claim_every > 1:
            gate = (st["iters"] % claim_every) == 0
            (q_cur, len_cur, par_cur, rd, phase, stage, t_idx, x1next,
             n_t2, next_ctr) = jax.lax.cond(
                gate & idle.any(), do_claim, lambda op: op, ops)
        else:
            (q_cur, len_cur, par_cur, rd, phase, stage, t_idx, x1next,
             n_t2, next_ctr) = do_claim(ops)

        lens = len_cur
        fm_id = par_cur
        fmc_id = 1 - par_cur
        L2f = _sel2T(fm.L2, fm_id)                # [5, B]
        L2c = _sel2T(fm.L2, fmc_id)

        def get_q(i):
            ii = jnp.clip(i, 0, L - 1).astype(jnp.int32)
            w = _pick0(q_cur, ii >> 3)            # one-hot over L/8 words
            v = (w >> ((ii & 7) << 2)) & 15       # nibble-unpack
            return jnp.where((i < 0) | (i >= lens), 4, v).astype(rdt)

        scan12 = (phase == PH_SCAN) & (stage < 3)
        scan3 = (phase == PH_SCAN) & (stage == 3)
        fwd = phase == PH_FWD
        back = phase == PH_BACK
        p3e = phase == PH_P3

        # ------------- stage-1/2 SCAN: tasks come from the eager buffer ---
        is1 = stage == 1
        n_tasks_cur = jnp.where(is1, 1, jnp.minimum(n_t2, T2))
        tx = jnp.where(is1, x1next,
                       _pick0(st["tasks"][0], jnp.clip(t_idx, 0, T2 - 1)))
        tmi = jnp.where(is1, jnp.ones((B,), rdt),
                        _pick0(st["tasks"][1], jnp.clip(t_idx, 0, T2 - 1)))
        cont = is1
        tasks_left = t_idx < n_tasks_cur
        q_at_tx = get_q(tx)
        task_done = scan12 & (~tasks_left)
        task_past_end = scan12 & tasks_left & (tx >= lens)
        task_amb = scan12 & tasks_left & (tx < lens) & (q_at_tx >= 4)
        task_init = scan12 & tasks_left & (tx < lens) & (q_at_tx < 4)

        go2 = task_done & is1
        go3 = task_done & (stage == 2)
        t_idx = jnp.where(go2, 0, t_idx)
        if max_mem_intv > 0:
            stage_n = jnp.where(go2, 2, jnp.where(go3, 3, stage))
            x = jnp.where(go3, 0, st["x"])
            new_phase = phase
        else:
            stage_n = jnp.where(go2, 2, stage)
            x = st["x"]
            new_phase = jnp.where(go3, PH_CLAIM, phase)

        bump = task_amb & cont
        skip = task_amb & (~cont)
        t_idx = jnp.where(skip | task_past_end, t_idx + 1, t_idx)

        c0 = jnp.clip(q_at_tx, 0, 3)
        l2f_c0 = _pick0(L2f, c0)
        ik_new12 = jnp.stack([l2f_c0 + 1, _pick0(L2c, 3 - c0) + 1,
                              _pick0(L2f, c0 + 1) - l2f_c0, tx + 1])
        ik = jnp.where(task_init[None], ik_new12, st["ik"])
        x = jnp.where(task_init, tx, x)
        min_intv = jnp.where(task_init, jnp.maximum(tmi, 1), st["min_intv"])
        i = jnp.where(task_init, tx + 1, st["i"])
        n_curr = jnp.where(task_init, 0, st["n_curr"])
        new_phase = jnp.where(task_init, PH_FWD, new_phase)

        # ------------- stage-3 SCAN --------------------------------------
        qx3 = get_q(st["x"])
        p3_end = scan3 & (st["x"] >= lens)
        p3_start = scan3 & (st["x"] < lens) & (qx3 < 4)
        p3_skip = scan3 & (st["x"] < lens) & (qx3 >= 4)
        new_phase = jnp.where(p3_end, PH_CLAIM, new_phase)
        x = jnp.where(p3_skip, st["x"] + 1, x)
        c03 = jnp.clip(qx3, 0, 3)
        l2f_c03 = _pick0(L2f, c03)
        ik_new3 = jnp.stack([l2f_c03 + 1, _pick0(L2c, 3 - c03) + 1,
                             _pick0(L2f, c03 + 1) - l2f_c03,
                             jnp.zeros((B,), rdt)])
        ik = jnp.where(p3_start[None], ik_new3, ik)
        i = jnp.where(p3_start, st["x"] + 1, i)
        new_phase = jnp.where(p3_start, PH_P3, new_phase)

        # ------------- extension (FWD, BACK, or P3 lanes) -----------------
        qi = get_q(st["i"])
        jidx = jnp.where(st["rev"], st["n_prev"] - 1 - st["j"], st["j"])
        prevj = pick(st["buf"],
                     st["prev_slot"] * C + jnp.clip(jidx, 0, C - 1))
        back_c = jnp.where((st["i"] < 0) | (qi > 3), -1, qi)
        fwdlike = fwd | p3e
        fwd_need = fwdlike & (st["i"] < lens) & (qi < 4)
        back_need = back & (back_c >= 0) & (st["j"] < st["n_prev"])
        need = fwd_need | back_need

        which = jnp.where(fwdlike, fmc_id, fm_id)
        x_q = jnp.where(fwdlike, st["ik"][1], prevj[0])
        x_o = jnp.where(fwdlike, st["ik"][0], prevj[1])
        s_in = jnp.where(fwdlike, st["ik"][2], prevj[2])
        x_q = jnp.where(need, x_q, 1)
        s_in = jnp.where(need, s_in, 1)
        new_xq, new_xo, sizes = extend_selT(fm, which, x_q, x_o, s_in,
                                            back)
        fwd_c = 3 - jnp.clip(qi, 0, 3)
        c_sel = jnp.where(fwdlike, fwd_c, jnp.clip(back_c, 0, 3))
        ok_q = _pick0(new_xq, c_sel)
        ok_o = _pick0(new_xo, c_sel)
        ok_s = _pick0(sizes, c_sel)
        ok_x0 = jnp.where(fwdlike, ok_o, ok_q)
        ok_x1 = jnp.where(fwdlike, ok_q, ok_o)

        # ------------- FWD logic ------------------------------------------
        at_end = fwd & ((st["i"] >= lens) | (qi >= 4))
        size_changed = fwd & (st["i"] < lens) & (qi < 4) \
            & (ok_s != st["ik"][2])
        push_ik = at_end | size_changed
        curr_slot = 1 - st["prev_slot"]

        # ------------- BACK decisions -------------------------------------
        back_act = back & (st["j"] < st["n_prev"])
        keep = back_act & ((back_c < 0) | (ok_s < min_intv))
        emit = keep & (n_curr == 0) & \
            ((st["call_emits"] == 0) | (st["i"] + 1 < st["last_emit_start"]))
        start = st["i"] + 1
        end = prevj[3]
        store = emit & (end - start >= msl)

        # ------------- P3 decisions ---------------------------------------
        p3_need = p3e & (st["i"] < lens) & (qi < 4)
        p3_endlen = p3e & (st["i"] >= lens)
        p3_amb = p3e & (st["i"] < lens) & (qi >= 4)
        p3_hit = p3_need & (ok_s < max_mem_intv) & (st["i"] - st["x"] >= msl)
        p3_store = p3_hit & (ok_s > 0)

        # ------------- eager pass-2 task append (stage-1 stores only) -----
        qual = store & is1 & (end - start >= split_len) \
            & (prevj[2] <= split_width)
        can_t = n_t2 < T2
        task_rows = jnp.stack([(start + end) >> 1, prevj[2] + 1])
        tasks = write(st["tasks"], jnp.minimum(n_t2, T2 - 1), task_rows,
                      qual & can_t)
        n_t2 = jnp.where(qual & can_t, n_t2 + 1, n_t2)

        # ------------- seed write: compact into ONE log row ---------------
        do_store = store | p3_store
        seed_rows = jnp.where(
            p3e[None],
            jnp.stack([st["x"], st["i"] + 1, ok_x0, ok_x1, ok_s,
                       rd.astype(rdt)]),
            jnp.stack([start, end, prevj[0], prevj[1], prevj[2],
                       rd.astype(rdt)]))
        cs = jnp.cumsum(do_store.astype(jnp.int32))
        slotw = cs - 1
        w_ok = do_store & (slotw < W)
        ohw = (slotw[:, None] == jnp.arange(W, dtype=jnp.int32)[None, :]) \
            & w_ok[:, None]
        if fm.wide:
            # int64 values: masked-select reduce (the wide path is not the
            # throughput path)
            row6 = jnp.sum(jnp.where(ohw[None], seed_rows[:, :, None], 0),
                           axis=1)
        else:
            # compaction as an exact f32 matmul on the MXU: each (plane,
            # slot) output receives AT MOST ONE nonzero contribution (slot
            # ids are unique). Values are split into four 8-bit byte
            # planes: integers <= 255 are exact even in the MXU's bf16
            # multiply (default precision — 16-bit halves were NOT, the
            # rounding was observed on the real chip), and the f32
            # accumulator reassembles each int32 exactly. The naive
            # one-hot masked reduce materializes a [6, B, W] intermediate
            # (~100 MB at B=8192, W=512) and dominated the iteration.
            ohf = ohw.astype(jnp.float32)
            u = seed_rows.astype(jnp.uint32)
            row6 = jnp.zeros((6, W), jnp.uint32)
            for k in range(4):
                byt = ((u >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)
                row6 = row6 | (jax.lax.dot(byt, ohf)
                               .astype(jnp.uint32) << (8 * k))
            row6 = row6.astype(rdt)
        occ_w = jnp.arange(W, dtype=jnp.int32) < jnp.minimum(cs[-1], W)
        row6 = jnp.where(occ_w[None], row6, jnp.full_like(row6, -1))
        log = jax.lax.dynamic_update_slice(
            st["log"], row6[:, None, :], (jnp.int32(0), st["iters"],
                                          jnp.int32(0)))
        call_emits = jnp.where(emit, st["call_emits"] + 1, st["call_emits"])
        last_emit_start = jnp.where(emit, start, st["last_emit_start"])

        # interval-list growth
        curr_last_s = _pick0(st["buf"][2],
                             curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1))
        append = back_act & (~keep) & ((n_curr == 0) | (ok_s != curr_last_s))
        app_rows = jnp.stack([ok_x0, ok_x1, ok_s, prevj[3]])
        wrow = jnp.where(fwd[None], st["ik"], app_rows)
        want_grow = push_ik | append
        grow = want_grow & (n_curr < C)
        buf = write(st["buf"], curr_slot * C + jnp.minimum(n_curr, C - 1),
                    wrow, grow)
        n_curr = jnp.where(grow, n_curr + 1, n_curr)

        # per-READ overflow: flag the current read id once per event class
        ov_now = (qual & ~can_t) | (do_store & ~w_ok) | (want_grow & ~grow)
        ov_new = ov_now & ((st["ov_n"] == 0)
                           | (_pick0(st["ov_rd"],
                                     jnp.clip(st["ov_n"] - 1, 0, OVCAP - 1))
                              != rd))
        ov_ok = st["ov_n"] < OVCAP
        ohv = (jnp.arange(OVCAP, dtype=jnp.int32)[:, None]
               == jnp.minimum(st["ov_n"], OVCAP - 1)[None, :]) \
            & (ov_new & ov_ok)[None, :]
        ov_rd = jnp.where(ohv, rd[None, :], st["ov_rd"])
        ov_n = jnp.where(ov_new & ov_ok, st["ov_n"] + 1, st["ov_n"])
        ov_spill = st["ov_spill"] | (ov_new & ~ov_ok).any()

        small = fwd & (st["i"] < lens) & (qi < 4) & (ok_s < min_intv)
        fwd_finish = at_end | (size_changed & small)
        adv = (fwd & (st["i"] < lens) & (qi < 4) & (~fwd_finish)) \
            | (p3_need & (~p3_hit))
        ik = jnp.where(adv[None],
                       jnp.stack([ok_x0, ok_x1, ok_s, st["i"] + 1]), ik)
        i = jnp.where(adv, st["i"] + 1, i)

        ret = jnp.where(
            fwd_finish,
            _pick0(buf[3], curr_slot * C + jnp.clip(n_curr - 1, 0, C - 1)),
            st["ret"])
        rev = st["rev"] | fwd_finish
        n_prev = jnp.where(fwd_finish, n_curr, st["n_prev"])
        n_curr = jnp.where(fwd_finish, 0, n_curr)
        i = jnp.where(fwd_finish, x - 1, i)
        j = jnp.where(fwd_finish, 0, st["j"])
        call_emits = jnp.where(fwd_finish, 0, call_emits)
        last_emit_start = jnp.where(fwd_finish, BIG, last_emit_start)
        new_phase = jnp.where(fwd_finish, PH_BACK, new_phase)

        j = jnp.where(back_act, j + 1, j)
        row_done = back & (j >= st["n_prev"])
        back_done = row_done & (n_curr == 0)
        back_next = row_done & (n_curr != 0)
        rev = rev & ~back_next
        prev_slot = jnp.where(back_next | fwd_finish, curr_slot,
                              st["prev_slot"])
        n_prev = jnp.where(back_next, n_curr, n_prev)
        n_curr = jnp.where(back_next, 0, n_curr)
        i = jnp.where(back_next, st["i"] - 1, i)
        j = jnp.where(back_next, 0, j)

        x1next = jnp.where(bump, tx + 1,
                           jnp.where(back_done & cont, ret, x1next))
        t_idx = jnp.where(back_done & (~cont), t_idx + 1, t_idx)
        new_phase = jnp.where(back_done, PH_SCAN, new_phase)

        x = jnp.where(p3_endlen, lens, x)
        x = jnp.where(p3_amb | p3_hit, st["i"] + 1, x)
        new_phase = jnp.where(p3_endlen | p3_amb | p3_hit, PH_SCAN, new_phase)

        return dict(phase=new_phase, stage=stage_n, rd=rd, q_cur=q_cur,
                    len_cur=len_cur, par_cur=par_cur, next_ctr=next_ctr,
                    t_idx=t_idx, x1next=x1next, tasks=tasks, n_t2=n_t2,
                    x=x, min_intv=min_intv, i=i, ret=ret, ik=ik,
                    buf=buf, prev_slot=prev_slot, n_prev=n_prev,
                    n_curr=n_curr, j=j, call_emits=call_emits,
                    last_emit_start=last_emit_start, rev=rev, log=log,
                    ov_rd=ov_rd, ov_n=ov_n, ov_spill=ov_spill,
                    iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return (final["log"], final["ov_rd"], final["ov_spill"],
            final["iters"], final["next_ctr"], final["rd"], final["phase"])


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width", "lanes",
                                   "C", "T2", "LOG_LEN", "W", "claim_every"))
def _collect_sm_log(fm: FMPair, pool, min_seed_len: int, max_mem_intv: int,
                    split_len: int, split_width: int, lanes: int,
                    C: int, T2: int, LOG_LEN: int, W: int,
                    claim_every: int = 1):
    """Log-machine mem_collect_intv: smem4 seeder + the same device-side
    (read, start, end) stable sort as _collect_sm_pool, decoded from the
    iteration log instead of per-lane archives."""
    N = pool.shape[0]
    log, ov_rd, ov_spill, iters, next_ctr, rd_f, ph_f = smem4_pool_batch(
        fm, pool, min_seed_len, max_mem_intv, split_len, split_width,
        lanes=lanes, C=C, T2=T2, LOG_LEN=LOG_LEN, W=W,
        claim_every=claim_every)
    cap = N * 24
    rid = log[5].reshape(-1)
    ridkey = jnp.where(rid >= 0, rid.astype(jnp.int32), BIG)
    cols = [log[c].reshape(-1) for c in range(5)]
    sorted_ = jax.lax.sort([ridkey, cols[0], cols[1], cols[2],
                            cols[3], cols[4]], num_keys=3, is_stable=True)
    rid_sorted = sorted_[0][:cap]
    packed = jnp.stack(sorted_[1:6], axis=-1)[:cap]
    total = (rid >= 0).sum()
    # forced exit (log exhausted): mid-flight lanes' reads rerun on host
    unfinished = jnp.where(ph_f != PH_DONE, rd_f, -1)
    return (packed, rid_sorted, total, ov_rd, ov_spill, next_ctr,
            unfinished)


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width", "lanes",
                                   "C", "S", "T2", "claim_every"))
def _collect_sm_pool(fm: FMPair, pool, min_seed_len: int, max_mem_intv: int,
                     split_len: int, split_width: int, lanes: int,
                     C: int, S: int, T2: int, claim_every: int = 1):
    """Pool-machine mem_collect_intv: refill seeder + device-side compaction
    and the reference-order stable sort keyed by READ id."""
    N = pool.shape[0]
    B = lanes
    seeds, n_seeds, ov_rd, ov_spill, _, next_ctr = smem3_pool_batch(
        fm, pool, min_seed_len, max_mem_intv,
        split_len, split_width, lanes=lanes, C=C, S=S, T2=T2,
        claim_every=claim_every)
    cap = N * 24
    S_ = seeds.shape[1]
    slot_all = jnp.arange(S_, dtype=jnp.int32)[None, :]
    valid = slot_all < n_seeds[:, None]
    ridkey = jnp.where(valid, seeds[:, :, 5].astype(jnp.int32), BIG)
    cols = [seeds[:, :, c].reshape(-1) for c in range(5)]
    sorted_ = jax.lax.sort([ridkey.reshape(-1), cols[0], cols[1], cols[2],
                            cols[3], cols[4]], num_keys=3, is_stable=True)
    rid_sorted = sorted_[0][:cap]
    packed = jnp.stack(sorted_[1:6], axis=-1)[:cap]
    total = valid.sum()
    return packed, rid_sorted, total, ov_rd, ov_spill, next_ctr


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width",
                                   "C", "S", "T2"))
def _collect_sm_merged(fm: FMPair, q, lens, parents,
                       min_seed_len: int, max_mem_intv: int,
                       split_len: int, split_width: int,
                       C: int, S: int, T2: int):
    """Merged-machine mem_collect_intv: ONE while_loop, then the device-side
    compaction + reference-order stable sort (see _collect_sm_fused)."""
    B = q.shape[0]
    seeds, n_seeds, ov, _ = smem3_batch(
        fm, q, lens, parents, min_seed_len, max_mem_intv,
        split_len, split_width, C=C, S=S, T2=T2)
    cap = B * 24
    slot_all = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = slot_all < n_seeds[:, None]
    laneg = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, S))
    lanekey = jnp.where(valid, laneg, BIG).reshape(-1)
    cols = [seeds[:, :, c].reshape(-1) for c in range(5)]
    sorted_ = jax.lax.sort([lanekey, cols[0], cols[1], cols[2], cols[3],
                            cols[4]], num_keys=3, is_stable=True)
    packed = jnp.stack(sorted_[1:6], axis=-1)[:cap]
    return packed, n_seeds, ov, seeds


def _rank_ctx(fm: FMPair):
    """x64 tracing context for wide indexes (int64 ranks survive jit);
    a no-op for narrow ones."""
    if fm.wide:
        return jax.enable_x64(True)
    import contextlib
    return contextlib.nullcontext()


def _fm_jit(fm: FMPair, key, build):
    """jit with the FMPair captured as a compile-time CONSTANT instead of a
    call argument, cached on the fm instance.

    Passing the multi-hundred-MB fm pytree as a jit argument costs per-call
    overhead proportional to the argument bytes on the tunneled runtime:
    measured at the 50 Mbp honest geometry, the production pool collection
    ran 630 reads/s with fm-as-argument vs 11,473 reads/s with fm closed
    over (identical executable math). Closure capture uploads the tables
    once at compile; per-batch inputs stay arguments so shapes reuse the
    same executable. `key` must cover every static parameter of `build`.

    On the CPU backend the trade inverts: arguments are zero-copy (no
    dispatch cliff to dodge) while closure capture embeds the tables as
    lowering CONSTANTS — at human scale (9.3 GB fused tab) XLA:CPU's
    constant handling is both slow and unsafe, so fm stays an argument
    there."""
    cache = getattr(fm, "_jit_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(fm, "_jit_cache", cache)
    # the split-tab escape hatch changes traced gather structure (_tab_row)
    key = (key, bool(os.environ.get("BISCUIT_TPU_SPLIT_TAB")))
    fn = cache.get(key)
    if fn is None:
        if jax.default_backend() == "cpu":
            jfn = jax.jit(lambda f, *args: build(f)(*args))
            fn = lambda *args, _j=jfn: _j(fm, *args)
        else:
            fn = jax.jit(build(fm))
        cache[key] = fn
    return fn


def sa_batch_np(fm: FMPair, which: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Host-facing batched SA lookup: handles the wide x64 context and rank
    dtype so callers stay dtype-agnostic. Returns a numpy array."""
    with _rank_ctx(fm):
        kj = jnp.asarray(np.asarray(k).astype(
            np.int64 if fm.wide else np.int32))
        wj = jnp.asarray(np.asarray(which, np.int32))
        fn = _fm_jit(fm, ("sa_batch",),
                     lambda f: lambda w, kk: sa_batch(f, w, kk))
        return np.asarray(fn(wj, kj))


@jax.jit
def sa_batch(fm: FMPair, which: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Batched SA lookup (bwt_sa walk) with per-lane strand selection.
    The fused invPsi needs ONE tab-row gather per step: the BWT char and its
    occ rank come from the same 64-base block row."""

    def inv_psi(which, kk):
        prim = _sel2(fm.primary, which)
        j = kk - (kk >= prim).astype(jnp.int32)
        row = _tab_row(fm, which, j >> 6)
        wbase = fm.tab.shape[-1] - 4  # BWT words: cols 4.. (8.. on wide rows)
        w = _pick_oh(row, wbase + ((j >> 4) & 3).astype(jnp.int32))
        c = ((w >> (((~j & 15) << 1).astype(jnp.uint32))) & 3).astype(jnp.int32)
        o4 = _occ4_from_row(row, j)
        occs = _pick_oh(o4, c)
        L2w = _sel2(fm.L2, which)
        return jnp.where(kk == prim, 0, _pick_oh(L2w, c) + occs)

    def body(state):
        kk, add, act = state
        k2 = inv_psi(which, kk)
        kk = jnp.where(act, k2, kk)
        add = add + act.astype(jnp.int32)
        act = (kk & (fm.sa_intv - 1)) != 0
        return kk, add, act

    def cond(state):
        return state[2].any()

    add0 = jnp.zeros_like(k)
    act0 = (k & (fm.sa_intv - 1)) != 0
    kf, add, _ = jax.lax.while_loop(cond, body, (k, add0, act0))
    sa_shift = fm.sa_intv.bit_length() - 1
    if fm.shard_axis is not None:
        # sharded samples: local gather + masked-zero + psum (see _tab_row)
        S = fm.sa_samples.shape[0]
        g = which.astype(fm.rdt) * fm.n_sa_global \
            + (kf >> sa_shift).astype(fm.rdt)
        start = jax.lax.axis_index(fm.shard_axis).astype(fm.rdt) * S
        loc = g - start
        ok = (loc >= 0) & (loc < S)
        v = fm.sa_samples[jnp.clip(loc, 0, S - 1).astype(jnp.int32)]
        return add + jax.lax.psum(jnp.where(ok, v, 0), fm.shard_axis)
    n_sa = fm.sa_samples.shape[1]
    return add + fm.sa_samples.reshape(-1)[which * n_sa + (kf >> sa_shift)]


def _pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


@partial(jax.jit, static_argnames=("min_seed_len", "max_mem_intv",
                                   "split_len", "split_width",
                                   "C", "S", "S3", "T2"))
def _collect_sm_fused(fm: FMPair, q, lens, parents,
                      min_seed_len: int, max_mem_intv: int,
                      split_len: int, split_width: int,
                      C: int, S: int, S3: int, T2: int):
    """All three mem_collect_intv passes in ONE device program (one dispatch
    + one transfer round trip — dispatch latency dominates on tunneled TPU
    rigs). Pass-2 re-seed tasks are derived from pass-1 output on device."""
    B = q.shape[0]
    msl = jnp.full((B,), min_seed_len, jnp.int32)
    tasks1 = jnp.zeros((B, 1, 3), jnp.int32) \
        .at[:, 0, 1].set(1).at[:, 0, 2].set(1)
    s1, n1, ov1, _ = smem_batch(fm, q, lens, parents, tasks1,
                                jnp.ones((B,), jnp.int32), msl, C=C, S=S)

    # pass-2 tasks (memchain.c:76-85): midpoint re-seed of long
    # low-occurrence pass-1 SMEMs with min_intv = occ + 1
    slot = jnp.arange(S, dtype=jnp.int32)[None, :]
    m2 = (slot < n1[:, None]) \
        & (s1[:, :, 1] - s1[:, :, 0] >= split_len) \
        & (s1[:, :, 4] <= split_width)
    n_t2 = m2.sum(axis=1).astype(jnp.int32)
    order2 = jnp.argsort(~m2, axis=1, stable=True)[:, :T2]
    rows2 = jnp.take_along_axis(s1, order2[:, :, None], axis=1)  # [B, T2, 5]
    tasks2 = jnp.stack([(rows2[:, :, 0] + rows2[:, :, 1]) >> 1,
                        rows2[:, :, 4] + 1,
                        jnp.zeros((B, T2), jnp.int32)], axis=-1)
    ov2cap = n_t2 > T2
    s2, n2, ov2, _ = smem_batch(fm, q, lens, parents, tasks2,
                                jnp.minimum(n_t2, T2), msl, C=C, S=S)

    if max_mem_intv > 0:
        s3, n3, ov3 = seed_strategy_batch(fm, q, lens, parents,
                                          min_seed_len, max_mem_intv, S=S3)
    else:
        s3 = jnp.zeros((B, S3, 5), fm.rdt)
        n3 = jnp.zeros((B,), jnp.int32)
        ov3 = jnp.zeros((B,), jnp.bool_)
    ov = ov1 | ov2 | ov2cap | ov3

    # device-side compaction + final reference-order sort: transfer only the
    # valid rows (tunneled D2H costs ~100 ms/MB; the padded per-pass arrays
    # are ~5 MB, the compacted output ~150 KB). One stable 3-key lax.sort
    # orders by (lane, start, end) with pass-insertion tie order preserved.
    cap = B * 24
    allr = jnp.concatenate([s1, s2, s3], axis=1)      # [B, Stot, 5]
    Stot = allr.shape[1]
    slot_all = jnp.arange(Stot, dtype=jnp.int32)[None, :]
    valid = (slot_all < n1[:, None]) \
        | ((slot_all >= S) & (slot_all < S + n2[:, None])) \
        | ((slot_all >= 2 * S) & (slot_all < 2 * S + n3[:, None]))
    laneg = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                             (B, Stot))
    lanekey = jnp.where(valid, laneg, BIG).reshape(-1)
    cols = [allr[:, :, c].reshape(-1) for c in range(5)]
    sorted_ = jax.lax.sort([lanekey, cols[0], cols[1], cols[2], cols[3],
                            cols[4]], num_keys=3, is_stable=True)
    packed = jnp.stack(sorted_[1:6], axis=-1)[:cap]   # [cap, 5]
    n_all = n1 + n2 + n3
    return packed, n_all, ov, s1, n1, s2, n2, s3, n3


def _collect_flat_index_sharded(fm: FMPair, reads, lens, parents, opt,
                                n_idx: int):
    """collect_intv_flat_sm with the FM-INDEX SHARDED over the visible
    device mesh (BISCUIT_TPU_INDEX_SHARD=n_idx): fused tables + SA
    samples partition over an `idx` axis, read pools over `dp`
    (n_dp = n_devices // n_idx), occ4/invPsi gathers psum-routed to the
    owning shard. The production path for genomes whose tables exceed
    one chip's HBM (SURVEY §2d; SCALING.md round-5 budget table). Same
    (lane_of, rows, overflow) contract as collect_intv_flat_sm; output
    is bit-identical to the replicated log machine."""
    import jax as _jax
    from ..parallel.mesh import make_mesh2, sharded_index_seed_fn

    B, L = reads.shape
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    ndev = len(_jax.devices())
    assert 1 < n_idx <= ndev, \
        f"BISCUIT_TPU_INDEX_SHARD={n_idx} needs that many devices (have {ndev})"
    n_dp = max(1, ndev // n_idx)
    N_pad = -(-B // n_dp) * n_dp
    N_l = N_pad // n_dp
    C_m = max(32, min(160, L // 4))
    lanes = min(int(os.environ.get("BISCUIT_TPU_SEED_LANES", "4096")),
                _pow2(max(N_l, 2)))
    LOG_LEN = -(-max(2048, (N_l // lanes + 2) * 1100) // 1024) * 1024
    W = min(256, lanes)
    pool = np.full((N_pad, L + 2), 4, np.int32)
    pool[:B, :L] = reads
    pool[:B, L] = lens
    pool[:B, L + 1] = parents
    pool[B:, L] = 0

    cache = getattr(fm, "_jit_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(fm, "_jit_cache", cache)
    sp = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
          int(opt.split_width))
    key = ("idx_shard", n_dp, n_idx, lanes, C_m, LOG_LEN, W) + sp
    fn = cache.get(key)
    if fn is None:
        mesh = make_mesh2(n_dp, n_idx)
        fn = sharded_index_seed_fn(mesh, fm, *sp, seeder="log",
                                   lanes=lanes, C=C_m, T2=16,
                                   LOG_LEN=LOG_LEN, W=W)
        cache[key] = fn
    packed, rid, ov_rd, unfinished, next_ctr, spill = \
        (np.asarray(x) for x in fn(pool))

    cap = N_l * 24
    ov = np.zeros(B, bool)
    rid_parts, row_parts = [], []
    for s in range(n_dp):
        rs = rid[s * cap:(s + 1) * cap]
        t = int((rs < BIG).sum())
        rid_parts.append(rs[:t].astype(np.int64) + s * N_l)
        row_parts.append(packed[s * cap:s * cap + t])
        ovr = ov_rd[s * lanes:(s + 1) * lanes].reshape(-1)
        ok = (ovr >= 0) & (ovr < N_l)
        ov_ids = ovr[ok] + s * N_l
        ov[ov_ids[ov_ids < B]] = True
        unf = unfinished[s * lanes:(s + 1) * lanes]
        ok = (unf >= 0) & (unf < N_l)
        unf_ids = unf[ok] + s * N_l
        ov[unf_ids[unf_ids < B]] = True
        nc = int(next_ctr[s])
        if nc < N_l:            # log exhausted: unclaimed tail reruns
            lo = min(s * N_l + nc, B)
            hi = min((s + 1) * N_l, B)
            ov[lo:hi] = True
        if int(spill[s]):       # whole-shard spill: rerun its reads
            ov[min(s * N_l, B):min((s + 1) * N_l, B)] = True
    # shard s owns the contiguous read range [s*N_l, (s+1)*N_l) and each
    # per-shard stream is already (read, start, end) stable-sorted, so
    # concatenation in shard order IS the global reference order
    rid_all = np.concatenate(rid_parts) if rid_parts else \
        np.zeros(0, np.int64)
    rows_all = np.concatenate(row_parts) if row_parts else \
        np.zeros((0, 5), np.int32)
    keep = rid_all < B          # drop pool padding (len-0 reads emit none)
    return (rid_all[keep].astype(np.int32), rows_all[keep], ov)


def collect_intv_flat_sm(fm: FMPair, reads, lens, parents, opt,
                         C: int = 160, S: int = 96, S3: int = 48):
    """Device mem_collect_intv via the lockstep state machine, flat output.

    All three passes run as smem_batch / seed_strategy_batch kernels; the
    host side is fully vectorized numpy (pass-2 task derivation, lane
    compaction, final reference-order sort) — no per-read Python loops.
    Returns (lane_of [M] int32, rows [M, 5] int32 (start, end, x0, x1, s),
    overflow [B] bool), ordered by (lane, start<<32|end, pass-insertion) —
    the host collect_intv's stable ks_introsort-key order.

    BISCUIT_TPU_INDEX_SHARD=n (n > 1): the FM-index shards over the
    visible device mesh instead of replicating (big-genome HBM capacity;
    see _collect_flat_index_sharded)."""
    B, L = reads.shape
    nshard = int(os.environ.get("BISCUIT_TPU_INDEX_SHARD", "0"))
    if nshard > 1:
        return _collect_flat_index_sharded(fm, reads, lens, parents, opt,
                                           nshard)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    # default log: r4 chip sweep at N=32768/lanes=4096 (post dispatch-cliff
    # fix) — 5 Mbp: log 45.1k vs pool 44.8k reads/s compute-only (parity);
    # 50 Mbp: log 27.2k vs pool 23.0k (the iteration-indexed log amortizes
    # the gather-bound regime's archive rewrites).  The r3 numbers that
    # favored pool (25.0k vs 22.4k) predate the pool-depth/dispatch fixes.
    mode = os.environ.get("BISCUIT_TPU_SEEDER", "log")
    merged = mode != "fused"

    if mode == "log":
        # log machine: seeds stream to an iteration-indexed log instead of
        # per-lane archives (smem4_pool_batch docstring has the economics)
        C_m = max(32, min(160, L // 4))
        lanes = min(int(os.environ.get("BISCUIT_TPU_SEED_LANES", "4096")),
                    _pow2(B))
        # log rows ~ measured iteration count (~850 lane-steps/read at
        # L=100) with ~2x headroom (forced exit is safe: the tail reruns
        # on the host); W bounds same-iteration store bursts — claims
        # phase-lock similar reads, so bursts reach several times the
        # mean store rate (measured: W=lanes/16 flagged ~5-10% of reads)
        LOG_LEN = -(-max(2048, (B // lanes + 2) * 1100) // 1024) * 1024
        W = 256  # staggered claims keep same-iteration bursts ~B/40
        pool = np.full((B, L + 2), 4, np.int32)
        pool[:, :L] = reads
        pool[:, L] = lens
        pool[:, L + 1] = parents
        with _rank_ctx(fm):
            ce = int(os.environ.get("BISCUIT_TPU_CLAIM_EVERY", "1"))
            sp = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
                  int(opt.split_width), lanes, C_m, 16, LOG_LEN, W, ce)
            out = _fm_jit(fm, ("log",) + sp, lambda f: lambda p:
                          _collect_sm_log(f, p, *sp[:4], lanes=sp[4],
                                          C=sp[5], T2=sp[6], LOG_LEN=sp[7],
                                          W=sp[8], claim_every=sp[9])
                          )(jnp.asarray(pool))
        (packed, rid_sorted, total_j, ov_rd, ov_spill, next_ctr,
         unfinished) = out
        total = int(np.asarray(total_j))
        if bool(np.asarray(ov_spill)) or total > packed.shape[0]:
            return (np.zeros(0, np.int32), np.zeros((0, 5), np.int32),
                    np.ones(B, bool))
        rid = np.asarray(rid_sorted)[:total]
        rows = np.asarray(packed)[:total]
        ov = np.zeros(B, bool)
        ovr = np.asarray(ov_rd).reshape(-1)
        ov[ovr[(ovr >= 0) & (ovr < B)]] = True
        unf = np.asarray(unfinished)
        ov[unf[(unf >= 0) & (unf < B)]] = True
        nc = int(np.asarray(next_ctr))
        if nc < B:
            ov[nc:] = True      # log exhausted: unclaimed tail reruns
        return rid.astype(np.int32), rows, ov

    if mode == "pool":
        # refill machine: B persistent lanes drain the read pool
        C_m = max(32, min(160, L // 4))
        # lane width: measured on the v5e chip (tpu_seed_sweep.json +
        # N=8192 follow-up) throughput keeps rising with lane count -
        # 1024: 39.6k, 2048: 57.5k, 4096: 69.6k reads/s - the wider batch
        # amortizes the per-iteration fixed cost; claim gating was a wash
        lanes = min(int(os.environ.get("BISCUIT_TPU_SEED_LANES", "4096")),
                    _pow2(B))
        S_m = max(64, min(1024, 24 * max(1, B // lanes) + 40))
        pool = np.full((B, L + 2), 4, np.int32)
        pool[:, :L] = reads
        pool[:, L] = lens
        pool[:, L + 1] = parents
        with _rank_ctx(fm):
            ce = int(os.environ.get("BISCUIT_TPU_CLAIM_EVERY", "1"))
            sp = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
                  int(opt.split_width), lanes, C_m, S_m, 16, ce)
            out = _fm_jit(fm, ("pool",) + sp, lambda f: lambda p:
                          _collect_sm_pool(f, p, *sp[:4], lanes=sp[4],
                                           C=sp[5], S=sp[6], T2=sp[7],
                                           claim_every=sp[8])
                          )(jnp.asarray(pool))
        packed, rid_sorted, total_j, ov_rd, ov_spill, next_ctr = out
        total = int(np.asarray(total_j))
        if bool(np.asarray(ov_spill)) or total > packed.shape[0]:
            # overflow-id list or output cap spilled: rerun everything on
            # the host rather than risk consuming truncated rows
            return (np.zeros(0, np.int32), np.zeros((0, 5), np.int32),
                    np.ones(B, bool))
        rid = np.asarray(rid_sorted)[:total]
        rows = np.asarray(packed)[:total]
        ov = np.zeros(B, bool)
        ovr = np.asarray(ov_rd).reshape(-1)
        ov[ovr[(ovr >= 0) & (ovr < B)]] = True
        nc = int(np.asarray(next_ctr))
        if nc < B:
            ov[nc:] = True      # every lane filled up: unclaimed tail reruns
        return rid.astype(np.int32), rows, ov

    with _rank_ctx(fm):
        q = jnp.asarray(reads, dtype=jnp.int32)
        lens_j = jnp.asarray(lens, dtype=jnp.int32)
        par_j = jnp.asarray(parents, dtype=jnp.int32)
        if merged:
            # tight capacities: the interval list and seed buffer planes are
            # rewritten every iteration, so their width is pure HBM traffic.
            # Measured on 0-30% error reads: max 8 seeds, C=32 never spills;
            # both scale with read length for long-read safety, and any
            # spill flags `overflow` -> host rerun (never silent).
            C_m = max(32, min(160, L // 4))
            S_m = max(64, min(240, L))
            sp = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
                  int(opt.split_width), C_m, S_m, 16)
            out = _fm_jit(fm, ("merged",) + sp, lambda f: lambda qq, ll, pp:
                          _collect_sm_merged(f, qq, ll, pp, *sp[:4],
                                             C=sp[4], S=sp[5], T2=sp[6])
                          )(q, lens_j, par_j)
        else:
            sp = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
                  int(opt.split_width), C, S, S3, 16)
            out = _fm_jit(fm, ("fused",) + sp, lambda f: lambda qq, ll, pp:
                          _collect_sm_fused(f, qq, ll, pp, *sp[:4],
                                            sp[4], sp[5], sp[6], sp[7])
                          )(q, lens_j, par_j)
    # transfers are lazy: only the compacted output is pulled unless the
    # global cap spilled (then the padded per-lane arrays are fetched)
    n_all = np.asarray(out[1])
    ov = np.asarray(out[2])
    total = int(n_all.sum())
    if total <= out[0].shape[0]:
        rows = np.asarray(out[0])[:total]
        lane_of = np.repeat(np.arange(B, dtype=np.int32), n_all)
        return lane_of, rows, ov
    # rare spill: merge on host from the full per-lane arrays
    if merged:
        parts = ((np.asarray(out[3]), n_all),)
    else:
        s1, n1, s2, n2, s3, n3 = (np.asarray(a) for a in out[3:])
        parts = ((s1, n1), (s2, n2), (s3, n3))
    parts_lane, parts_rows = [], []
    for sx, nx in parts:
        mx = np.arange(sx.shape[1])[None, :] < nx[:, None]
        lx, kx = np.nonzero(mx)
        parts_lane.append(lx.astype(np.int32))
        parts_rows.append(sx[lx, kx])
    lane_of = np.concatenate(parts_lane)
    rows = np.concatenate(parts_rows).astype(np.int32, copy=False)
    order = np.lexsort((rows[:, 1], rows[:, 0], lane_of))
    return lane_of[order], rows[order], ov


def sm_compute_closure(fm: FMPair, pool: np.ndarray, opt):
    """Zero-arg closure running the PRODUCTION seeding machine (selected by
    BISCUIT_TPU_SEEDER, same parameter derivation as collect_intv_flat_sm)
    with device-resident input, returning device arrays only.  Used for
    compute-only benchmarking (tools/tpu_regress.py, bench.py): transfers
    excluded, dispatch amortized by the caller's slope timer.
    Returns (run_fn, mode_name)."""
    B = pool.shape[0]
    L = pool.shape[1] - 2
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    mode = os.environ.get("BISCUIT_TPU_SEEDER", "log")
    pj = jnp.asarray(pool)
    ce = int(os.environ.get("BISCUIT_TPU_CLAIM_EVERY", "1"))
    C_m = max(32, min(160, L // 4))
    lanes = min(int(os.environ.get("BISCUIT_TPU_SEED_LANES", "4096")),
                _pow2(B))
    sp4 = (int(opt.min_seed_len), int(opt.max_mem_intv), split_len,
           int(opt.split_width))
    if mode == "log":
        LOG_LEN = -(-max(2048, (B // lanes + 2) * 1100) // 1024) * 1024
        W = 256
        fn = _fm_jit(fm, ("log",) + sp4 + (lanes, C_m, 16, LOG_LEN, W, ce),
                     lambda f: lambda p:
                     _collect_sm_log(f, p, *sp4, lanes=lanes, C=C_m, T2=16,
                                     LOG_LEN=LOG_LEN, W=W, claim_every=ce)[0])
    else:
        # only "log" and "pool" have compute-only closures; report the
        # machine that actually runs so tpu_regress/bench labels stay honest
        mode = "pool"
        S_m = max(64, min(1024, 24 * max(1, B // lanes) + 40))
        fn = _fm_jit(fm, ("pool",) + sp4 + (lanes, C_m, S_m, 16, ce),
                     lambda f: lambda p:
                     _collect_sm_pool(f, p, *sp4, lanes=lanes, C=C_m, S=S_m,
                                      T2=16, claim_every=ce)[0])

    def run():
        with _rank_ctx(fm):
            return fn(pj)
    return run, mode


def collect_intv_batch(fm: FMPair, reads, lens, parents, opt,
                       C: int = 160, S: int = 96):
    """Device-backed mem_collect_intv over a batch (state-machine kernels).
    Returns (list of per-read seed tuples (start, end, x0, x1, s) in the
    reference's final order, overflow mask)."""
    B, _ = reads.shape
    lane_of, rows, ov = collect_intv_flat_sm(fm, reads, lens, parents, opt,
                                             C=C, S=S)
    out = [[] for _ in range(B)]
    for b, row in zip(lane_of, rows):
        out[b].append(tuple(int(v) for v in row))
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
    rdt = fm.rdt
    L2f = _sel2(fm.L2, fm_id)     # [B, 5] loop-invariant
    L2c = _sel2(fm.L2, fmc_id)

    state = dict(
        x=jnp.zeros((B,), rdt),
        i=jnp.zeros((B,), rdt),
        ik=jnp.zeros((3, B), rdt),
        in_run=jnp.zeros((B,), jnp.bool_),
        seeds=jnp.zeros((5, B, S), rdt),        # component planes (tiling)
        n_seeds=jnp.zeros((B,), jnp.int32),
        overflow=jnp.zeros((B,), jnp.bool_),
        iters=jnp.int32(0),
    )

    def get_q(i):
        ii = jnp.clip(i, 0, L - 1)
        v = _pick_oh(q, ii)
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
        l2f_c0 = _pick_oh(L2f, c0)
        ik_new = jnp.stack([l2f_c0 + 1, _pick_oh(L2c, 3 - c0) + 1,
                            _pick_oh(L2f, c0 + 1) - l2f_c0])
        ik = jnp.where(start_run[None], ik_new, ik)
        i = jnp.where(start_run, x + 1, i)
        in_run = in_run | start_run

        qi = get_q(i)
        run_end_len = in_run & (i >= lens)        # reached read end: x = len
        run_amb = in_run & (i < lens) & (qi >= 4)  # ambiguous: return i+1
        need = in_run & (i < lens) & (qi < 4)
        x_q = jnp.where(need, ik[1], 1)
        s_in = jnp.where(need, ik[2], 1)
        new_xq, new_xo, sizes = extend_sel(fm, fmc_id, x_q, ik[0], s_in,
                                           jnp.zeros((B,), jnp.bool_))
        c = 3 - jnp.clip(qi, 0, 3)
        ok_x1 = _pick_oh(new_xq, c)
        ok_x0 = _pick_oh(new_xo, c)
        ok_s = _pick_oh(sizes, c)
        hit = need & (ok_s < max_intv) & (i - x >= min_seed_len)
        # the reference only pushes hits with a nonzero interval
        # (mem_collect_intv: `if (m.x[2] > 0) kv_push`), but the scan still
        # restarts at i+1 either way
        store_hit = hit & (ok_s > 0)
        can_store = st["n_seeds"] < S
        seed_rows = jnp.stack([x, i + 1, ok_x0, ok_x1, ok_s])  # [5, B]
        N = st["seeds"].shape[2]
        oh = (jnp.arange(N, dtype=jnp.int32)[None, :]
              == jnp.minimum(st["n_seeds"], S - 1)[:, None]) \
            & (store_hit & can_store)[:, None]
        seeds = jnp.where(oh[None], seed_rows[:, :, None], st["seeds"])
        n_seeds = jnp.where(store_hit & can_store, st["n_seeds"] + 1, st["n_seeds"])
        overflow = st["overflow"] | (store_hit & ~can_store)
        ik = jnp.where((need & ~hit)[None],
                       jnp.stack([ok_x0, ok_x1, ok_s]), ik)
        i = jnp.where(need & ~hit, i + 1, i)
        # run terminations
        x = jnp.where(run_end_len, lens, x)
        x = jnp.where(run_amb | hit, i + 1, x)
        in_run = in_run & ~(run_end_len | run_amb | hit)
        return dict(x=x, i=i, ik=ik, in_run=in_run, seeds=seeds,
                    n_seeds=n_seeds, overflow=overflow, iters=st["iters"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return final["seeds"].transpose(1, 2, 0), final["n_seeds"], final["overflow"]
