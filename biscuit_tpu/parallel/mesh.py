"""Multi-chip execution: read-shard data parallelism + genome-axis pileup
count merging over a jax.sharding Mesh.

The reference is single-node pthreads (SURVEY.md §2d); the TPU-native analogs
are:
  * read batches sharded over a "dp" mesh axis (each chip seeds/extends its
    shard against a replicated index) — kt_for's read-parallelism;
  * per-window pileup count tensors computed per shard and merged with psum —
    the window-queue + ordered-writer coordinate parallelism;
  * candidate-site allgather before VCF emission.
"""
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 stable API; the experimental module warns on import
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, **kw):
    """shard_map with the varying-manual-axes check disabled: our kernels
    carry while_loop state that starts as replicated constants and becomes
    device-varying, which the strict VMA checker rejects."""
    try:
        return _shard_map(f, check_vma=False, **kw)
    except TypeError:
        return _shard_map(f, check_rep=False, **kw)

from ..ops.seed_batch import FMPair
from ..ops.seed_parallel import forward_extend_all
from ..ops.sw_batch import sw_extend_batch


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("dp",))


def make_mesh2(n_dp: int, n_idx: int) -> Mesh:
    """2-D mesh: reads data-parallel over `dp`, FM-index sharded over
    `idx`. An (n_dp, n_idx) grid rides ICI both ways; n_dp=1 gives pure
    index sharding (the human-genome HBM-capacity configuration)."""
    devs = jax.devices()
    assert len(devs) >= n_dp * n_idx, \
        f"need {n_dp * n_idx} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n_dp * n_idx]).reshape(n_dp, n_idx),
                ("dp", "idx"))


def sharded_seed_fn(mesh: Mesh, fm: FMPair, L: int,
                    min_seed_len: int, max_mem_intv: int):
    """Returns a jitted fn: (q [B, L], lens [B], parents [B]) -> packed seed
    outputs [10, B*L], with B sharded over the dp axis and the FM index
    replicated in every chip's HBM."""

    def local(q, lens, parents):
        Bl = q.shape[0]
        starts = jnp.tile(jnp.arange(L, dtype=jnp.int32), Bl)
        read_of = jnp.repeat(jnp.arange(Bl, dtype=jnp.int32), L)
        packed = forward_extend_all(fm, q, lens, parents, starts, read_of,
                                    jnp.ones((Bl * L,), jnp.int32),
                                    min_seed_len, max_mem_intv,
                                    max_iters=L + 2)
        return packed

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp", None), P("dp"), P("dp")),
                   out_specs=P(None, "dp"))
    return jax.jit(fn)


def sharded_pool_seed_fn(mesh: Mesh, fm: FMPair, min_seed_len: int,
                         max_mem_intv: int, split_len: int, split_width: int,
                         lanes: int = 128, C: int = 32, S: int = 64,
                         T2: int = 16):
    """The PRODUCTION pool seeder (ops/seed_batch.smem3_pool_batch) under
    shard_map: the read pool is sharded over the dp axis and each device
    runs an independent lane-refill machine over its shard (the index is
    replicated). Returns a jitted fn:
        pool [N, L+2] int32 -> (seeds [N_local_max... packed per shard]).
    Output: (seeds [B, S, 6], n_seeds [B]) with the lane axis sharded —
    callers compact per shard exactly as the single-device path does."""
    from ..ops.seed_batch import smem3_pool_batch

    def local(pool):
        seeds, n_seeds, ov_rd, ov_spill, _it, next_ctr = smem3_pool_batch(
            fm, pool, min_seed_len, max_mem_intv, split_len, split_width,
            lanes=lanes, C=C, S=S, T2=T2)
        return seeds, n_seeds, ov_rd
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp", None),),
                   out_specs=(P("dp", None, None), P("dp"), P("dp", None)))
    return jax.jit(fn)


def sharded_extend_fn(mesh: Mesh, mats: jnp.ndarray, o_del: int, e_del: int,
                      o_ins: int, e_ins: int, zdrop: int):
    """Batched SW extension with the lane axis sharded over dp."""

    def local(q, qlens, t, tlens, msel, w, eb, h0):
        return sw_extend_batch(q, qlens, t, tlens, mats, msel,
                               o_del, e_del, o_ins, e_ins, w, eb, zdrop, h0)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp", None), P("dp"), P("dp", None), P("dp"),
                             P("dp"), P("dp"), P("dp"), P("dp")),
                   out_specs=P(None, "dp"))
    return jax.jit(fn)


def pileup_count_window(positions: jnp.ndarray, stat: jnp.ndarray,
                        valid: jnp.ndarray, window: int,
                        n_codes: int = 32) -> jnp.ndarray:
    """Device-side per-window pileup counting: scatter-add (site, code)
    contributions from CIGAR-expanded read bases. positions are
    window-relative; stat packs (base_code << 4 | meth_code) as in
    pileup_data_t.stat."""
    idx = positions * n_codes + stat
    idx = jnp.where(valid, idx, window * n_codes)  # spill bin
    counts = jnp.zeros((window * n_codes + 1,), jnp.int32)
    counts = counts.at[idx].add(1)
    return counts[:window * n_codes].reshape(window, n_codes)


def sharded_log_seed_fn(mesh: Mesh, fm: FMPair, min_seed_len: int,
                        max_mem_intv: int, split_len: int, split_width: int,
                        lanes: int = 16, C: int = 32, T2: int = 16,
                        LOG_LEN: int = 4096, W: int = 64,
                        claim_every: int = 1):
    """The PRODUCTION (log/smem4) seeder under shard_map with the index
    replicated and read pools sharded over dp — the shipping default
    (BISCUIT_TPU_SEEDER=log) configuration. Returns jit fn(pool [N, L+2])
    -> (packed [n_dp*N_l*24, 5], rid [n_dp*N_l*24], ov_rd, unfinished)
    with per-shard-local read ids (callers add shard * N_l)."""
    from ..ops.seed_batch import _collect_sm_log

    def local(pool):
        packed, rid, total, ov_rd, ov_spill, next_ctr, unfinished = \
            _collect_sm_log(fm, pool, min_seed_len, max_mem_intv,
                            split_len, split_width, lanes=lanes, C=C,
                            T2=T2, LOG_LEN=LOG_LEN, W=W,
                            claim_every=claim_every)
        return packed, rid, ov_rd, unfinished

    fn = shard_map(local, mesh=mesh, in_specs=(P("dp", None),),
                   out_specs=(P("dp", None), P("dp"), P("dp", None),
                              P("dp")))
    return jax.jit(fn)


def sharded_chain_fn(mesh: Mesh, w: int, max_gap: int, max_occ: int,
                     NC: int = 64):
    """Device chaining (ops/chain_batch.chain_scan_batch — the mem_chain
    B-tree replay, memchain.c:218-393) with the lane (read) axis sharded
    over dp. Occurrence planes are [J, B] J-major; l_pac rides as a
    replicated scalar. Returns jit fn(qbeg, len, rbeg, valid, rid, k,
    n_occ, l_pac) -> (log [J, B], ov [B])."""
    from ..ops.chain_batch import chain_scan_batch

    def local(qbeg, ln, rbeg, valid, rid, kk, n_occ, l_pac):
        return chain_scan_batch(qbeg, ln, rbeg, valid, rid, kk, n_occ,
                                l_pac, w, max_gap, max_occ, NC=NC)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "dp"), P(None, "dp"), P(None, "dp"),
                             P(None, "dp"), P(None, "dp"), P(None, "dp"),
                             P("dp"), P()),
                   out_specs=(P(None, "dp"), P("dp")))
    return jax.jit(fn)


def sharded_rescue_fn(mesh: Mesh, o_del: int, e_del: int, o_ins: int,
                      e_ins: int):
    """Batched mate rescue (ops/sw_local.sw_local_kernel — exact
    ksw_align2, ksw.c:111-334) with the lane axis sharded over dp.
    Returns jit fn(query, qlens, target, tlens, mats, matsel, minsc,
    endsc, u8) -> the kernel's output dict, imax_rows kept [Lt, B]."""
    from ..ops.sw_local import sw_local_kernel

    def local(query, qlens, target, tlens, mats, matsel, minsc, endsc, u8):
        return sw_local_kernel(query, qlens, target, tlens, mats, matsel,
                               o_del, e_del, o_ins, e_ins, minsc, endsc,
                               u8)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp", None), P("dp"), P("dp", None),
                             P("dp"), P(), P("dp"), P("dp"), P("dp"),
                             P("dp")),
                   out_specs=dict(gmax=P("dp"), te=P("dp"), qe=P("dp"),
                                  shift=P("dp"), sat=P("dp"),
                                  imax_rows=P(None, "dp")))
    return jax.jit(fn)


def _local_fm(fm: FMPair, tab_l, sa_l, L2, primary, seq_len,
              n64: int, n_sa: int) -> FMPair:
    """Per-device FMPair inside a shard_map body: local table/SA slices +
    replicated small arrays (traced), shard-routing over the idx axis."""
    return FMPair(tab=tab_l, L2=L2, primary=primary, seq_len=seq_len,
                  sa_samples=sa_l, wide=fm.wide, sa_intv=fm.sa_intv,
                  shard_axis="idx", n64_global=n64, n_sa_global=n_sa)


def sharded_index_seed_fn(mesh: Mesh, fm: FMPair, min_seed_len: int,
                          max_mem_intv: int, split_len: int,
                          split_width: int, *, seeder: str = "log",
                          lanes: int = 64, C: int = 32, S: int = 64,
                          T2: int = 16, LOG_LEN: int = 4096, W: int = 64,
                          claim_every: int = 1):
    """Production seeding with the FM-INDEX SHARDED over the mesh (SURVEY
    §2d "replicate (or shard, for big genomes) both converted indexes in
    HBM"; reference bwt_t bwt[2] residency, bwa.h:42-50).

    The fused occ+BWT tables and SA samples partition row-contiguously
    over the `idx` mesh axis — each device holds 1/n_idx of both strands —
    and read pools shard over `dp`. Every occ4/invPsi/SA gather routes to
    the owning shard (local gather + masked-zero + psum over idx; exactly
    one shard owns each row). Devices in one idx group run identical
    lockstep control flow (pool replicated over idx), so the psum'd rows,
    and therefore the seeds, are bit-identical to the replicated-index
    machine — asserted in tests/test_sharded_index.py and the driver
    dryrun.

    seeder="log" (production default) wraps _collect_sm_log and returns
    jit fn(pool [N, L+2]) -> (packed [N_l*24, 5], rid_sorted [N_l*24],
    ov_rd [B_l, 8], unfinished [B_l], next_ctr [1], spill [1]) per dp
    shard (read ids local to the shard; callers add shard * N_l).
    seeder="pool" wraps the archive machine and returns (packed, rid,
    ov_rd)."""
    from ..ops.seed_batch import (_collect_sm_log, _collect_sm_pool,
                                  _rank_ctx, fm_shard_arrays)

    n_idx = mesh.shape["idx"]
    with _rank_ctx(fm):
        tab_flat, sa_flat, n64, n_sa = fm_shard_arrays(fm, n_idx)
        tab_j = jnp.asarray(tab_flat)
        sa_j = jnp.asarray(sa_flat)

    if seeder == "pool":
        def local(tab_l, sa_l, L2, primary, seq_len, pool):
            fml = _local_fm(fm, tab_l, sa_l, L2, primary, seq_len,
                            n64, n_sa)
            packed, rid, total, ov_rd, ov_spill, next_ctr = \
                _collect_sm_pool(fml, pool, min_seed_len, max_mem_intv,
                                 split_len, split_width, lanes=lanes, C=C,
                                 S=S, T2=T2, claim_every=claim_every)
            return packed, rid, ov_rd
        out_specs = (P("dp", None), P("dp"), P("dp", None))
    elif seeder == "log":
        def local(tab_l, sa_l, L2, primary, seq_len, pool):
            fml = _local_fm(fm, tab_l, sa_l, L2, primary, seq_len,
                            n64, n_sa)
            packed, rid, total, ov_rd, ov_spill, next_ctr, unfinished = \
                _collect_sm_log(fml, pool, min_seed_len, max_mem_intv,
                                split_len, split_width, lanes=lanes, C=C,
                                T2=T2, LOG_LEN=LOG_LEN, W=W,
                                claim_every=claim_every)
            return (packed, rid, ov_rd, unfinished,
                    jnp.reshape(next_ctr, (1,)),
                    jnp.reshape(ov_spill.astype(jnp.int32), (1,)))
        out_specs = (P("dp", None), P("dp"), P("dp", None), P("dp"),
                     P("dp"), P("dp"))
    else:
        raise ValueError(f"unknown seeder {seeder!r}")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("idx", None), P("idx"), P(), P(), P(),
                             P("dp", None)),
                   out_specs=out_specs)
    jfn = jax.jit(fn)

    def run(pool):
        with _rank_ctx(fm):
            return jfn(tab_j, sa_j, fm.L2, fm.primary, fm.seq_len,
                       jnp.asarray(pool))
    return run


def sharded_index_sa_fn(mesh: Mesh, fm: FMPair):
    """Batched SA resolution (bwt_sa invPsi walk) against the idx-sharded
    tables: (which [M], k [M]) sharded over dp, each walk step's tab row
    and the final sample gather psum-routed over idx. Bit-identical to
    the replicated sa_batch."""
    from ..ops.seed_batch import _rank_ctx, fm_shard_arrays, sa_batch

    n_idx = mesh.shape["idx"]
    with _rank_ctx(fm):
        tab_flat, sa_flat, n64, n_sa = fm_shard_arrays(fm, n_idx)
        tab_j = jnp.asarray(tab_flat)
        sa_j = jnp.asarray(sa_flat)

    def local(tab_l, sa_l, L2, primary, seq_len, which, k):
        fml = _local_fm(fm, tab_l, sa_l, L2, primary, seq_len, n64, n_sa)
        return sa_batch(fml, which, k)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("idx", None), P("idx"), P(), P(), P(),
                             P("dp"), P("dp")),
                   out_specs=P("dp"))
    jfn = jax.jit(fn)

    def run(which, k):
        with _rank_ctx(fm):
            return jfn(tab_j, sa_j, fm.L2, fm.primary, fm.seq_len,
                       jnp.asarray(which), jnp.asarray(k))
    return run


def sharded_pileup_counts_fn(mesh: Mesh, window: int, n_codes: int = 32):
    """Per-shard window counting + psum merge across the dp axis (the
    collective analog of the reference's per-window queue merge)."""

    def local(positions, stat, valid):
        counts = pileup_count_window(positions, stat, valid, window, n_codes)
        return jax.lax.psum(counts, "dp")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp"), P("dp"), P("dp")),
                   out_specs=P())
    return jax.jit(fn)
