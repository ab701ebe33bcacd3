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
