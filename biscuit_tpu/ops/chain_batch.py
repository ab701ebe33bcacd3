"""Device seed chaining: mem_chain's B-tree scan as a lockstep batch machine.

Reference semantics: /root/reference/lib/aln/memchain.c:218-393 (mem_chain +
merge_seed_to_chain). Per read, seeds' SA occurrences are visited in order;
each occurrence either merges into the chain with the largest position <=
its own (the B-tree lower neighbor) or founds a new chain inserted in sorted
position order. The tree evolves as the scan proceeds — a strictly
sequential recurrence per read, but independent ACROSS reads: lanes = reads,
one occurrence per lane per iteration, the whole tree state held as sorted
[NC, B] planes (B-minor, dense VPU tiles).

Capacity contract (mirrors the seeder's ov_rd pattern): within the
KMAX-occurrences-per-seed and NC-chains-per-lane caps the reference's while
condition (memchain.c:326: k < size && count < max_occ && (count<=5 ||
k < max_occ), max_occ default 500) can never fire dynamically, so the
machine visits every streamed occurrence unconditionally; a lane that WOULD
exceed a cap is flagged and rerun exactly on the host. The caller prepares
the occurrence stream (SA positions from the batched sa walk, rid/bsstrand
filters applied) and decodes the per-occurrence action log back into Chain
objects — see align.chain.mem_chain_batch.

No FM tables are touched: the machine is pure VPU over small planes, the
only HBM traffic is one [B] column slice of the occurrence stream and one
[B] log row per iteration.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# action log encoding: entry = chain_id << 2 | kind
K_NONE, K_NEW, K_APPEND, K_EXTRA = 0, 1, 2, 3


def _pickc(plane: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """plane [NC, B] -> [B]: plane[idx[b], b] via one-hot multiply-reduce."""
    NC = plane.shape[0]
    oh = jnp.arange(NC, dtype=jnp.int32)[:, None] == idx[None, :]
    return jnp.sum(jnp.where(oh, plane, 0), axis=0)


@partial(jax.jit, static_argnames=("NC",))
def chain_scan_batch(occ_qbeg: jnp.ndarray, occ_len: jnp.ndarray,
                     occ_rbeg: jnp.ndarray, occ_valid: jnp.ndarray,
                     occ_rid: jnp.ndarray, occ_k: jnp.ndarray,
                     n_occ: jnp.ndarray,
                     l_pac, w: int, max_gap: int, max_occ: int,
                     NC: int = 64):
    """Run the chain scan over a batch.

    occ_* are [J, B] occurrence planes in visit order (J-major so each
    iteration reads ONE contiguous [B] row): query begin, seed length,
    reference begin (rank dtype), validity (rid/bsstrand pre-filtered),
    contig id, occurrence index within its seed. n_occ [B]; l_pac scalar
    of the rank dtype; w/max_gap/max_occ from mem_opt.

    The per-seed while condition (memchain.c:326: count < max_occ &&
    (count <= 5 || k < max_occ), count = chains CREATED for this seed) is
    replayed exactly: `cnt` resets at k == 0 and both count terms are
    monotone within a seed, so a failing condition stays failed for the
    seed's remaining occurrences — no skip-jump needed.

    Returns (log [J, B] int32 action entries, ov [B] bool capacity
    overflow — decode must discard those lanes and rerun them on host)."""
    J, B = occ_qbeg.shape
    rdt = occ_rbeg.dtype
    slots = jnp.arange(NC, dtype=jnp.int32)[:, None]

    state = dict(
        cnt=jnp.zeros((B,), jnp.int32),
        pos=jnp.zeros((NC, B), rdt),
        cid=jnp.zeros((NC, B), jnp.int32),
        crid=jnp.zeros((NC, B), jnp.int32),
        fq=jnp.zeros((NC, B), jnp.int32),
        fr=jnp.zeros((NC, B), rdt),
        lq=jnp.zeros((NC, B), jnp.int32),
        lr=jnp.zeros((NC, B), rdt),
        ll=jnp.zeros((NC, B), jnp.int32),
        n=jnp.zeros((B,), jnp.int32),
        ov=jnp.zeros((B,), jnp.bool_),
        log=jnp.zeros((J, B), jnp.int32),
        it=jnp.int32(0),
    )
    jmax = jnp.max(n_occ)

    def cond(st):
        return st["it"] < jmax

    def row(plane, col):
        return jax.lax.dynamic_slice_in_dim(plane, col, 1, 0)[0]

    def step(st):
        col = st["it"]
        qb = row(occ_qbeg, col)
        ln = row(occ_len, col)
        rb = row(occ_rbeg, col)
        vd = row(occ_valid, col)
        rid_o = row(occ_rid, col)
        kk = row(occ_k, col)
        cnt0 = jnp.where(kk == 0, 0, st["cnt"])
        allow = (cnt0 < max_occ) & ((cnt0 <= 5) | (kk < max_occ))
        act = (col < n_occ) & (vd != 0) & (~st["ov"]) & allow

        # lower neighbor: largest pos <= rbeg among the n sorted chains
        # (bisect_right - 1; ties resolve to the latest-inserted equal key,
        # exactly the host path's behavior)
        maskc = slots < st["n"][None, :]
        le = maskc & (st["pos"] <= rb[None, :])
        ins = le.sum(axis=0).astype(jnp.int32)
        jn = ins - 1
        found = jn >= 0
        jsafe = jnp.maximum(jn, 0)
        c_rid = _pickc(st["crid"], jsafe)
        c_fq = _pickc(st["fq"], jsafe)
        c_fr = _pickc(st["fr"], jsafe)
        c_lq = _pickc(st["lq"], jsafe)
        c_lr = _pickc(st["lr"], jsafe)
        c_ll = _pickc(st["ll"], jsafe)
        c_id = _pickc(st["cid"], jsafe)

        # merge_seed_to_chain (memchain.c:227-256), in its exact order
        rid_eq = c_rid == rid_o
        lnr = ln.astype(rdt)
        cllr = c_ll.astype(rdt)
        contained = (qb >= c_fq) & (qb + ln <= c_lq + c_ll) \
            & (rb >= c_fr) & (rb + lnr <= c_lr + cllr)
        pacrej = ((c_lr < l_pac) | (c_fr < l_pac)) & (rb >= l_pac)
        qd = (qb - c_lq).astype(rdt)
        rd = rb - c_lr
        apnd = (rd >= 0) & (qd - rd <= w) & (rd - qd <= w) \
            & (qd - cllr < max_gap) & (rd - cllr < max_gap)
        is_extra = act & found & rid_eq & contained
        is_app = act & found & rid_eq & (~contained) & (~pacrej) & apnd
        merged = is_extra | is_app
        want_new = act & (~merged)
        cap_ok = st["n"] < NC
        do_new = want_new & cap_ok
        ov = st["ov"] | (want_new & ~cap_ok)

        # append: the chain's last seed becomes this one (first unchanged)
        atj = (slots == jsafe[None, :]) & is_app[None, :]
        lq1 = jnp.where(atj, qb[None, :], st["lq"])
        lr1 = jnp.where(atj, rb[None, :], st["lr"])
        ll1 = jnp.where(atj, ln[None, :], st["ll"])

        # insert: shift slots >= ins up by one, place the new chain at ins
        shift = slots >= ins[None, :]
        at = slots == ins[None, :]
        dn = do_new[None, :]

        def insert(plane, newv):
            shifted = jnp.concatenate([plane[:1], plane[:-1]], axis=0)
            base = jnp.where(shift, shifted, plane)
            cand = jnp.where(at, newv[None, :].astype(plane.dtype), base)
            return jnp.where(dn, cand, plane)

        pos2 = insert(st["pos"], rb)
        cid2 = insert(st["cid"], st["n"])
        crid2 = insert(st["crid"], rid_o)
        fq2 = insert(st["fq"], qb)
        fr2 = insert(st["fr"], rb)
        lq2 = insert(lq1, qb)
        lr2 = insert(lr1, rb)
        ll2 = insert(ll1, ln)
        n2 = st["n"] + do_new.astype(jnp.int32)

        kind = (do_new * K_NEW + is_app * K_APPEND + is_extra * K_EXTRA
                ).astype(jnp.int32)
        ide = jnp.where(do_new, st["n"], jnp.where(merged, c_id, 0))
        entry = (ide << 2) | kind
        log2 = jax.lax.dynamic_update_slice_in_dim(
            st["log"], entry[None, :], col, axis=0)

        return dict(cnt=cnt0 + do_new.astype(jnp.int32),
                    pos=pos2, cid=cid2, crid=crid2, fq=fq2, fr=fr2,
                    lq=lq2, lr=lr2, ll=ll2, n=n2, ov=ov, log=log2,
                    it=st["it"] + 1)

    final = jax.lax.while_loop(cond, step, state)
    return final["log"], final["ov"]
