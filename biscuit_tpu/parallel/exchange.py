"""File-barrier allgather for multi-host shard runs.

Each rank writes its per-batch payload to <dir>/<name>.<batch>.<rank>.npy,
waits until all n ranks' files for that batch exist, and returns the
rank-ordered concatenation. This is the DCN-side collective for process-
per-host simulations (tools/shard_align.py); on a real multi-host TPU pod
the same role is played by jax.experimental.multihost_utils /
process_allgather over DCN.

Used for PE insert-size statistics: the reference computes pes over the
whole in-memory chunk (bwamem.c:464-467), so shards must pool their
candidate isizes to produce byte-identical pairing decisions regardless of
how the reads were partitioned (see align/pair.ISIZE_EXCHANGE).
"""
import os
import time

import numpy as np


class FileAllgather:
    """allgather(list[int]) -> list[int] across n ranks via a shared dir."""

    def __init__(self, directory: str, rank: int, n: int, name: str = "isize",
                 timeout: float = 600.0):
        self.dir = directory
        self.rank = rank
        self.n = n
        self.name = name
        self.timeout = timeout
        self.batch = 0
        os.makedirs(directory, exist_ok=True)

    def _path(self, batch: int, rank: int) -> str:
        return os.path.join(self.dir, f"{self.name}.{batch}.{rank}.npy")

    def __call__(self, values):
        b = self.batch
        self.batch += 1
        tmp = self._path(b, self.rank) + ".tmp"
        with open(tmp, "wb") as f:  # explicit handle: np.save must not
            np.save(f, np.asarray(list(values), dtype=np.int64))  # mangle it
        os.replace(tmp, self._path(b, self.rank))  # atomic publish
        merged = []
        deadline = time.time() + self.timeout
        for r in range(self.n):
            p = self._path(b, r)
            while not os.path.exists(p):
                if time.time() > deadline:
                    raise TimeoutError(
                        f"rank {self.rank}: no {p} after {self.timeout}s")
                time.sleep(0.005)
            # NFS-style visibility: the np.load below can still race a
            # partially visible file only if os.replace were non-atomic on
            # the filesystem; retry reads defensively
            for _ in range(3):
                try:
                    merged.extend(np.load(p).tolist())
                    break
                except (ValueError, EOFError):
                    time.sleep(0.01)
            else:
                merged.extend(np.load(p).tolist())
        return merged


class JaxProcessAllgather:
    """allgather(list[int]) across jax.distributed processes — the real DCN
    collective path (multihost_utils.process_allgather), replacing the
    FileAllgather simulation when the run was started with
    jax.distributed.initialize (tools/dist_run.py). Variable-length lists
    are exchanged as (count allgather, pad-to-max, value allgather, trim);
    result is rank-ordered, so pairing decisions are partition-invariant
    exactly as with the file barrier."""

    def __init__(self):
        import jax
        from jax.experimental import multihost_utils
        self._jax = jax
        self._mh = multihost_utils

    def __call__(self, values):
        np_vals = np.asarray(list(values), dtype=np.int64)
        counts = np.asarray(
            self._mh.process_allgather(np.int64(len(np_vals))))
        counts = counts.reshape(-1)
        width = max(int(counts.max()), 1)
        pad = np.zeros(width, np.int64)
        pad[:len(np_vals)] = np_vals
        allv = np.asarray(self._mh.process_allgather(pad))
        allv = allv.reshape(len(counts), width)
        merged = []
        for r in range(len(counts)):
            merged.extend(allv[r, :counts[r]].tolist())
        return merged


def from_env(env: str = "BISCUIT_TPU_PES_EXCHANGE"):
    """Parse 'dir:rank:n' (file barrier) or 'jax' (jax.distributed
    process_allgather) from the environment; None when unset."""
    spec = os.environ.get(env)
    if not spec:
        return None
    if spec == "jax":
        return JaxProcessAllgather()
    d, rank, n = spec.rsplit(":", 2)
    return FileAllgather(d, int(rank), int(n))
