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


def from_env(env: str = "BISCUIT_TPU_PES_EXCHANGE"):
    """Parse 'dir:rank:n' from the environment; None when unset."""
    spec = os.environ.get(env)
    if not spec:
        return None
    d, rank, n = spec.rsplit(":", 2)
    return FileAllgather(d, int(rank), int(n))
