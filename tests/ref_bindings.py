"""ctypes bindings to the reference oracle shared library (libref_aln.so).

Test-only: exposes the reference's FM-index and Smith-Waterman kernels so unit
tests can diff biscuit_tpu's implementations against the real thing, function
by function. Not part of the framework.
"""
import ctypes as C
import os

import numpy as np

_LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "oracle", "build", "libref_aln.so")


class BwtIntv(C.Structure):
    _fields_ = [("x", C.c_uint64 * 3), ("info", C.c_uint64)]


class BwtIntvV(C.Structure):
    _fields_ = [("n", C.c_size_t), ("m", C.c_size_t), ("a", C.POINTER(BwtIntv))]


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = C.CDLL(_LIB)
        L = _lib
        L.bwt_restore_bwt.restype = C.c_void_p
        L.bwt_restore_bwt.argtypes = [C.c_char_p]
        L.bwt_restore_sa.argtypes = [C.c_char_p, C.c_void_p]
        L.bwt_occ4.argtypes = [C.c_void_p, C.c_uint64, C.POINTER(C.c_uint64)]
        L.bwt_occ.argtypes = [C.c_void_p, C.c_uint64, C.c_ubyte]
        L.bwt_occ.restype = C.c_uint64
        L.bwt_sa.argtypes = [C.c_void_p, C.c_uint64]
        L.bwt_sa.restype = C.c_uint64
        L.bwt_extend.argtypes = [C.c_void_p, C.POINTER(BwtIntv), BwtIntv * 4, C.c_int]
        L.bwt_smem1a.argtypes = [C.c_void_p, C.c_void_p, C.c_int, C.c_char_p, C.c_int,
                                 C.c_int, C.c_uint64, C.POINTER(BwtIntvV), C.c_void_p]
        L.bwt_smem1a.restype = C.c_int
        L.bwt_seed_strategy1.argtypes = [C.c_void_p, C.c_void_p, C.c_int, C.c_char_p,
                                         C.c_int, C.c_int, C.c_int, C.POINTER(BwtIntv)]
        L.bwt_seed_strategy1.restype = C.c_int
        ip = C.POINTER(C.c_int)
        L.ksw_extend2.argtypes = [C.c_int, C.c_char_p, C.c_int, C.c_char_p, C.c_int,
                                  C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_int,
                                  C.c_int, C.c_int, C.c_int, C.c_int,
                                  ip, ip, ip, ip, ip]
        L.ksw_extend2.restype = C.c_int
        L.ksw_global2.argtypes = [C.c_int, C.c_char_p, C.c_int, C.c_char_p, C.c_int,
                                  C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_int,
                                  C.c_int, ip, C.POINTER(C.POINTER(C.c_uint32))]
        L.ksw_global2.restype = C.c_int
        L.ksw_align2.argtypes = [C.c_int, C.c_char_p, C.c_int, C.c_char_p, C.c_int,
                                 C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_int,
                                 C.c_int, C.c_void_p]
        L.ksw_align2.restype = KswR
    return _lib


class KswR(C.Structure):
    _fields_ = [("score", C.c_int), ("te", C.c_int), ("qe", C.c_int),
                ("score2", C.c_int), ("te2", C.c_int), ("tb", C.c_int),
                ("qb", C.c_int)]


KSW_XBYTE = 0x10000
KSW_XSTOP = 0x20000
KSW_XSUBO = 0x40000
KSW_XSTART = 0x80000


def _buf(a):
    return bytes(np.asarray(a, dtype=np.uint8))


def ksw_extend2(query, target, mat, o_del, e_del, o_ins, e_ins, w,
                end_bonus, zdrop, h0):
    qle, tle, gtle, gscore, max_off = (C.c_int() for _ in range(5))
    sc = lib().ksw_extend2(len(query), _buf(query), len(target), _buf(target), 5,
                           bytes(np.asarray(mat, dtype=np.int8).reshape(-1).view(np.uint8)),
                           o_del, e_del, o_ins, e_ins, w, end_bonus, zdrop, h0,
                           C.byref(qle), C.byref(tle), C.byref(gtle),
                           C.byref(gscore), C.byref(max_off))
    return sc, qle.value, tle.value, gtle.value, gscore.value, max_off.value


def ksw_global2(query, target, mat, o_del, e_del, o_ins, e_ins, w):
    n_cigar = C.c_int()
    cig = C.POINTER(C.c_uint32)()
    sc = lib().ksw_global2(len(query), _buf(query), len(target), _buf(target), 5,
                           bytes(np.asarray(mat, dtype=np.int8).reshape(-1).view(np.uint8)),
                           o_del, e_del, o_ins, e_ins, w,
                           C.byref(n_cigar), C.byref(cig))
    cigar = [(cig[i] & 0xF, cig[i] >> 4) for i in range(n_cigar.value)]
    return sc, cigar


def ksw_align2(query, target, mat, o_del, e_del, o_ins, e_ins, xtra):
    # ksw_align2 reverses query/target in place (and restores them), so pass
    # mutable buffers
    qb = C.create_string_buffer(_buf(query), len(query))
    tb = C.create_string_buffer(_buf(target), len(target))
    r = lib().ksw_align2(len(query), qb, len(target), tb, 5,
                         bytes(np.asarray(mat, dtype=np.int8).reshape(-1).view(np.uint8)),
                         o_del, e_del, o_ins, e_ins, xtra, None)
    return r


class RefBWT:
    """Opaque handle to a reference bwt_t loaded from .bwt/.sa files."""

    def __init__(self, bwt_path: str, sa_path: str | None = None):
        self.ptr = lib().bwt_restore_bwt(bwt_path.encode())
        if sa_path:
            lib().bwt_restore_sa(sa_path.encode(), C.c_void_p(self.ptr))
        # bwt_t head: primary u64, L2[5] u64 (L2[0] stays 0)
        head = C.cast(self.ptr, C.POINTER(C.c_uint64))
        self.primary = head[0]
        self.L2 = [head[1 + i] for i in range(5)]
        self.seq_len = head[6]

    def occ4(self, k: int) -> np.ndarray:
        cnt = (C.c_uint64 * 4)()
        lib().bwt_occ4(C.c_void_p(self.ptr), C.c_uint64(k % (1 << 64)), cnt)
        return np.array(cnt[:], dtype=np.int64)

    def sa(self, k: int) -> int:
        return lib().bwt_sa(C.c_void_p(self.ptr), k)

    def extend(self, ik, is_back: bool) -> np.ndarray:
        iv = BwtIntv()
        iv.x[0], iv.x[1], iv.x[2] = int(ik[0]), int(ik[1]), int(ik[2])
        iv.info = 0
        ok = (BwtIntv * 4)()
        lib().bwt_extend(C.c_void_p(self.ptr), C.byref(iv), ok, int(is_back))
        return np.array([[o.x[0], o.x[1], o.x[2]] for o in ok], dtype=np.int64)

    def smem1a(self, other: "RefBWT", q: np.ndarray, x: int, min_intv: int,
               max_intv: int = 0):
        """Returns (ret, list of (start, end, x0, x1, size))."""
        mem = BwtIntvV(0, 0, None)
        qb = bytes(np.asarray(q, dtype=np.uint8))
        ret = lib().bwt_smem1a(C.c_void_p(self.ptr), C.c_void_p(other.ptr),
                               len(qb), qb, x, min_intv, max_intv,
                               C.byref(mem), None)
        out = []
        for i in range(mem.n):
            iv = mem.a[i]
            out.append((iv.info >> 32, iv.info & 0xFFFFFFFF, iv.x[0], iv.x[1], iv.x[2]))
        return ret, out

    def seed_strategy1(self, other: "RefBWT", q: np.ndarray, x: int,
                       min_len: int, max_intv: int):
        m = BwtIntv()
        qb = bytes(np.asarray(q, dtype=np.uint8))
        ret = lib().bwt_seed_strategy1(C.c_void_p(self.ptr), C.c_void_p(other.ptr),
                                       len(qb), qb, x, min_len, max_intv, C.byref(m))
        return ret, (m.info >> 32, m.info & 0xFFFFFFFF, m.x[0], m.x[1], m.x[2])
