"""Compile-once C kernels for the per-byte / per-token hot loops.

The sandbox (and any stock Linux worker image) ships ``cc``; kernels are
compiled once per machine into a content-addressed ``.so`` under
``$IRBR_CKERNEL_DIR`` (default ``/tmp/ir_base_ray_ckernels``) and loaded via
``ctypes`` — no third-party build system, no install step. Every call site
keeps its pure-Python/numpy path as the fallback (and as the pytest parity
oracle), so a cluster without a compiler still runs, just slower. Set
``IRBR_NO_CKERNELS=1`` to force the fallback paths.

Compilation is multi-process safe: each worker compiles to a private temp
file and ``os.replace``s it into place (atomic on POSIX); losers of the race
just overwrite with identical content.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

_CACHE_DIR = os.environ.get(
    "IRBR_CKERNEL_DIR",
    os.path.join(tempfile.gettempdir(), "ir_base_ray_ckernels"))
_lock = threading.Lock()
_libs: dict[str, ctypes.CDLL | None] = {}


def _compiler() -> str | None:
    for cand in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cand, "--version"], capture_output=True,
                           timeout=30)
            return cand
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def available() -> bool:
    if os.environ.get("IRBR_NO_CKERNELS"):
        return False
    return _compiler() is not None


def load(name: str, source: str) -> ctypes.CDLL | None:
    """Compile (once) and dlopen the kernel; None when unavailable."""
    if os.environ.get("IRBR_NO_CKERNELS"):
        return None
    digest = hashlib.sha256(source.encode()).hexdigest()[:16]
    key = f"{name}-{digest}"
    with _lock:
        if key in _libs:
            return _libs[key]
        so_path = os.path.join(_CACHE_DIR, key + ".so")
        try:
            if not os.path.exists(so_path):
                cc = _compiler()
                if cc is None:
                    _libs[key] = None
                    return None
                os.makedirs(_CACHE_DIR, exist_ok=True)
                fd, c_path = tempfile.mkstemp(suffix=".c", dir=_CACHE_DIR)
                with os.fdopen(fd, "w") as f:
                    f.write(source)
                tmp_so = c_path[:-2] + ".so.tmp"
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp_so, so_path)
                os.unlink(c_path)
            lib = ctypes.CDLL(so_path)
        except (OSError, subprocess.SubprocessError):
            lib = None
        _libs[key] = lib
        return lib


# ---------------------------------------------------------------------------
# Rabin-Karp document fingerprints (base 257, mod 2^61-1) — the C twin of
# stages/textstats.FingerprintActor's Python loop. Mersenne-prime modulus
# makes mulmod a single 128-bit multiply + fold.
# ---------------------------------------------------------------------------

_FINGERPRINT_SRC = r"""
#include <stdint.h>

#define MOD ((((uint64_t)1) << 61) - 1)

static inline uint64_t mulmod(uint64_t a, uint64_t b) {
    unsigned __int128 p = (unsigned __int128)a * b;
    uint64_t s = (uint64_t)(p & MOD) + (uint64_t)(p >> 61);
    if (s >= MOD) s -= MOD;
    return s;
}

void fingerprints(const uint8_t *data, const int64_t *offsets,
                  int64_t n_docs, int64_t window, uint64_t pow_w,
                  uint64_t *full_fp, uint64_t *min_fp) {
    for (int64_t d = 0; d < n_docs; d++) {
        const uint8_t *p = data + offsets[d];
        int64_t n = offsets[d + 1] - offsets[d];
        uint64_t h = 0;
        for (int64_t i = 0; i < n; i++) {
            h = mulmod(h, 257) + p[i];
            if (h >= MOD) h -= MOD;
        }
        full_fp[d] = h;
        if (n < window) { min_fp[d] = h; continue; }
        uint64_t rh = 0;
        for (int64_t i = 0; i < window; i++) {
            rh = mulmod(rh, 257) + p[i];
            if (rh >= MOD) rh -= MOD;
        }
        uint64_t mn = rh;
        for (int64_t i = window; i < n; i++) {
            uint64_t sub = mulmod((uint64_t)p[i - window], pow_w);
            rh += MOD - sub;              /* (rh - sub) mod MOD, rh < MOD */
            if (rh >= MOD) rh -= MOD;
            rh = mulmod(rh, 257) + p[i];
            if (rh >= MOD) rh -= MOD;
            if (rh < mn) mn = rh;
        }
        min_fp[d] = mn;
    }
}
"""

_fp_lib = None
_fp_tried = False


def fingerprint_kernel():
    """ctypes handle for the fingerprint kernel, or None (use Python path)."""
    global _fp_lib, _fp_tried
    if not _fp_tried:
        _fp_tried = True
        lib = load("fingerprints", _FINGERPRINT_SRC)
        if lib is not None:
            lib.fingerprints.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
            lib.fingerprints.restype = None
        _fp_lib = lib
    return _fp_lib


# ---------------------------------------------------------------------------
# Batched MD5 prefix-64 (big-endian first 8 digest bytes per item) — the
# dedup-signature hash device (MinHash shingles, SimHash tokens). MD5 per
# RFC 1321 (public); one C call per Arrow string batch replaces a Python
# hashlib call per shingle/token.
# ---------------------------------------------------------------------------

_MD5_SRC = r"""
#include <stdint.h>
#include <string.h>

/* RFC 1321 constants: K[i] = floor(2^32 * |sin(i+1)|), and the per-round
   left-rotate amounts. */
static const uint32_t K[64] = {
0xd76aa478,0xe8c7b756,0x242070db,0xc1bdceee,0xf57c0faf,0x4787c62a,
0xa8304613,0xfd469501,0x698098d8,0x8b44f7af,0xffff5bb1,0x895cd7be,
0x6b901122,0xfd987193,0xa679438e,0x49b40821,0xf61e2562,0xc040b340,
0x265e5a51,0xe9b6c7aa,0xd62f105d,0x02441453,0xd8a1e681,0xe7d3fbc8,
0x21e1cde6,0xc33707d6,0xf4d50d87,0x455a14ed,0xa9e3e905,0xfcefa3f8,
0x676f02d9,0x8d2a4c8a,0xfffa3942,0x8771f681,0x6d9d6122,0xfde5380c,
0xa4beea44,0x4bdecfa9,0xf6bb4b60,0xbebfbc70,0x289b7ec6,0xeaa127fa,
0xd4ef3085,0x04881d05,0xd9d4d039,0xe6db99e5,0x1fa27cf8,0xc4ac5665,
0xf4292244,0x432aff97,0xab9423a7,0xfc93a039,0x655b59c3,0x8f0ccc92,
0xffeff47d,0x85845dd1,0x6fa87e4f,0xfe2ce6e0,0xa3014314,0x4e0811a1,
0xf7537e82,0xbd3af235,0x2ad7d2bb,0xeb86d391};
static const uint32_t S[64] = {
7,12,17,22,7,12,17,22,7,12,17,22,7,12,17,22,
5,9,14,20,5,9,14,20,5,9,14,20,5,9,14,20,
4,11,16,23,4,11,16,23,4,11,16,23,4,11,16,23,
6,10,15,21,6,10,15,21,6,10,15,21,6,10,15,21};

static inline uint32_t rotl(uint32_t x, uint32_t c) {
    return (x << c) | (x >> (32 - c));
}

static void md5_block(uint32_t st[4], const uint8_t *p) {
    uint32_t M[16];
    for (int i = 0; i < 16; i++)
        M[i] = (uint32_t)p[4*i] | ((uint32_t)p[4*i+1] << 8) |
               ((uint32_t)p[4*i+2] << 16) | ((uint32_t)p[4*i+3] << 24);
    uint32_t A = st[0], B = st[1], C = st[2], D = st[3];
    for (int i = 0; i < 64; i++) {
        uint32_t F; int g;
        if (i < 16)      { F = (B & C) | (~B & D);        g = i; }
        else if (i < 32) { F = (D & B) | (~D & C);        g = (5*i + 1) & 15; }
        else if (i < 48) { F = B ^ C ^ D;                 g = (3*i + 5) & 15; }
        else             { F = C ^ (B | ~D);              g = (7*i) & 15; }
        F = F + A + K[i] + M[g];
        A = D; D = C; C = B;
        B = B + rotl(F, S[i]);
    }
    st[0] += A; st[1] += B; st[2] += C; st[3] += D;
}

/* out[i] = first 8 digest bytes of md5(data[offsets[i]..offsets[i+1])),
   big-endian — matches int.from_bytes(md5(s).digest()[:8], 'big'). */
void md5_prefix64(const uint8_t *data, const int64_t *offsets, int64_t n,
                  uint64_t *out) {
    for (int64_t it = 0; it < n; it++) {
        const uint8_t *msg = data + offsets[it];
        uint64_t len = (uint64_t)(offsets[it + 1] - offsets[it]);
        uint32_t st[4] = {0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476};
        uint64_t i = 0;
        for (; i + 64 <= len; i += 64) md5_block(st, msg + i);
        uint8_t tail[128];
        uint64_t rem = len - i;
        memcpy(tail, msg + i, rem);
        tail[rem++] = 0x80;
        uint64_t tlen = (rem <= 56) ? 64 : 128;
        memset(tail + rem, 0, tlen - 8 - rem);
        uint64_t bits = len << 3;
        for (int b = 0; b < 8; b++) tail[tlen - 8 + b] = (uint8_t)(bits >> (8*b));
        md5_block(st, tail);
        if (tlen == 128) md5_block(st, tail + 64);
        /* digest bytes are little-endian words; big-endian uint64 of the
           first 8 bytes = bytes of st[0] then st[1] in digest order. */
        uint64_t v = 0;
        const uint32_t w[2] = {st[0], st[1]};
        for (int b = 0; b < 8; b++)
            v = (v << 8) | (uint8_t)(w[b >> 2] >> (8 * (b & 3)));
        out[it] = v;
    }
}
"""

_md5_lib = None
_md5_tried = False


def md5_kernel():
    global _md5_lib, _md5_tried
    if not _md5_tried:
        _md5_tried = True
        lib = load("md5prefix", _MD5_SRC)
        if lib is not None:
            lib.md5_prefix64.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint64)]
            lib.md5_prefix64.restype = None
        _md5_lib = lib
    return _md5_lib


def md5_prefix64_strings(arr) -> "object":
    """uint64 md5-prefix per element of a pyarrow string array (one C call;
    hashlib loop fallback). Returns np.ndarray[uint64] aligned with arr."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, (list, tuple)):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lib = md5_kernel()
    if lib is None:
        return np.array(
            [int.from_bytes(hashlib.md5((s or "").encode()).digest()[:8], "big")
             for s in arr.to_pylist()], dtype=np.uint64)
    if arr.null_count:
        arr = arr.fill_null("")
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.ascontiguousarray(
        np.frombuffer(bufs[1], dtype=off_dt)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64))
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    out = np.empty(len(arr), dtype=np.uint64)
    lib.md5_prefix64(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(arr), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


# ---------------------------------------------------------------------------
# LDA collapsed-Gibbs sweep — the C twin of pipelines/lda._gibbs_epoch's
# per-token walk. Consumes one pre-drawn uniform per token (the Python side
# batches rng.random(n), which produces the identical Philox stream), and
# performs the identical IEEE float64 op sequence (mult, div, sequential
# cumsum, searchsorted-left) so 1-block == serial stays bit-exact.
# ---------------------------------------------------------------------------

_LDA_SRC = r"""
#include <stdint.h>

void lda_sweep(const int64_t *words, const int64_t *docs, int64_t n,
               int64_t *z, double *doc_sstat, double *wts, double *m_sstat,
               const double *us, double *cache, int64_t K, int64_t V) {
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = words[i], d = docs[i], t = z[i];
        doc_sstat[d * K + t] -= 1.0;
        wts[t * V + wid] -= 1.0;
        m_sstat[t] -= 1.0;
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            /* same op order as numpy: (a*b)/c per element, then running add */
            cum += doc_sstat[d * K + k] * wts[k * V + wid] / m_sstat[k];
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t tn = K - 1;
        for (int64_t k = 0; k < K; k++) {
            if (cache[k] >= u) { tn = k; break; }   /* searchsorted left */
        }
        z[i] = tn;
        doc_sstat[d * K + tn] += 1.0;
        wts[tn * V + wid] += 1.0;
        m_sstat[tn] += 1.0;
    }
}
"""

_lda_lib = None
_lda_tried = False


def lda_kernel():
    global _lda_lib, _lda_tried
    if not _lda_tried:
        _lda_tried = True
        lib = load("ldasweep", _LDA_SRC)
        if lib is not None:
            P = ctypes.POINTER
            lib.lda_sweep.argtypes = [
                P(ctypes.c_int64), P(ctypes.c_int64), ctypes.c_int64,
                P(ctypes.c_int64), P(ctypes.c_double), P(ctypes.c_double),
                P(ctypes.c_double), P(ctypes.c_double), P(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64]
            lib.lda_sweep.restype = None
        _lda_lib = lib
    return _lda_lib


# ---------------------------------------------------------------------------
# DCM-LDA per-doc Gibbs sweep — C twin of pipelines/dcmlda._gibbs_doc
# (doc-local count tables, searchsorted-RIGHT walk). Same pre-drawn-uniform
# contract as lda_sweep.
# ---------------------------------------------------------------------------

_DCM_SRC = r"""
#include <stdint.h>

void dcm_sweep(const int64_t *words, int64_t n, int64_t *z,
               double *n_dk, double *n_dkw,
               const double *alpha, const double *beta_k,
               const double *total_beta, const double *us, double *cache,
               int64_t K, int64_t V) {
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = words[i], t = z[i];
        n_dk[t] -= 1.0;
        n_dkw[t * V + wid] -= 1.0;
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            cum += (n_dk[k] + alpha[k]) * (n_dkw[k * V + wid] + beta_k[k * V + wid])
                   / (n_dk[k] + total_beta[k]);
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t tn = K - 1;
        for (int64_t k = 0; k < K; k++) {
            if (cache[k] > u) { tn = k; break; }    /* searchsorted right */
        }
        z[i] = tn;
        n_dk[tn] += 1.0;
        n_dkw[tn * V + wid] += 1.0;
    }
}
"""

_dcm_lib = None
_dcm_tried = False


def dcm_kernel():
    global _dcm_lib, _dcm_tried
    if not _dcm_tried:
        _dcm_tried = True
        lib = load("dcmsweep", _DCM_SRC)
        if lib is not None:
            P = ctypes.POINTER
            lib.dcm_sweep.argtypes = [
                P(ctypes.c_int64), ctypes.c_int64, P(ctypes.c_int64),
                P(ctypes.c_double), P(ctypes.c_double), P(ctypes.c_double),
                P(ctypes.c_double), P(ctypes.c_double), P(ctypes.c_double),
                P(ctypes.c_double), ctypes.c_int64, ctypes.c_int64]
            lib.dcm_sweep.restype = None
        _dcm_lib = lib
    return _dcm_lib
