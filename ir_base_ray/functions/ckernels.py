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

static void md5_state(const uint8_t *msg, uint64_t len, uint32_t st[4]) {
    st[0] = 0x67452301; st[1] = 0xefcdab89;
    st[2] = 0x98badcfe; st[3] = 0x10325476;
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
}

/* big-endian uint64 of 8 digest bytes starting at word w0: digest bytes are
   the state words little-endian, so byte b of the pair (w0, w0+1) is
   st[w0 + (b>>2)] >> (8*(b&3)). */
static inline uint64_t digest_be64(const uint32_t *st, int w0) {
    uint64_t v = 0;
    for (int b = 0; b < 8; b++)
        v = (v << 8) | (uint8_t)(st[w0 + (b >> 2)] >> (8 * (b & 3)));
    return v;
}

/* out[i] = first 8 digest bytes of md5(data[offsets[i]..offsets[i+1])),
   big-endian — matches int.from_bytes(md5(s).digest()[:8], 'big'). */
void md5_prefix64(const uint8_t *data, const int64_t *offsets, int64_t n,
                  uint64_t *out) {
    for (int64_t it = 0; it < n; it++) {
        uint32_t st[4];
        md5_state(data + offsets[it],
                  (uint64_t)(offsets[it + 1] - offsets[it]), st);
        out[it] = digest_be64(st, 0);
    }
}

/* full 128-bit digest as two big-endian uint64 halves — matches
   int.from_bytes(md5(s).digest()[:8], 'big') / digest()[8:]. */
void md5_full128(const uint8_t *data, const int64_t *offsets, int64_t n,
                 uint64_t *out_hi, uint64_t *out_lo) {
    for (int64_t it = 0; it < n; it++) {
        uint32_t st[4];
        md5_state(data + offsets[it],
                  (uint64_t)(offsets[it + 1] - offsets[it]), st);
        out_hi[it] = digest_be64(st, 0);
        out_lo[it] = digest_be64(st, 2);
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
            lib.md5_full128.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64)]
            lib.md5_full128.restype = None
        _md5_lib = lib
    return _md5_lib


def _string_ckernel_bufs(arr):
    """(data, offsets) int64-offset views over a pyarrow string array's UTF-8
    buffers, zero-copy except the offset upcast."""
    import numpy as np
    import pyarrow as pa

    if arr.null_count:
        arr = arr.fill_null("")
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.ascontiguousarray(
        np.frombuffer(bufs[1], dtype=off_dt)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64))
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    return data, offsets


def _as_string_array(arr):
    import pyarrow as pa

    if isinstance(arr, (list, tuple)):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def md5_prefix64_strings(arr) -> "object":
    """uint64 md5-prefix per element of a pyarrow string array (one C call;
    hashlib loop fallback). Returns np.ndarray[uint64] aligned with arr."""
    import numpy as np

    arr = _as_string_array(arr)
    lib = md5_kernel()
    if lib is None:
        return np.array(
            [int.from_bytes(hashlib.md5((s or "").encode()).digest()[:8], "big")
             for s in arr.to_pylist()], dtype=np.uint64)
    data, offsets = _string_ckernel_bufs(arr)
    out = np.empty(len(arr), dtype=np.uint64)
    lib.md5_prefix64(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(arr), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def md5_hash128_strings(arr) -> "object":
    """Full 128-bit md5 per element of a pyarrow string array as two aligned
    np.ndarray[uint64] halves ``(hi, lo)`` — big-endian ``digest()[:8]`` /
    ``digest()[8:]``. Collision-safe content identity at 10^12 docs (a 64-bit
    prefix birthday-collides at ~10^10). One C call per batch; hashlib loop
    fallback."""
    import numpy as np

    arr = _as_string_array(arr)
    lib = md5_kernel()
    if lib is None:
        hi = np.empty(len(arr), dtype=np.uint64)
        lo = np.empty(len(arr), dtype=np.uint64)
        for i, s in enumerate(arr.to_pylist()):
            d = hashlib.md5((s or "").encode()).digest()
            hi[i] = int.from_bytes(d[:8], "big")
            lo[i] = int.from_bytes(d[8:], "big")
        return hi, lo
    data, offsets = _string_ckernel_bufs(arr)
    hi = np.empty(len(arr), dtype=np.uint64)
    lo = np.empty(len(arr), dtype=np.uint64)
    lib.md5_full128(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(arr), hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return hi, lo


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


# ---------------------------------------------------------------------------
# ACCTM-family Gibbs sweeps — C twins of pipelines/acctm._sample_unit
# (ACCTM / corrLDA_Gibbs) and ._sample_unit_c (ACCTM_C / _CZ / _CHard /
# _CZLR). Same pre-drawn-uniform contract as lda_sweep (one uniform per
# token, batched rng.random(n) == the per-token Philox stream), and the
# identical IEEE float64 op sequence as the numpy fallback so
# 1-block == serial and kernel == python stay bit-exact. The draw walk is
# an exact np.searchsorted binary-search emulation (NOT a linear scan):
# the cz/corr influence ratio overflows to inf by design (Java-double
# parity) and searchsorted's bisection is what the Python path does.
# ---------------------------------------------------------------------------

_ACCTM_SRC = r"""
#include <stdint.h>
#include <math.h>
#include <stddef.h>

/* np.searchsorted(a, v, side='left'/'right') bisection. */
static int64_t walk_left(const double *cum, int64_t n, double v) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (cum[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}
static int64_t walk_right(const double *cum, int64_t n, double v) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (cum[mid] <= v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

/* pipelines/acctm._gamma_func_ratio: prod over n=1..nc of
   1 + mu_dp/((A + n) - 1); np.prod is a sequential multiply. */
static double gamma_func_ratio(int64_t nc, double mu_dp, double A) {
    if (nc == 0) return 1.0;
    double r = 1.0;
    for (int64_t n = 1; n <= nc; n++)
        r *= 1.0 + mu_dp / ((A + (double)n) - 1.0);
    return r;
}

/* pipelines/acctm._influence_ratio_cz (s = 1e-20; overflow -> inf is the
   reference's Java-double behaviour, kept). np.float64 ** int == pow(). */
static double cz_ratio(int64_t njc, double njp, int64_t n1c, double n1p) {
    const double s = 1e-20;
    double r = pow((n1p + s) / ((n1p + 1.0) + s), (double)n1c);
    r *= pow(((njp + 1.0) + s) / (njp + s), (double)njc);
    return r;
}

/* Parent sweep. imode: 0 = gamma-func influence (ACCTM / ACCTM_C),
   1 = cz ratio (corrLDA / ACCTM_CZ / _CZLR). npt > 0 fixes the mu
   denominator (ACCTM_C's getDocInferLength); npt <= 0 recomputes
   sum(p_sstat) per token (ACCTM). side: 0 left (ACCTM*), 1 right (corr).
   ccounts = nc x K child topic counts (c_sstat or xt0). */
void acctm_parent(const int64_t *p_words, int64_t n, int64_t *p_z,
                  double *p_sstat, double *wts, double *m_sstat,
                  int64_t K, int64_t V, int64_t nc,
                  const double *ccounts, const double *mu,
                  double alpha, double npt, int64_t imode, int64_t side,
                  const double *us, double *cache, double *infl)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = p_words[i], t = p_z[i];
        p_sstat[t] -= 1.0;
        wts[t * V + wid] -= 1.0;
        m_sstat[t] -= 1.0;
        double topic_sum = 0.0;
        if (imode == 0 && npt <= 0.0)    /* counts: any sum order is exact */
            for (int64_t k = 0; k < K; k++) topic_sum += p_sstat[k];
        for (int64_t k = 0; k < K; k++) infl[k] = 1.0;
        for (int64_t c = 0; c < nc; c++) {
            const double *cc = ccounts + c * K;
            if (imode == 1) {
                for (int64_t k = 1; k < K; k++)
                    infl[k] *= cz_ratio((int64_t)cc[k], p_sstat[k],
                                        (int64_t)cc[0], p_sstat[0]);
            } else {
                double mu_dp = mu[c] / (npt > 0.0 ? npt : topic_sum);
                double denom = gamma_func_ratio((int64_t)cc[0], mu_dp,
                                                alpha + p_sstat[0] * mu_dp);
                for (int64_t k = 1; k < K; k++)
                    infl[k] *= gamma_func_ratio((int64_t)cc[k], mu_dp,
                                                alpha + p_sstat[k] * mu_dp)
                               / denom;
            }
        }
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            /* ((wts/m) * (alpha + p_sstat)) * infl, then sequential cumsum */
            cum += ((wts[k * V + wid] / m_sstat[k]) * (alpha + p_sstat[k]))
                   * infl[k];
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t tn = side ? walk_right(cache, K, u) : walk_left(cache, K, u);
        if (tn >= K) tn = K - 1;
        p_z[i] = tn;
        p_sstat[tn] += 1.0;
        wts[tn * V + wid] += 1.0;
        m_sstat[tn] += 1.0;
    }
}

/* Child sweep. mode: 0 ACCTM, 1 corrLDA (both no x-switch; csstat =
   c_sstat), 2 ACCTM_C / _CHard (in_par non-NULL = CHard forced-global
   tokens), 3 ACCTM_CZ, 4 ACCTM_CZLR (logistic x factors). For x modes
   csstat = xt0, local/xs/local_total are live. cache has K+1 slots. */
void acctm_child(const int64_t *c_words, int64_t n, int64_t *c_z,
                 int64_t *c_x,
                 double *wts, double *m_sstat, int64_t K, int64_t V,
                 double alpha, double k_alpha,
                 const double *p_sstat, double p_sum, double mu,
                 double *csstat, double *local, double *xs,
                 double *local_total, double gamma0, double gamma1,
                 const double *feats, const double *xw,
                 const uint8_t *in_par,
                 const double *us, double *cache, int64_t mode)
{
    const double s20 = 1e-20;
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = c_words[i], t = c_z[i];
        if (mode <= 1) {
            csstat[t] -= 1.0;
            wts[t * V + wid] -= 1.0;
            m_sstat[t] -= 1.0;
            double c_sum = 0.0;
            for (int64_t k = 0; k < K; k++) c_sum += csstat[k];
            double cum = 0.0;
            for (int64_t k = 0; k < K; k++) {
                double v;
                if (mode == 1)
                    v = ((wts[k * V + wid] / m_sstat[k]) * (p_sstat[k] + s20))
                        / (p_sum + s20 * (double)K);
                else
                    v = ((wts[k * V + wid] / m_sstat[k])
                         * ((alpha + (mu * p_sstat[k]) / p_sum) + csstat[k]))
                        / ((k_alpha + mu) + c_sum);
                cum += v;
                cache[k] = cum;
            }
            double u = cum * us[i];
            int64_t tn = (mode == 1) ? walk_right(cache, K, u)
                                     : walk_left(cache, K, u);
            if (tn >= K) tn = K - 1;
            c_z[i] = tn;
            csstat[tn] += 1.0;
            wts[tn * V + wid] += 1.0;
            m_sstat[tn] += 1.0;
            continue;
        }
        int64_t x = c_x[i];
        if (x == 0) {
            csstat[t] -= 1.0;
            xs[0] -= 1.0;
            wts[t * V + wid] -= 1.0;
            m_sstat[t] -= 1.0;
        } else {
            local[wid] -= 1.0;
            xs[1] -= 1.0;
            local_total[0] -= 1.0;
        }
        if (in_par != NULL && in_par[i]) {
            /* CHard: parent-shared word stays global, no x factors */
            double cum = 0.0;
            for (int64_t k = 0; k < K; k++) {
                cum += ((wts[k * V + wid] / m_sstat[k])
                        * ((alpha + (mu * p_sstat[k]) / p_sum) + csstat[k]))
                       / ((k_alpha + mu) + xs[0]);
                cache[k] = cum;
            }
            double u = cum * us[i];
            int64_t tn = walk_left(cache, K, u);
            if (tn >= K) tn = K - 1;
            c_x[i] = 0;
            c_z[i] = tn;
            csstat[tn] += 1.0;
            xs[0] += 1.0;
            wts[tn * V + wid] += 1.0;
            m_sstat[tn] += 1.0;
            continue;
        }
        double pl0, pl1;
        if (mode == 4) {
            double dot = (feats[2 * i] * xw[0]) + (feats[2 * i + 1] * xw[1]);
            pl0 = 1.0 / (1.0 + exp(dot));      /* xProb4Word(0, .) */
            pl1 = 1.0 / (1.0 + exp(-dot));     /* xProb4Word(1, .) */
        } else {
            pl0 = gamma0 + xs[0];
            pl1 = gamma1 + xs[1];
        }
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            double v;
            if (mode >= 3)
                v = (((wts[k * V + wid] / m_sstat[k]) * (p_sstat[k] + s20))
                     / (p_sum + s20 * (double)K)) * pl0;
            else
                v = (((wts[k * V + wid] / m_sstat[k])
                      * ((alpha + (mu * p_sstat[k]) / p_sum) + csstat[k]))
                     / ((k_alpha + mu) + xs[0])) * pl0;
            cum += v;
            cache[k] = cum;
        }
        cum += (local[wid] / local_total[0]) * pl1;
        cache[K] = cum;
        double u = cum * us[i];
        int64_t tn = walk_left(cache, K + 1, u);
        if (tn >= K + 1) tn = K;
        if (tn < K) {
            c_x[i] = 0;
            c_z[i] = tn;
            csstat[tn] += 1.0;
            xs[0] += 1.0;
            wts[tn * V + wid] += 1.0;
            m_sstat[tn] += 1.0;
        } else {
            c_x[i] = 1;
            c_z[i] = K;
            local[wid] += 1.0;
            xs[1] += 1.0;
            local_total[0] += 1.0;
        }
    }
}
"""

_acctm_lib = None
_acctm_tried = False


def acctm_kernel():
    global _acctm_lib, _acctm_tried
    if not _acctm_tried:
        _acctm_tried = True
        lib = load("acctmsweep", _ACCTM_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, f64 = ctypes.c_int64, ctypes.c_double
            lib.acctm_parent.argtypes = [
                P(i64), i64, P(i64), P(f64), P(f64), P(f64), i64, i64, i64,
                P(f64), P(f64), f64, f64, i64, i64, P(f64), P(f64), P(f64)]
            lib.acctm_parent.restype = None
            lib.acctm_child.argtypes = [
                P(i64), i64, P(i64), P(i64), P(f64), P(f64), i64, i64,
                f64, f64, P(f64), f64, f64, P(f64), P(f64), P(f64), P(f64),
                f64, f64, P(f64), P(f64), P(ctypes.c_uint8), P(f64), P(f64),
                i64]
            lib.acctm_child.restype = None
        _acctm_lib = lib
    return _acctm_lib


# ---------------------------------------------------------------------------
# DCM-CorrLDA Gibbs sweep — C twin of pipelines/dcmcorrlda._sample_unit
# (per-parent DCM tables: word_topic K×V, topic_stat K, vector α/α_c and
# K×V β). Same pre-drawn-uniform + bit-exact IEEE contract as acctm_*.
# ---------------------------------------------------------------------------

_DCMCORR_SRC = r"""
#include <stdint.h>

static int64_t walk_left(const double *cum, int64_t n, double v) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (cum[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

static double gamma_func_ratio(int64_t nc, double mu_dp, double A) {
    if (nc == 0) return 1.0;
    double r = 1.0;
    for (int64_t n = 1; n <= nc; n++)
        r *= 1.0 + mu_dp / ((A + (double)n) - 1.0);
    return r;
}

void dcmcorr_parent(const int64_t *p_words, int64_t n, int64_t *p_z,
                    double *npar, double *wt, double *ts,
                    const double *beta, const double *total_beta,
                    const double *alpha, double denom_doc,
                    int64_t K, int64_t V, int64_t nc,
                    const double *ccounts, const double *mu, double p_len,
                    const double *us, double *cache, double *infl)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = p_words[i], t = p_z[i];
        npar[t] -= 1.0;
        ts[t] -= 1.0;
        wt[t * V + wid] -= 1.0;
        for (int64_t k = 0; k < K; k++) infl[k] = 1.0;
        for (int64_t c = 0; c < nc; c++) {
            const double *cc = ccounts + c * K;
            double mu_dp = mu[c] / p_len;
            double denom = gamma_func_ratio((int64_t)cc[0], mu_dp,
                                            alpha[0] + npar[0] * mu_dp);
            for (int64_t k = 1; k < K; k++)
                infl[k] *= gamma_func_ratio((int64_t)cc[k], mu_dp,
                                            alpha[k] + npar[k] * mu_dp)
                           / denom;
        }
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            /* (((wt+β)/(ts+tβ)) * (npar+α)) / (n_uniq+tα) * infl */
            cum += ((((wt[k * V + wid] + beta[k * V + wid])
                      / (ts[k] + total_beta[k]))
                     * (npar[k] + alpha[k])) / denom_doc) * infl[k];
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t tn = walk_left(cache, K, u);
        if (tn >= K) tn = K - 1;
        p_z[i] = tn;
        npar[tn] += 1.0;
        ts[tn] += 1.0;
        wt[tn * V + wid] += 1.0;
    }
}

void dcmcorr_child(const int64_t *c_words, int64_t n, int64_t *c_z,
                   double *nch, double *wt, double *ts,
                   const double *beta, const double *total_beta,
                   const double *alpha_c, double total_alpha_c,
                   const double *npar, double mu,
                   int64_t K, int64_t V,
                   const double *us, double *cache)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = c_words[i], t = c_z[i];
        wt[t * V + wid] -= 1.0;
        ts[t] -= 1.0;
        nch[t] -= 1.0;
        double p_sum = 0.0, c_sum = 0.0;     /* counts: order-exact */
        for (int64_t k = 0; k < K; k++) { p_sum += npar[k]; c_sum += nch[k]; }
        double mu_dp = mu / p_sum;
        double denom = (total_alpha_c + mu_dp * p_sum) + c_sum;
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            cum += (((wt[k * V + wid] + beta[k * V + wid])
                     / (ts[k] + total_beta[k]))
                    * ((alpha_c[k] + mu_dp * npar[k]) + nch[k])) / denom;
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t tn = walk_left(cache, K, u);
        if (tn >= K) tn = K - 1;
        c_z[i] = tn;
        nch[tn] += 1.0;
        ts[tn] += 1.0;
        wt[tn * V + wid] += 1.0;
    }
}
"""

_dcmcorr_lib = None
_dcmcorr_tried = False


def dcmcorr_kernel():
    global _dcmcorr_lib, _dcmcorr_tried
    if not _dcmcorr_tried:
        _dcmcorr_tried = True
        lib = load("dcmcorrsweep", _DCMCORR_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, f64 = ctypes.c_int64, ctypes.c_double
            lib.dcmcorr_parent.argtypes = [
                P(i64), i64, P(i64), P(f64), P(f64), P(f64), P(f64), P(f64),
                P(f64), f64, i64, i64, i64, P(f64), P(f64), f64, P(f64),
                P(f64), P(f64)]
            lib.dcmcorr_parent.restype = None
            lib.dcmcorr_child.argtypes = [
                P(i64), i64, P(i64), P(f64), P(f64), P(f64), P(f64), P(f64),
                P(f64), f64, P(f64), f64, i64, i64, P(f64), P(f64)]
            lib.dcmcorr_child.restype = None
        _dcmcorr_lib = lib
    return _dcmcorr_lib


# ---------------------------------------------------------------------------
# sparseDCMLDA sweeps — C twins of pipelines/sparsedcmlda._sample_topics
# (sparse off-by-one walk / cluster corrected walk) and ._sample_indicators
# (per-topic on/off Gibbs with the L-term sequential ratio product). Same
# bit-exact contract as the other sweep kernels. _sample_indicators draws
# ONE uniform only for topics with n_dk[k]==0 — the wrapper pre-draws
# exactly that many (n_dk is read-only during the indicator sweep, so the
# draw count is known up front; identical Philox stream).
# ---------------------------------------------------------------------------

_SPARSEDCM_SRC = r"""
#include <stdint.h>

static int64_t walk_left(const double *cum, int64_t n, double v) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (cum[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

/* cluster==0: doc-local word factor, sparse off-by-one walk (min(j+1,K-1)).
   cluster==1: cluster tables (cl_wt K*V, cl_ts K) carry the word factor and
   are co-updated; corrected walk (min(j,K-1)). */
void sparse_topics(const int64_t *words, int64_t n, int64_t *z,
                   double *n_dk, double *n_dkw,
                   double *cl_wt, double *cl_ts,
                   const double *beta, const double *total_beta,
                   const double *alpha, const double *xf, double alpha_doc,
                   double mu, int64_t K, int64_t V, int64_t cluster,
                   const double *us, double *cache)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = words[i], t = z[i];
        n_dk[t] -= 1.0;
        n_dkw[t * V + wid] -= 1.0;
        if (cluster) {
            cl_wt[t * V + wid] -= 1.0;
            cl_ts[t] -= 1.0;
        }
        double nsum = 0.0;                       /* counts: order-exact */
        for (int64_t k = 0; k < K; k++) nsum += n_dk[k];
        double den = alpha_doc + nsum;
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            double wf = cluster
                ? (cl_wt[k * V + wid] + mu * beta[k * V + wid])
                  / (cl_ts[k] + mu * total_beta[k])
                : (n_dkw[k * V + wid] + mu * beta[k * V + wid])
                  / (n_dk[k] + mu * total_beta[k]);
            cum += xf[k] * (((n_dk[k] + alpha[k]) / den) * wf);
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t j = walk_left(cache, K, u);
        int64_t tn = cluster ? (j < K - 1 ? j : K - 1)
                             : (j + 1 < K - 1 ? j + 1 : K - 1);
        z[i] = tn;
        n_dk[tn] += 1.0;
        n_dkw[tn * V + wid] += 1.0;
        if (cluster) {
            cl_wt[tn * V + wid] += 1.0;
            cl_ts[tn] += 1.0;
        }
    }
}

/* x: uint8 in/out; alpha_doc/n_on: 1-elem in/out; us consumed only at
   topics with n_dk[k] <= 0 (same conditional-draw order as the Python). */
void sparse_indicators(uint8_t *x, const double *n_dk, const double *alpha,
                       int64_t K, int64_t L, double s_param, double t_param,
                       double *alpha_doc, int64_t *n_on, const double *us)
{
    int64_t pos = 0;
    for (int64_t k = 0; k < K; k++) {
        if (x[k]) {
            n_on[0] -= 1;
            alpha_doc[0] -= alpha[k];
        }
        int xk;
        if (n_dk[k] > 0.0) {
            xk = 1;
        } else {
            double term1 = alpha_doc[0], term2 = alpha[k];
            double q = (s_param + (double)n_on[0])
                       / (((t_param + (double)K) - 1.0) - (double)n_on[0]);
            double t12 = term1 + term2;
            for (int64_t i = 0; i < L; i++)
                q *= (term1 + (double)i) / (t12 + (double)i);
            xk = !((q + 1.0) * us[pos++] < 1.0);
        }
        x[k] = (uint8_t)xk;
        if (xk) {
            n_on[0] += 1;
            alpha_doc[0] += alpha[k];
        }
    }
}
"""

_sparse_lib = None
_sparse_tried = False


def sparsedcm_kernel():
    global _sparse_lib, _sparse_tried
    if not _sparse_tried:
        _sparse_tried = True
        lib = load("sparsedcm", _SPARSEDCM_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, f64, u8 = ctypes.c_int64, ctypes.c_double, ctypes.c_uint8
            lib.sparse_topics.argtypes = [
                P(i64), i64, P(i64), P(f64), P(f64), P(f64), P(f64), P(f64),
                P(f64), P(f64), P(f64), f64, f64, i64, i64, i64, P(f64),
                P(f64)]
            lib.sparse_topics.restype = None
            lib.sparse_indicators.argtypes = [
                P(u8), P(f64), P(f64), i64, i64, f64, f64, P(f64), P(i64),
                P(f64)]
            lib.sparse_indicators.restype = None
        _sparse_lib = lib
    return _sparse_lib


_SPARSELDA_SRC = r"""
#include <stdint.h>

static int64_t walk_left(const double *cum, int64_t n, double v) {
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (cum[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

/* sparseLDA.sampleTopicAssignment (sparseLDA.java:65-107): GLOBAL
   word-topic tables (wts K*V, m_sstat K) carry the word factor and are
   co-updated; doc factor (n_dk[k]+alpha)/(alpha_doc + sum n_dk) masked by
   the doc's on/off indicators xf; the reference's off-by-one subtract walk
   (tid = searchsorted_left + 1, capped at K-1 -- topic 0 never
   re-sampled). */
void sparselda_topics(const int64_t *words, int64_t n, int64_t *z,
                      double *n_dk, double *wts, double *m_sstat,
                      double alpha, const double *xf, double alpha_doc,
                      int64_t K, int64_t V, const double *us, double *cache)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = words[i], t = z[i];
        n_dk[t] -= 1.0;
        wts[t * V + wid] -= 1.0;
        m_sstat[t] -= 1.0;
        double nsum = 0.0;                   /* counts: order-exact */
        for (int64_t k = 0; k < K; k++) nsum += n_dk[k];
        double den = alpha_doc + nsum;
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            cum += xf[k] * (((n_dk[k] + alpha) / den)
                            * (wts[k * V + wid] / m_sstat[k]));
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t j = walk_left(cache, K, u);
        int64_t tn = j + 1 < K - 1 ? j + 1 : K - 1;
        z[i] = tn;
        n_dk[tn] += 1.0;
        wts[tn * V + wid] += 1.0;
        m_sstat[tn] += 1.0;
    }
}
"""

_sparselda_lib = None
_sparselda_tried = False


def sparselda_kernel():
    global _sparselda_lib, _sparselda_tried
    if not _sparselda_tried:
        _sparselda_tried = True
        lib = load("sparselda", _SPARSELDA_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, f64 = ctypes.c_int64, ctypes.c_double
            lib.sparselda_topics.argtypes = [
                P(i64), i64, P(i64), P(f64), P(f64), P(f64), f64, P(f64),
                f64, i64, i64, P(f64), P(f64)]
            lib.sparselda_topics.restype = None
        _sparselda_lib = lib
    return _sparselda_lib


_LDA_INFER_SRC = r"""
#include <stdint.h>

/* Frozen-stats inference sweep (the *_test.java harness path,
   m_collectCorpusStats = false): identical walk to lda_sweep but the
   global (wts, m_sstat) tables are read-only — only the doc's own sstat
   moves. */
void lda_sweep_frozen(const int64_t *words, int64_t n, int64_t *z,
                      double *doc_sstat, const double *wts,
                      const double *m_sstat, const double *us,
                      double *cache, int64_t K, int64_t V) {
    for (int64_t i = 0; i < n; i++) {
        int64_t wid = words[i], t = z[i];
        doc_sstat[t] -= 1.0;
        double cum = 0.0;
        for (int64_t k = 0; k < K; k++) {
            cum += doc_sstat[k] * wts[k * V + wid] / m_sstat[k];
            cache[k] = cum;
        }
        double u = cum * us[i];
        int64_t tn = K - 1;
        for (int64_t k = 0; k < K; k++) {
            if (cache[k] >= u) { tn = k; break; }
        }
        z[i] = tn;
        doc_sstat[tn] += 1.0;
    }
}
"""

_lda_infer_lib = None
_lda_infer_tried = False


def lda_infer_kernel():
    global _lda_infer_lib, _lda_infer_tried
    if not _lda_infer_tried:
        _lda_infer_tried = True
        lib = load("ldainfer", _LDA_INFER_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, f64 = ctypes.c_int64, ctypes.c_double
            lib.lda_sweep_frozen.argtypes = [
                P(i64), i64, P(i64), P(f64), P(f64), P(f64), P(f64),
                P(f64), i64, i64]
            lib.lda_sweep_frozen.restype = None
        _lda_infer_lib = lib
    return _lda_infer_lib


# ---------------------------------------------------------------------------
# Analyzer expand-count: chunk occurrences → per-doc (term, tf) in
# first-occurrence order, entirely in caller-provided grow-only buffers.
# This is the hot inner step of the vectorized analyzer batch path
# (stages/analyze.py): the numpy twin (repeat/factorize/bincount) allocates
# several occurrence-sized temporaries per batch, which collide on the
# host's first-touch fault path at high actor concurrency (BASELINE.md §8);
# the kernel touches only the output rows.
# ---------------------------------------------------------------------------

_ANALYZE_SRC = r"""
#include <stdint.h>

/* total (doc,term-emission) rows the count pass will visit */
int64_t analyze_total(const int32_t *occ_ids, int64_t n_occ,
                      const int64_t *term_offsets) {
    int64_t total = 0;
    for (int64_t o = 0; o < n_occ; o++) {
        int32_t c = occ_ids[o];
        total += term_offsets[c + 1] - term_offsets[c];
    }
    return total;
}

/* Per doc: expand each chunk occurrence into its emitted terms, count tf per
   term with first-occurrence ordering, drop docs with n_terms <= threshold
   (rewind). last_doc must be -1 on entry for every term id; it is restored
   to -1 before return. Returns rows written to out_term/out_tf. */
int64_t analyze_count(const int32_t *occ_ids,
                      const int32_t *n_per_doc, int64_t n_docs,
                      const int64_t *term_offsets,
                      const int64_t *chunk_term_ids,
                      int64_t length_threshold,
                      int64_t *last_doc, int64_t *slot,
                      int64_t *out_term, int64_t *out_tf,
                      int64_t *n_terms, int64_t *doc_len, uint8_t *keep) {
    int64_t out_n = 0, o = 0;
    for (int64_t d = 0; d < n_docs; d++) {
        int64_t start = out_n, len = 0;
        int64_t stop = o + n_per_doc[d];
        for (; o < stop; o++) {
            int32_t c = occ_ids[o];
            for (int64_t j = term_offsets[c]; j < term_offsets[c + 1]; j++) {
                int64_t t = chunk_term_ids[j];
                if (last_doc[t] != d) {
                    last_doc[t] = d;
                    slot[t] = out_n;
                    out_term[out_n] = t;
                    out_tf[out_n] = 1;
                    out_n++;
                } else {
                    out_tf[slot[t]]++;
                }
                len++;
            }
        }
        n_terms[d] = out_n - start;
        doc_len[d] = len;
        for (int64_t i = start; i < out_n; i++) last_doc[out_term[i]] = -1;
        if (out_n - start > length_threshold) {
            keep[d] = 1;
        } else {
            keep[d] = 0;
            out_n = start;    /* rewind: rejected docs emit no rows */
        }
    }
    return out_n;
}
"""

_analyze_lib = None
_analyze_tried = False


def analyze_kernel():
    global _analyze_lib, _analyze_tried
    if not _analyze_tried:
        _analyze_tried = True
        lib = load("analyzecount", _ANALYZE_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i32, i64, u8 = ctypes.c_int32, ctypes.c_int64, ctypes.c_uint8
            lib.analyze_total.argtypes = [P(i32), i64, P(i64)]
            lib.analyze_total.restype = i64
            lib.analyze_count.argtypes = [
                P(i32), P(i32), i64, P(i64), P(i64), i64,
                P(i64), P(i64), P(i64), P(i64), P(i64), P(i64), P(u8)]
            lib.analyze_count.restype = i64
        _analyze_lib = lib
    return _analyze_lib


# ---------------------------------------------------------------------------
# Posting-partition encode: radix-sort by (term_id, doc_id), block-split at
# (term_id, doc_id // block_doc_range) boundaries, per-block BM25 max-score
# (bit-identical expression order to functions/scoring.bm25_weights_from_idf)
# and delta+varbyte emission — one C call per partition over caller-provided
# grow-only buffers. Replaces a ~15-fresh-numpy-temporaries chain that made
# the encode stage allocation-bound (BASELINE.md §9: more encode workers
# were strictly SLOWER past 8 on this host class).
# ---------------------------------------------------------------------------

_ENCODE_SRC = r"""
#include <stdint.h>
#include <string.h>

/* stable LSD radix sort of 64-bit keys with index payload: 4 x 16-bit
   passes (even count, so the result lands back in key/ord). */
static void radix_sort(uint64_t *key, int64_t *ord, uint64_t *key_tmp,
                       int64_t *ord_tmp, int64_t *cnt, int64_t n) {
    for (int pass = 0; pass < 4; pass++) {
        int shift = pass * 16;
        memset(cnt, 0, 65536 * sizeof(int64_t));
        for (int64_t i = 0; i < n; i++) cnt[(key[i] >> shift) & 0xFFFF]++;
        int64_t sum = 0;
        for (int64_t d = 0; d < 65536; d++) {
            int64_t c = cnt[d]; cnt[d] = sum; sum += c;
        }
        for (int64_t i = 0; i < n; i++) {
            int64_t pos = cnt[(key[i] >> shift) & 0xFFFF]++;
            key_tmp[pos] = key[i];
            ord_tmp[pos] = ord[i];
        }
        uint64_t *tk = key; key = key_tmp; key_tmp = tk;
        int64_t *to = ord; ord = ord_tmp; ord_tmp = to;
    }
}

/* classic 7-bit little-endian varbyte, high bit marks the LAST byte —
   byte-identical to functions/codec.varbyte_encode_with_lengths */
static inline int64_t vb_emit(uint8_t *blob, int64_t pos, uint64_t v) {
    while (v >= 128) { blob[pos++] = (uint8_t)(v & 0x7F); v >>= 7; }
    blob[pos++] = (uint8_t)(v | 0x80);
    return pos;
}

int64_t encode_partition(
    const int64_t *tid, const int64_t *did, const int64_t *tf,
    const int64_t *dl, const double *idf, int64_t n,
    int64_t block_doc_range, double avgdl, double k1, double b,
    uint64_t *key, uint64_t *key_tmp, int64_t *ord, int64_t *ord_tmp,
    int64_t *cnt,
    int64_t *o_term, int64_t *o_chunk, int64_t *o_count,
    int64_t *o_mindoc, int64_t *o_maxdoc, double *o_maxscore,
    int64_t *doc_bounds, int64_t *tf_bounds,
    uint8_t *doc_blob, uint8_t *tf_blob,
    int64_t *out_scalars /* [3]: doc_bytes, tf_bytes, distinct_terms */)
{
    for (int64_t i = 0; i < n; i++) {
        key[i] = ((uint64_t)tid[i] << 32) | (uint64_t)did[i];
        ord[i] = i;
    }
    radix_sort(key, ord, key_tmp, ord_tmp, cnt, n);
    int64_t nb = -1, dpos = 0, tpos = 0, nterms = 0;
    int64_t prev_tid = -1, prev_chunk = -1, prev_did = 0;
    for (int64_t s = 0; s < n; s++) {
        int64_t j = ord[s];
        int64_t t = tid[j], d = did[j], f = tf[j], L = dl[j];
        int64_t ch = d / block_doc_range;
        double TF = (double)f;
        /* W4: idf*TF*(k1+1) / (k1*(1-b+b*dl/avgdl)+TF), numpy's exact
           left-assoc order — bit-identical to bm25_weights_from_idf */
        double w = idf[j] * TF * (k1 + 1.0)
                   / (k1 * (1.0 - b + b * ((double)L / avgdl)) + TF);
        if (t != prev_tid || ch != prev_chunk) {
            nb++;
            o_term[nb] = t; o_chunk[nb] = ch; o_count[nb] = 0;
            o_mindoc[nb] = d; o_maxscore[nb] = w;
            doc_bounds[nb] = dpos; tf_bounds[nb] = tpos;
            if (t != prev_tid) nterms++;
            dpos = vb_emit(doc_blob, dpos, (uint64_t)d);
        } else {
            if (w > o_maxscore[nb]) o_maxscore[nb] = w;
            dpos = vb_emit(doc_blob, dpos, (uint64_t)(d - prev_did));
        }
        tpos = vb_emit(tf_blob, tpos, (uint64_t)f);
        o_count[nb]++;
        o_maxdoc[nb] = d;
        prev_tid = t; prev_chunk = ch; prev_did = d;
    }
    if (nb >= 0) { doc_bounds[nb + 1] = dpos; tf_bounds[nb + 1] = tpos; }
    out_scalars[0] = dpos; out_scalars[1] = tpos; out_scalars[2] = nterms;
    return nb + 1;
}
"""

_encode_lib = None
_encode_tried = False


def encode_kernel():
    global _encode_lib, _encode_tried
    if not _encode_tried:
        _encode_tried = True
        lib = load("encodepart", _ENCODE_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, u64, u8, f64 = (ctypes.c_int64, ctypes.c_uint64,
                                 ctypes.c_uint8, ctypes.c_double)
            lib.encode_partition.argtypes = [
                P(i64), P(i64), P(i64), P(i64), P(f64), i64,
                i64, f64, f64, f64,
                P(u64), P(u64), P(i64), P(i64), P(i64),
                P(i64), P(i64), P(i64), P(i64), P(i64), P(f64),
                P(i64), P(i64), P(u8), P(u8), P(i64)]
            lib.encode_partition.restype = i64
        _encode_lib = lib
    return _encode_lib


# ---------------------------------------------------------------------------
# MinHash minwise reduce: per doc segment of shingle hashes, per permutation
# p: min over (h * a[p] + b[p]) in uint64 wraparound — identical values to
# the numpy per-doc scratch loop it replaces (stages/dedup.MinHashActor).
# ---------------------------------------------------------------------------

_MINHASH_SRC = r"""
#include <stdint.h>

void minhash_sigs(const uint64_t *h, const int64_t *bounds, int64_t ndocs,
                  const uint64_t *a, const uint64_t *b, int64_t P,
                  uint64_t *out) {
    for (int64_t d = 0; d < ndocs; d++) {
        uint64_t *row = out + d * P;
        int64_t s = bounds[d], e = bounds[d + 1];
        if (e <= s) continue;               /* caller pre-fills sentinel */
        for (int64_t p = 0; p < P; p++) row[p] = h[s] * a[p] + b[p];
        for (int64_t i = s + 1; i < e; i++) {
            uint64_t x = h[i];
            for (int64_t p = 0; p < P; p++) {
                uint64_t v = x * a[p] + b[p];
                if (v < row[p]) row[p] = v;
            }
        }
    }
}
"""

_minhash_lib = None
_minhash_tried = False


def minhash_kernel():
    global _minhash_lib, _minhash_tried
    if not _minhash_tried:
        _minhash_tried = True
        lib = load("minhashsigs", _MINHASH_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, u64 = ctypes.c_int64, ctypes.c_uint64
            lib.minhash_sigs.argtypes = [
                P(u64), P(i64), i64, P(u64), P(u64), i64, P(u64)]
            lib.minhash_sigs.restype = None
        _minhash_lib = lib
    return _minhash_lib


# ---------------------------------------------------------------------------
# Posting decode: concatenated varbyte buffers (7-bit little-endian groups,
# high bit on the LAST byte) → delta-decoded doc ids with a reset at each
# block boundary + tf values + per-block counts. Bit-identical to
# functions/codec.decode_postings_concat (the numpy fallback). One pass per
# stream; block membership tracked against the caller's byte-end offsets.
# ---------------------------------------------------------------------------

_DECODE_SRC = r"""
#include <stdint.h>

/* decode varbyte stream; for the doc stream (ends != 0) also apply the
   per-block delta reset and count values per block. Returns n values. */
int64_t vb_decode_blocks(const uint8_t *buf, int64_t nbytes,
                         const int64_t *ends, int64_t nbufs,
                         int64_t *out, int64_t *counts)
{
    int64_t n = 0, blk = 0;
    int64_t prev = 0;      /* running doc id within the current block */
    uint64_t v = 0;
    int shift = 0;
    if (counts) for (int64_t i = 0; i < nbufs; i++) counts[i] = 0;
    for (int64_t i = 0; i < nbytes; i++) {
        if (ends) {
            while (blk < nbufs && i >= ends[blk]) { blk++; prev = 0; }
        }
        uint8_t byte = buf[i];
        v |= ((uint64_t)(byte & 0x7F)) << shift;
        shift += 7;
        if (byte & 0x80) {
            if (ends) {              /* doc stream: delta with block reset */
                prev += (int64_t)v;
                out[n++] = prev;
                counts[blk]++;
            } else {
                out[n++] = (int64_t)v;
            }
            v = 0; shift = 0;
        }
    }
    return n;
}
"""

_decode_lib = None
_decode_tried = False


def decode_kernel():
    global _decode_lib, _decode_tried
    if not _decode_tried:
        _decode_tried = True
        lib = load("vbdecode", _DECODE_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, u8 = ctypes.c_int64, ctypes.c_uint8
            lib.vb_decode_blocks.argtypes = [P(u8), i64, P(i64), i64,
                                             P(i64), P(i64)]
            lib.vb_decode_blocks.restype = i64
        _decode_lib = lib
    return _decode_lib


# ---------------------------------------------------------------------------
# Fused posting decode + BM25 unit-weight: decode tf and delta-reset doc
# streams, then w[i] = ((idf * tf) * (k1+1)) / (norm[doc-off] + tf) in the
# EXACT float64 op/association order of query_engine._term_postings' numpy
# expression — bit-identical scores, none of the intermediate temporaries.
# ---------------------------------------------------------------------------

_DECODE_W_SRC = r"""
#include <stdint.h>

int64_t decode_weighted(const uint8_t *doc_buf, int64_t doc_nbytes,
                        const int64_t *ends, int64_t nbufs,
                        const uint8_t *tf_buf, int64_t tf_nbytes,
                        double idf, double k1p1,
                        const double *norm, int64_t doc_off,
                        int64_t *out_docs, double *out_w, int64_t *counts)
{
    /* doc stream: varbyte + per-block delta reset */
    int64_t n = 0, blk = 0, prev = 0;
    uint64_t v = 0; int shift = 0;
    for (int64_t i = 0; i < nbufs; i++) counts[i] = 0;
    for (int64_t i = 0; i < doc_nbytes; i++) {
        while (blk < nbufs && i >= ends[blk]) { blk++; prev = 0; }
        uint8_t byte = doc_buf[i];
        v |= ((uint64_t)(byte & 0x7F)) << shift;
        shift += 7;
        if (byte & 0x80) {
            prev += (int64_t)v;
            out_docs[n++] = prev;
            counts[blk]++;
            v = 0; shift = 0;
        }
    }
    /* tf stream decoded in lockstep into the weight formula */
    int64_t m = 0;
    v = 0; shift = 0;
    for (int64_t i = 0; i < tf_nbytes; i++) {
        uint8_t byte = tf_buf[i];
        v |= ((uint64_t)(byte & 0x7F)) << shift;
        shift += 7;
        if (byte & 0x80) {
            double tf = (double)(int64_t)v;
            out_w[m] = ((idf * tf) * k1p1)
                       / (norm[out_docs[m] - doc_off] + tf);
            m++;
            v = 0; shift = 0;
        }
    }
    return n == m ? n : -1;
}
"""

_decode_w_lib = None
_decode_w_tried = False


def decode_weighted_kernel():
    global _decode_w_lib, _decode_w_tried
    if not _decode_w_tried:
        _decode_w_tried = True
        lib = load("vbdecodew", _DECODE_W_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, u8, f64 = ctypes.c_int64, ctypes.c_uint8, ctypes.c_double
            lib.decode_weighted.argtypes = [
                P(u8), i64, P(i64), i64, P(u8), i64,
                f64, f64, P(f64), i64, P(i64), P(f64), P(i64)]
            lib.decode_weighted.restype = i64
        _decode_w_lib = lib
    return _decode_w_lib


# ---------------------------------------------------------------------------
# Fused candidate merge + bounded top-k: the candidates arrive as
# ascending-doc runs (one per (chunk, term), chunk ranges disjoint), so a
# T-way run merge replaces the Python path's stable argsort entirely; equal
# docs sum their contributions in part (= tid) order — the same float64 add
# sequence as np.add.reduceat over the stable argsort — then flow through
# the reference's exact MyPriorityQueue admission/insert semantics
# (functions/topk.BoundedTopK — incumbent-wins ties, mid-probe equal
# insertion). Bit- and tie-identical to the Python path by construction;
# pinned by pytest.
# ---------------------------------------------------------------------------

_SCORE_SRC = r"""
#include <stdint.h>

/* MyPriorityQueue.add on descending (qs, qi); returns new length.
   qs/qi must have capacity k+1. */
static inline int64_t q_add(double *qs, int64_t *qi, int64_t len, int64_t k,
                            double s, int64_t d) {
    if (len >= k && qs[len - 1] >= s) return len;  /* incumbent wins ties */
    int64_t start = 0, end = len;
    while (start != end) {
        int64_t mid = (start + end) / 2;
        double pivot = qs[mid];
        if (s > pivot) end = mid;
        else if (s == pivot) { start = mid; break; }
        else start = mid + 1;
    }
    for (int64_t i = len; i > start; i--) { qs[i] = qs[i-1]; qi[i] = qi[i-1]; }
    qs[start] = s; qi[start] = d;
    len++;
    return len > k ? k : len;  /* drop the shifted-out minimum */
}

/* Candidates arrive as ascending-doc runs: parts[p] = (doc ptr, w ptr, len),
   grouped by grp[p] (non-decreasing; one group per chunk, chunk doc ranges
   disjoint ascending). Per group: T-way merge of the runs, contributions for
   equal docs summed in part order (= tid order, matching the stable-argsort
   + reduceat Python path), each (doc, sum) fed through q_add. */
int64_t merge_score_topk(const int64_t *const *doc_ptrs,
                         const double *const *w_ptrs,
                         const int64_t *lens, const int64_t *grp,
                         int64_t nparts, int64_t *pos,
                         int64_t k, double *qs, int64_t *qi, int64_t q_len)
{
    int64_t g0 = 0;
    while (g0 < nparts) {
        int64_t g1 = g0;
        while (g1 < nparts && grp[g1] == grp[g0]) g1++;
        for (int64_t p = g0; p < g1; p++) pos[p] = 0;
        for (;;) {
            /* min head doc across the group's runs */
            int64_t best = -1; int64_t bd = 0;
            for (int64_t p = g0; p < g1; p++) {
                if (pos[p] < lens[p]) {
                    int64_t d = doc_ptrs[p][pos[p]];
                    if (best < 0 || d < bd) { best = p; bd = d; }
                }
            }
            if (best < 0) break;
            double sum = 0.0;
            for (int64_t p = g0; p < g1; p++) {      /* part order = tid order */
                if (pos[p] < lens[p] && doc_ptrs[p][pos[p]] == bd) {
                    sum += w_ptrs[p][pos[p]];
                    pos[p]++;
                }
            }
            q_len = q_add(qs, qi, q_len, k, sum, bd);
        }
        g0 = g1;
    }
    return q_len;
}
"""

_score_lib = None
_score_tried = False


def score_kernel():
    global _score_lib, _score_tried
    if not _score_tried:
        _score_tried = True
        lib = load("mergescore", _SCORE_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, u64, f64 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_double
            lib.merge_score_topk.argtypes = [
                P(P(i64)), P(P(f64)), P(i64), P(i64), i64, P(i64),
                i64, P(f64), P(i64), i64]
            lib.merge_score_topk.restype = i64
        _score_lib = lib
    return _score_lib


# ---------------------------------------------------------------------------
# Whole-query block-max WAND loop: one C call per query replaces the Python
# prune-group loop. Chunks ascend; per-term advancing block cursors locate
# each chunk's posting run (no binary search); the admission threshold is
# re-checked per CHUNK (finer than the Python path's per-group check — a
# skipped chunk's upper bound ≤ threshold can only contain docs add() would
# reject, so results are bit- and tie-identical; the proof is the same
# sound-upper-bound + strict-> admission + non-decreasing-threshold argument
# as query_engine.topk's docstring). Within a chunk, runs merge in term
# order with sequential float64 adds — the reduceat order.
# ---------------------------------------------------------------------------

_WAND_SRC = r"""
#include <stdint.h>

static inline int64_t q_add(double *qs, int64_t *qi, int64_t len, int64_t k,
                            double s, int64_t d) {
    if (len >= k && qs[len - 1] >= s) return len;  /* incumbent wins ties */
    int64_t start = 0, end = len;
    while (start != end) {
        int64_t mid = (start + end) / 2;
        double pivot = qs[mid];
        if (s > pivot) end = mid;
        else if (s == pivot) { start = mid; break; }
        else start = mid + 1;
    }
    for (int64_t i = len; i > start; i--) { qs[i] = qs[i-1]; qi[i] = qi[i-1]; }
    qs[start] = s; qi[start] = d;
    len++;
    return len > k ? k : len;
}

int64_t wand_topk(const int64_t *const *doc_ptrs,
                  const double *const *w_ptrs,
                  const int64_t *const *chk_ptrs,
                  const int64_t *const *off_ptrs,
                  const int64_t *nblocks, int64_t nterms,
                  const int64_t *uchunks, const double *chunk_ub,
                  int64_t nchunks, int64_t k,
                  double *qs, int64_t *qi, int64_t q_len,
                  int64_t *bc /* scratch: 3*nterms (block cursor, run pos, run end) */)
{
    int64_t *pos = bc + nterms, *re = bc + 2 * nterms;
    for (int64_t t = 0; t < nterms; t++) bc[t] = 0;
    for (int64_t j = 0; j < nchunks; j++) {
        if (q_len >= k && chunk_ub[j] <= qs[k - 1]) continue;
        int64_t c = uchunks[j];
        for (int64_t t = 0; t < nterms; t++) {
            const int64_t *chk = chk_ptrs[t];
            int64_t b = bc[t], nb = nblocks[t];
            while (b < nb && chk[b] < c) b++;
            int64_t lo = b;
            while (b < nb && chk[b] == c) b++;
            bc[t] = b;
            pos[t] = off_ptrs[t][lo];
            re[t] = off_ptrs[t][b];
        }
        for (;;) {
            int64_t best = -1, bd = 0;
            for (int64_t t = 0; t < nterms; t++) {
                if (pos[t] < re[t]) {
                    int64_t d = doc_ptrs[t][pos[t]];
                    if (best < 0 || d < bd) { best = t; bd = d; }
                }
            }
            if (best < 0) break;
            double sum = 0.0;
            for (int64_t t = 0; t < nterms; t++) {   /* term order = tid order */
                if (pos[t] < re[t] && doc_ptrs[t][pos[t]] == bd) {
                    sum += w_ptrs[t][pos[t]];
                    pos[t]++;
                }
            }
            q_len = q_add(qs, qi, q_len, k, sum, bd);
        }
    }
    return q_len;
}
"""

_wand_lib = None
_wand_tried = False


def wand_kernel():
    global _wand_lib, _wand_tried
    if not _wand_tried:
        _wand_tried = True
        lib = load("wandtopk", _WAND_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64, f64 = ctypes.c_int64, ctypes.c_double
            lib.wand_topk.argtypes = [
                P(P(i64)), P(P(f64)), P(P(i64)), P(P(i64)),
                P(i64), i64, P(i64), P(f64), i64, i64,
                P(f64), P(i64), i64, P(i64)]
            lib.wand_topk.restype = i64
        _wand_lib = lib
    return _wand_lib


# ---------------------------------------------------------------------------
# Kasai LCP array (suffix-array exact-substring dedup, stages/suffix_dedup):
# lcp[r] = longest common prefix of suffixes sa[r-1] and sa[r]. The h-decay
# walk is inherently sequential (amortized O(n)), so it lives in C; the
# Python fallback is the same loop.
# ---------------------------------------------------------------------------

_KASAI_SRC = r"""
#include <stdint.h>

void kasai_lcp(const int64_t *seq, const int64_t *sa, const int64_t *rank,
               int64_t n, int64_t *lcp)
{
    int64_t h = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = rank[i];
        if (r == 0) { lcp[0] = 0; h = 0; continue; }
        int64_t j = sa[r - 1];
        while (i + h < n && j + h < n && seq[i + h] == seq[j + h]) h++;
        lcp[r] = h;
        if (h > 0) h--;
    }
}
"""

_kasai_lib = None
_kasai_tried = False


def kasai_kernel():
    global _kasai_lib, _kasai_tried
    if not _kasai_tried:
        _kasai_tried = True
        lib = load("kasailcp", _KASAI_SRC)
        if lib is not None:
            P = ctypes.POINTER
            i64 = ctypes.c_int64
            lib.kasai_lcp.argtypes = [P(i64), P(i64), P(i64), i64, P(i64)]
            lib.kasai_lcp.restype = None
        _kasai_lib = lib
    return _kasai_lib
