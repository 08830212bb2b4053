"""C-speed exact replica of ``difflib.SequenceMatcher`` ratio.

``_name_ratio`` (stages/dedup_near.py) is the single hottest scalar in
the whole KG build: in-worker cProfile over the candidate-verify
exchange shows ~45% of reduce-task time inside pure-Python difflib
(find_longest_match / get_matching_blocks / quick_ratio / __chain_b)
on ~30k distinct name pairs per task. The ratio itself is reference
semantics (deduplication.py uses SequenceMatcher), so it cannot be
approximated — but it CAN be computed by an exact C replica:

* scope: both strings shorter than 200 code points, junk=None. Below
  200 ``autojunk`` never marks popular elements (the b2j junk set is
  empty), so the algorithm is the plain Ratcliff-Obershelp recursion —
  precisely what the C kernel implements. Longer inputs fall back to
  difflib (normalized server names are far shorter in practice).
* quick_ratio: 2·Σ_c min(count_a[c], count_b[c]) / (la+lb) — computed
  by sort+merge over code points, identical value, same IEEE double
  division as difflib's _calculate_ratio.
* ratio: sum of matching-block sizes from the queue recursion of
  get_matching_blocks. Only the SUM is needed; difflib's adjacent-
  block merge step preserves it.

The kernel is compiled once per host with the system C compiler into a
source-hash-keyed cache dir (atomic rename, so concurrent Ray workers
race benignly) and loaded via ctypes. Any failure — no compiler, no
ctypes, bad cache — degrades silently to the pure-Python path; tests
assert equality against difflib on random unicode and corpus names
(tests/test_property.py).

This is a local-node optimization with zero semantic surface: on a real
multi-node cluster the same file compiles on each node at first import
(or the wheel ships prebuilt), and the fallback keeps behavior correct
anywhere a compiler is absent.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <string.h>
#include <stdlib.h>

#define MAXN 200

/* ascending insertion sort — n < 200, mostly short */
static void sort_u32(uint32_t *v, int n) {
    for (int i = 1; i < n; i++) {
        uint32_t x = v[i]; int j = i - 1;
        while (j >= 0 && v[j] > x) { v[j + 1] = v[j]; j--; }
        v[j + 1] = x;
    }
}

/* exact difflib quick_ratio numerator: sum_c min(cnt_a[c], cnt_b[c]) */
static int quick_matches(const uint32_t *a, int la,
                         const uint32_t *b, int lb) {
    uint32_t sa[MAXN], sb[MAXN];
    memcpy(sa, a, la * sizeof(uint32_t));
    memcpy(sb, b, lb * sizeof(uint32_t));
    sort_u32(sa, la);
    sort_u32(sb, lb);
    int i = 0, j = 0, m = 0;
    while (i < la && j < lb) {
        if (sa[i] == sb[j]) { m++; i++; j++; }
        else if (sa[i] < sb[j]) i++;
        else j++;
    }
    return m;
}

/* find_longest_match over [alo,ahi) x [blo,bhi), junk-free.
   bs_cp/bs_j: positions of b sorted by (codepoint, j) for b2j lookup.
   j2len/newj2len: caller scratch, size lb. */
static int flm(const uint32_t *a, const uint32_t *b,
               const uint32_t *bs_cp, const int *bs_j, int lb,
               int alo, int ahi, int blo, int bhi,
               int *j2len, int *newj2len,
               int *besti_out, int *bestj_out) {
    int besti = alo, bestj = blo, bestsize = 0;
    memset(j2len, 0, lb * sizeof(int));
    for (int i = alo; i < ahi; i++) {
        memset(newj2len, 0, lb * sizeof(int));
        uint32_t c = a[i];
        /* lower_bound of c in bs_cp */
        int lo = 0, hi = lb;
        while (lo < hi) {
            int mid = (lo + hi) >> 1;
            if (bs_cp[mid] < c) lo = mid + 1; else hi = mid;
        }
        for (int p = lo; p < lb && bs_cp[p] == c; p++) {
            int j = bs_j[p];
            if (j < blo) continue;
            if (j >= bhi) break;
            int k = (j > 0 ? j2len[j - 1] : 0) + 1;
            newj2len[j] = k;
            if (k > bestsize) {
                besti = i - k + 1; bestj = j - k + 1; bestsize = k;
            }
        }
        memcpy(j2len, newj2len, lb * sizeof(int));
    }
    /* junk-free extension (difflib runs it twice; identical here) */
    while (besti > alo && bestj > blo && a[besti - 1] == b[bestj - 1]) {
        besti--; bestj--; bestsize++;
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
           a[besti + bestsize] == b[bestj + bestsize])
        bestsize++;
    *besti_out = besti; *bestj_out = bestj;
    return bestsize;
}

/* ---- zlib-compatible crc32 (IEEE reflected) --------------------------- */

static uint32_t crc_tab[256];
static int crc_ready = 0;

static void crc_init(void) {
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_tab[i] = c;
    }
    crc_ready = 1;
}

static uint32_t crc32b(const uint8_t *p, int n) {
    uint32_t c = 0xFFFFFFFFu;
    for (int i = 0; i < n; i++)
        c = crc_tab[(c ^ p[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

static int utf8_enc(uint32_t cp, uint8_t *o) {
    if (cp < 0x80) { o[0] = cp; return 1; }
    if (cp < 0x800) {
        o[0] = 0xC0 | (cp >> 6); o[1] = 0x80 | (cp & 0x3F); return 2;
    }
    if (cp < 0x10000) {
        o[0] = 0xE0 | (cp >> 12); o[1] = 0x80 | ((cp >> 6) & 0x3F);
        o[2] = 0x80 | (cp & 0x3F); return 3;
    }
    o[0] = 0xF0 | (cp >> 18); o[1] = 0x80 | ((cp >> 12) & 0x3F);
    o[2] = 0x80 | ((cp >> 6) & 0x3F); o[3] = 0x80 | (cp & 0x3F); return 4;
}

/* exact replica of stages/dedup_near._name_bands: 2-codepoint shingles
   (whole string when shorter), crc32 of the utf-8 bytes as shingle id,
   (a*x + b) mod (2^61-1) MinHash with uint64 WRAP on the multiply/add
   (numpy semantics), all-max sentinel for the empty string, then the
   band_keys (bi<<56) ^ (crc32(seg_le_bytes)<<16) ^ crc32(rev_seg) mix.
   A/B: the np.random.RandomState(seed) coefficient arrays, passed in so
   the one source of truth stays minhash._coeffs. */
void askg_name_bands(const uint32_t *cps, int n,
                     const uint64_t *A, const uint64_t *B,
                     int nperm, int bands, int64_t *out) {
    if (!crc_ready) crc_init();
    const uint64_t M = (((uint64_t)1) << 61) - 1;
    uint64_t sig[256];
    for (int p = 0; p < nperm; p++) sig[p] = ~(uint64_t)0;
    uint8_t buf[8];
    if (n == 1) {
        int bl = utf8_enc(cps[0], buf);
        uint64_t x = crc32b(buf, bl);
        for (int p = 0; p < nperm; p++) {
            uint64_t v = (A[p] * x + B[p]) % M;
            if (v < sig[p]) sig[p] = v;
        }
    } else if (n >= 2) {
        for (int i = 0; i + 1 < n; i++) {
            int bl = utf8_enc(cps[i], buf);
            bl += utf8_enc(cps[i + 1], buf + bl);
            uint64_t x = crc32b(buf, bl);
            for (int p = 0; p < nperm; p++) {
                uint64_t v = (A[p] * x + B[p]) % M;
                if (v < sig[p]) sig[p] = v;
            }
        }
    }
    int rows = nperm / bands;
    uint64_t rev[64];
    for (int bi = 0; bi < bands; bi++) {
        const uint64_t *seg = sig + bi * rows;
        uint32_t c1 = crc32b((const uint8_t *)seg, rows * 8);
        for (int r = 0; r < rows; r++) rev[r] = seg[rows - 1 - r];
        uint32_t c2 = crc32b((const uint8_t *)rev, rows * 8);
        out[bi] = (int64_t)((((uint64_t)bi) << 56) ^
                            (((uint64_t)c1) << 16) ^ (uint64_t)c2);
    }
}

/* exact replica of stages/edges._ids_from_hashes in one pass: the
   splitmix64 chain and big-endian hex expansion with no intermediate
   arrays (the numpy version's byteswap + gather temporaries were
   memory-bandwidth-bound at full node width). */
static uint64_t sm64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

void askg_edge_ids(const uint64_t *hs, const uint64_t *hd,
                   const uint64_t *t, int t_stride,
                   long long n, uint8_t *out) {
    static const char hexd[] = "0123456789abcdef";
    for (long long r = 0; r < n; r++) {
        uint64_t tv = t[r * t_stride];   /* stride 0 = scalar broadcast */
        uint64_t h1 = sm64(hs[r] ^ sm64(hd[r] ^ tv));
        uint64_t h2 = sm64(h1 ^ hd[r] ^ 0xD6E8FEB86659FD93ULL);
        uint8_t *o = out + r * 32;
        for (int i = 0; i < 8; i++) {
            uint8_t b1 = (uint8_t)(h1 >> (56 - 8 * i));
            uint8_t b2 = (uint8_t)(h2 >> (56 - 8 * i));
            o[2 * i] = hexd[b1 >> 4];
            o[2 * i + 1] = hexd[b1 & 15];
            o[16 + 2 * i] = hexd[b2 >> 4];
            o[17 + 2 * i] = hexd[b2 & 15];
        }
    }
}

/* ratio with the quick_ratio prune folded in: returns 0.0 when
   quick_ratio <= thresh (difflib ratio <= quick_ratio makes the
   short-circuit lossless for callers comparing > thresh), else the
   exact SequenceMatcher.ratio. */
double askg_ratio(const uint32_t *a, int la, const uint32_t *b, int lb,
                  double thresh) {
    double total = (double)(la + lb);
    if (la >= MAXN || lb >= MAXN) return -1.0;   /* caller falls back */
    if (total == 0.0) return 1.0;                 /* difflib: 2*0/0 -> 1 */
    int qm = quick_matches(a, la, b, lb);
    if (2.0 * qm / total <= thresh) return 0.0;

    /* b2j as positions sorted by (codepoint, j) */
    uint32_t bs_cp[MAXN];
    int bs_j[MAXN];
    int order[MAXN];
    for (int j = 0; j < lb; j++) order[j] = j;
    /* stable insertion sort by codepoint keeps j ascending per cp */
    for (int i = 1; i < lb; i++) {
        int x = order[i]; int k = i - 1;
        while (k >= 0 && b[order[k]] > b[x]) { order[k + 1] = order[k]; k--; }
        order[k + 1] = x;
    }
    for (int i = 0; i < lb; i++) { bs_cp[i] = b[order[i]]; bs_j[i] = order[i]; }

    int j2len[MAXN], newj2len[MAXN];
    /* queue recursion of get_matching_blocks, summing sizes */
    int stack[4 * (2 * MAXN + 4)];
    int sp = 0;
    long long msum = 0;
    stack[sp++] = 0; stack[sp++] = la; stack[sp++] = 0; stack[sp++] = lb;
    while (sp > 0) {
        int bhi = stack[--sp], blo = stack[--sp];
        int ahi = stack[--sp], alo = stack[--sp];
        if (alo >= ahi || blo >= bhi) continue;
        int bi, bj;
        int k = flm(a, b, bs_cp, bs_j, lb, alo, ahi, blo, bhi,
                    j2len, newj2len, &bi, &bj);
        if (k) {
            msum += k;
            stack[sp++] = alo; stack[sp++] = bi;
            stack[sp++] = blo; stack[sp++] = bj;
            stack[sp++] = bi + k; stack[sp++] = ahi;
            stack[sp++] = bj + k; stack[sp++] = bhi;
        }
    }
    return 2.0 * (double)msum / total;
}
"""

_fn = None
_libobj = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    tag = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"askg_native_{tag}")
    so = os.path.join(cache, "fastratio.so")
    if not os.path.exists(so):
        os.makedirs(cache, exist_ok=True)
        src = os.path.join(cache, "fastratio.c")
        tmp = os.path.join(cache, f"fastratio.{os.getpid()}.so")
        with open(src, "w") as f:
            f.write(_C_SRC)
        cc = os.environ.get("CC", "cc")
        subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                       check=True, capture_output=True, timeout=60)
        os.rename(tmp, so)   # atomic: concurrent builders race benignly
    lib = ctypes.CDLL(so)
    lib.askg_ratio.restype = ctypes.c_double
    lib.askg_ratio.argtypes = [ctypes.c_char_p, ctypes.c_int,
                               ctypes.c_char_p, ctypes.c_int,
                               ctypes.c_double]
    lib.askg_name_bands.restype = None
    lib.askg_name_bands.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int, ctypes.c_int,
                                    ctypes.c_void_p]
    lib.askg_edge_ids.restype = None
    lib.askg_edge_ids.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_longlong, ctypes.c_void_p]
    return lib


def _get():
    global _fn, _libobj, _tried
    if not _tried:
        _tried = True
        if os.environ.get("ASKG_NO_NATIVE"):
            return None
        try:
            lib = _build()

            def call(a: str, b: str, thresh: float) -> float:
                return lib.askg_ratio(a.encode("utf-32-le"), len(a),
                                      b.encode("utf-32-le"), len(b),
                                      thresh)

            # self-check at load: any mismatch disables the native path
            from difflib import SequenceMatcher
            for x, y in (("abcd", "bcde"), ("", ""), ("a" * 50, "a" * 30),
                         ("mcp server", "mcp-server"), ("xy", "yx")):
                want = SequenceMatcher(None, x, y).ratio()
                got = call(x, y, 0.0)
                if abs(want - got) > 0:
                    raise AssertionError(f"fastratio mismatch on {x!r},{y!r}")
            _fn = call
            _libobj = lib
        except Exception:
            _fn = None
            print("[askg] native fastratio unavailable; difflib fallback",
                  file=sys.stderr)
    return _fn


def ratio_gated(a: str, b: str, thresh: float) -> float | None:
    """Exact SequenceMatcher(None, a, b).ratio(), with 0.0 returned when
    quick_ratio <= thresh (lossless for > thresh callers). None when the
    native path is unavailable or the inputs are out of its scope."""
    fn = _get()
    if fn is None:
        return None
    r = fn(a, b, thresh)
    return None if r < 0.0 else r


def _lib():
    """The loaded CDLL, or None — the ratio self-check gates all entry
    points (one compile, one validation)."""
    return _libobj if _get() is not None else None


def name_bands(nn: str, a_coeffs, b_coeffs, nperm: int,
               bands: int) -> "tuple[int, ...] | None":
    """Exact C replica of stages/dedup_near._name_bands for one name.
    a_coeffs/b_coeffs: contiguous uint64 numpy arrays (minhash._coeffs).
    None when the native library is unavailable."""
    lib = _lib()
    if (lib is None or nperm > 256 or bands > 64
            or bands == 0 or nperm // bands > 64):  # C scratch bounds
        return None
    import numpy as np
    out = np.empty(bands, dtype=np.int64)
    cps = nn.encode("utf-32-le")
    lib.askg_name_bands(cps, len(nn),
                        a_coeffs.ctypes.data, b_coeffs.ctypes.data,
                        nperm, bands, out.ctypes.data)
    return tuple(out.tolist())


def edge_ids_hex(hs, hd, t) -> "object | None":
    """(n, 32) uint8 hex chars for stages/edges._ids_from_hashes — the
    splitmix chain + hex expansion in one C pass. None when the native
    library is unavailable. hs/hd: uint64 arrays; t: a uint64 scalar or
    a per-row uint64 array (the truncate path restores ids with per-row
    relationship tags)."""
    lib = _lib()
    if lib is None:
        return None
    import numpy as np
    n = len(hs)
    tarr = np.asarray(t, dtype=np.uint64)
    stride = 0 if tarr.ndim == 0 else 1
    tarr = np.ascontiguousarray(tarr.reshape(-1))
    out = np.empty((n, 32), dtype=np.uint8)
    lib.askg_edge_ids(np.ascontiguousarray(hs).ctypes.data,
                      np.ascontiguousarray(hd).ctypes.data,
                      tarr.ctypes.data, stride, n, out.ctypes.data)
    return out
