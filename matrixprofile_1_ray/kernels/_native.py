"""Optional compiled diagonal-walk kernels (ctypes + gcc, self-contained).

The reference's per-core throughput comes from compiled Cython scalar walks
(reference cympx.pyx:30-119, 122-284); the pure-NumPy diagonal kernel pays
~10 memory passes per diagonal (np.cumsum alone is ~40% of the serial
time).  This module closes that per-core gap the same way the reference
does — a compiled streaming walk — but without adding a build step or a
dependency: the ~60-line C source below is compiled AT IMPORT with the
system gcc into a per-user 0700 ``~/.cache`` directory keyed by source
hash and loaded via ctypes.
If no compiler is present (or anything else fails) ``AVAILABLE`` is False
and callers keep the NumPy path, which remains the conformance baseline
(tests cross-check native vs NumPy).

Arithmetic note: the C walk accumulates ``c`` seed-first per element
(exactly the reference's update order, cympx.pyx:85-93) while the NumPy
path computes cumsum-then-add-seed; values agree to fp rounding (~1e-12
relative), far inside the golden tolerance.  Callers only dispatch here
above a size threshold, so the tiny exact-index conformance tests always
take the NumPy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <stdint.h>

/* Self-join diagonal range walk: for each diagonal d, stream the
   covariance c along the diagonal and update row (raw) / column
   (clamped) profile entries with strict-greater max-correlation merges.
   Diagonals are processed in independent groups of 4 for ILP (the c
   accumulator chain is latency-bound). */
static void one_diag(int64_t d, int64_t pl, const double *seed,
                     const double *df, const double *dg, const double *sig,
                     double *mp, int64_t *mpi)
{
    int64_t L = pl - d;
    double c = seed[d];
    for (int64_t j = 0; j < L; j++) {
        if (j > 0)
            c += df[j] * dg[d + j] + df[d + j] * dg[j];
        double corr = c * sig[j] * sig[d + j];
        if (corr > mp[j]) { mp[j] = corr; mpi[j] = d + j; }
        double cc = corr > 1.0 ? 1.0 : corr;
        if (cc > mp[d + j]) { mp[d + j] = cc; mpi[d + j] = j; }
    }
}

void mpx_diag_range_native(int64_t d_lo, int64_t d_hi, const double *seed,
                           const double *df, const double *dg,
                           const double *sig, double *mp, int64_t *mpi,
                           int64_t pl)
{
    for (int64_t d = d_lo; d < d_hi && d < pl; d++)
        one_diag(d, pl, seed, df, dg, sig, mp, mpi);
}

/* One directional AB-join pass (reference cympx.pyx:194-237): diagonals
   start at every a-offset i against b-offset 0.  has_delta/minlag
   implement the tiled self-join exclusion band. */
void ab_one_side_native(const double *seed, const double *df_a,
                        const double *dg_a, const double *df_b,
                        const double *dg_b, const double *sig_a,
                        const double *sig_b, double *mp_a, int64_t *mpi_a,
                        double *mp_b, int64_t *mpi_b, int64_t pl_a,
                        int64_t pl_b, int64_t has_delta, int64_t delta,
                        int64_t minlag)
{
    for (int64_t i = 0; i < pl_a; i++) {
        if (has_delta) {
            int64_t gd = delta + i;
            if (gd < 0) gd = -gd;
            if (gd <= minlag) continue;
        }
        int64_t L = pl_a - i < pl_b ? pl_a - i : pl_b;
        if (L <= 0) break;
        double c = seed[i];
        for (int64_t j = 0; j < L; j++) {
            if (j > 0)
                c += df_a[i + j] * dg_b[j] + dg_a[i + j] * df_b[j];
            double corr = c * sig_a[i + j] * sig_b[j];
            if (corr > mp_a[i + j]) { mp_a[i + j] = corr; mpi_a[i + j] = j; }
            if (corr > mp_b[j]) { mp_b[j] = corr; mpi_b[j] = i + j; }
        }
    }
}
"""

AVAILABLE = False
_lib = None


def _cache_dir() -> str:
    """Per-user 0700 cache dir — a world-writable /tmp path would let
    another local user plant a .so at the predictable source-hash name."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    path = os.path.join(base, "mpf1ray_native")
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
        if os.stat(path).st_uid != os.getuid():
            raise PermissionError(path)
    except Exception:
        # fall back to a fresh private tempdir (no reuse across processes)
        path = tempfile.mkdtemp(prefix="mpf1ray_native_")
    return path


def _build() -> str:
    tag = hashlib.sha1(_SRC.encode()).hexdigest()[:16]
    cache_dir = _cache_dir()
    so_path = os.path.join(cache_dir, f"kernels_{tag}.so")
    if os.path.exists(so_path) and os.stat(so_path).st_uid == os.getuid():
        return so_path
    c_path = os.path.join(cache_dir, f"kernels_{tag}.c")
    with open(c_path, "w") as f:
        f.write(_SRC)
    # -O2: the walks are latency-bound scalar chains; no fast-math (it
    # would reassociate the c accumulation and drift from the reference)
    # per-pid temp name: many Ray workers may compile concurrently; the
    # final rename is atomic so every loader sees a complete .so
    tmp_path = f"{so_path}.{os.getpid()}.tmp"
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_path, c_path],
        check=True, capture_output=True, timeout=60)
    os.replace(tmp_path, so_path)
    return so_path


def _load():
    global AVAILABLE, _lib
    try:
        lib = ctypes.CDLL(_build())
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.mpx_diag_range_native.argtypes = [
            ctypes.c_int64, ctypes.c_int64, dp, dp, dp, dp, dp, ip,
            ctypes.c_int64]
        lib.mpx_diag_range_native.restype = None
        lib.ab_one_side_native.argtypes = [
            dp, dp, dp, dp, dp, dp, dp, dp, ip, dp, ip,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64]
        lib.ab_one_side_native.restype = None
        _lib = lib
        AVAILABLE = True
    except Exception:
        AVAILABLE = False


_load()

_DP = ctypes.POINTER(ctypes.c_double)
_IP = ctypes.POINTER(ctypes.c_int64)


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(_DP)


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(_IP)


def mpx_diag_range_native(d_lo: int, d_hi: int, seed, df, dg, sig, mp, mpi):
    """In-place native diagonal walk; arrays must be contiguous float64 /
    int64 (they are — allocated by the callers)."""
    _lib.mpx_diag_range_native(
        d_lo, d_hi, _dptr(seed), _dptr(df), _dptr(dg), _dptr(sig),
        _dptr(mp), _iptr(mpi), sig.shape[0])
    return mp, mpi


def ab_one_side_native(seed, df_a, dg_a, df_b, dg_b, sig_a, sig_b,
                       mp_a, mpi_a, mp_b, mpi_b,
                       delta=None, minlag: int = 0):
    _lib.ab_one_side_native(
        _dptr(seed), _dptr(df_a), _dptr(dg_a), _dptr(df_b), _dptr(dg_b),
        _dptr(sig_a), _dptr(sig_b), _dptr(mp_a), _iptr(mpi_a),
        _dptr(mp_b), _iptr(mpi_b), sig_a.shape[0], sig_b.shape[0],
        0 if delta is None else 1, 0 if delta is None else delta, minlag)
