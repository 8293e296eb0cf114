"""ctypes bindings to the optional native (C++) I/O library.

The reference does its genotype load and history writes through C++ MPI-IO
(``src/bayes.cpp:867-900``, ``src/utilities.hpp:29-81``).  Our equivalent is
``_native/io_native.cpp``: a small C++ library doing multithreaded pread of
.bed slices and fast .phen parsing.  Everything degrades gracefully to numpy
when the library has not been built (tests and CPU runs don't need it).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "_native", "libgmrm_io.so"),
        os.path.join(os.path.dirname(__file__), "libgmrm_io.so"),
    ):
        if os.path.isfile(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.gmrm_read_block.restype = ctypes.c_longlong
                lib.gmrm_read_block.argtypes = [
                    ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_void_p, ctypes.c_int,
                ]
                lib.gmrm_parse_phen.restype = ctypes.c_longlong
                lib.gmrm_parse_phen.argtypes = [
                    ctypes.c_char_p, ctypes.c_longlong,
                    ctypes.c_void_p, ctypes.c_void_p,
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def have_native() -> bool:
    return _find_lib() is not None


def native_read_block(path: str, offset: int, nbytes: int,
                      n_threads: int = 0) -> np.ndarray | None:
    """Parallel pread of [offset, offset+nbytes) into a fresh uint8 array.

    Returns None when the native library is unavailable (caller falls back
    to numpy).
    """
    lib = _find_lib()
    if lib is None:
        return None
    buf = np.empty(nbytes, dtype=np.uint8)
    got = lib.gmrm_read_block(
        path.encode(), offset, nbytes,
        buf.ctypes.data_as(ctypes.c_void_p), int(n_threads),
    )
    if got != nbytes:
        raise IOError(f"native read of {path} returned {got}, expected {nbytes}")
    return buf


def native_parse_phen(path: str, n_max: int) -> tuple[np.ndarray, np.ndarray] | None:
    """Parse a PLINK .phen (FID IID value|NA) into (values, isna) arrays.

    Returns None when the native library is unavailable.
    """
    lib = _find_lib()
    if lib is None:
        return None
    vals = np.empty(n_max, dtype=np.float64)
    isna = np.empty(n_max, dtype=np.uint8)
    n = lib.gmrm_parse_phen(
        path.encode(), n_max,
        vals.ctypes.data_as(ctypes.c_void_p),
        isna.ctypes.data_as(ctypes.c_void_p),
    )
    if n < 0:
        raise IOError(f"native phen parse of {path} failed ({n})")
    return vals[:n].copy(), isna[:n].astype(bool)
