"""ctypes bindings for the native batch audio decoder (native/audio_io.cc).

Exposes :func:`decode_mono` and :func:`decode_batch_mono` backed by the
C++ ``libraf_audio.so`` worker-pool decoder, with on-demand compilation via
the bundled Makefile and a transparent fallback to the pure-Python codec
(:mod:`.io`) when no compiler is available. The corpus loaders use the
batch call to overlap disk/decode work across a thread pool while the
device computes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraf_audio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=180,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(force_rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None and not force_rebuild:
            return _lib
        if _build_failed and not force_rebuild:
            return None
        if force_rebuild or not os.path.exists(_LIB_PATH):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.raf_version.restype = ctypes.c_char_p
        lib.raf_decode_mono.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.raf_decode_mono.restype = ctypes.c_int
        lib.raf_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.raf_decode_batch_mono.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


def decode_mono(path: str) -> Tuple[np.ndarray, int]:
    """Decode one WAV → (mono float32 array, sample_rate).

    Uses the native decoder when available, else the pure-Python codec.
    """
    lib = load_library()
    if lib is None:
        from .io import read_wav

        x, sr = read_wav(path)
        return x.mean(axis=1).astype(np.float32), sr
    buf = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.raf_decode_mono(path.encode(), ctypes.byref(buf), ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"native decode failed for {path} (code {rc})")
    try:
        out = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
    finally:
        lib.raf_free(buf)
    return out, sr.value


def decode_batch_mono(
    paths: Sequence[str], n_threads: int = 8
) -> List[Optional[Tuple[np.ndarray, int]]]:
    """Decode many WAVs concurrently. Returns per-file (audio, sr) or None
    for files that failed (NaN-row semantics are applied by callers)."""
    lib = load_library()
    if lib is None:
        out: List[Optional[Tuple[np.ndarray, int]]] = []
        for p in paths:
            try:
                out.append(decode_mono(p))
            except Exception:
                out.append(None)
        return out

    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    bufs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    srs = (ctypes.c_int * n)()
    status = (ctypes.c_int * n)()
    lib.raf_decode_batch_mono(c_paths, n, bufs, lens, srs, status, n_threads)
    results: List[Optional[Tuple[np.ndarray, int]]] = []
    for i in range(n):
        if status[i] != 0 or not bufs[i]:
            results.append(None)
            continue
        try:
            arr = np.ctypeslib.as_array(bufs[i], shape=(lens[i],)).copy()
        finally:
            lib.raf_free(bufs[i])
        results.append((arr, srs[i]))
    return results


def load_corpus_mono_16k(
    paths: Sequence[str], target_sr: int = 16000, n_threads: int = 8
) -> Dict[str, np.ndarray]:
    """Batch decode + resample a list of files → {basename: 16 kHz mono}.

    Files that fail to decode are absent from the result (callers apply the
    reference's NaN-row/skip semantics). Raises on duplicate basenames: the
    corpus keys features by bare filename, so a silent overwrite would
    attribute one file's audio to another.
    """
    from .resample import resample_poly_np

    names = [os.path.basename(p) for p in paths]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"duplicate basenames across input paths: {sorted(dupes)[:5]} — "
            "results are keyed by basename; disambiguate the filenames"
        )
    decoded = decode_batch_mono(list(paths), n_threads)
    out: Dict[str, np.ndarray] = {}
    for name, item in zip(names, decoded):
        if item is None:
            continue
        x, sr = item
        if sr != target_sr:
            x = resample_poly_np(x.astype(np.float64), target_sr, sr)
        out[name] = x.astype(np.float32)
    return out
