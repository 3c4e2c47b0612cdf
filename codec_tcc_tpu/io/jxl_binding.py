"""ctypes binding for the in-process JPEG XL codec shim.

Builds ``codec_tcc_tpu/native/libjxlshim.so`` on first use against the
system ``libjxl.so.0.7`` (runtime library only — the API subset is declared
in ``native/jxl_min.h``). This replaces the reference's ``cjxl.exe`` /
``djxl.exe`` subprocess round through temp PNGs
(``/root/reference/src/codec.py:108-182``) with two C calls. The registry's
``jxl`` codec uses this when the library is present, falling back to PATH
binaries (the reference's mechanism) otherwise.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import glob
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


# ONE definition of the sanitizer gate + flag set for both native codecs
# (CODEC_TCC_ASAN=1 selects instrumented builds for the fuzz campaign —
# the shim's own buffer handling is the audited surface; system libjxl
# stays as-is). Keep codec_tcc_tpu/native/Makefile's ASANFLAGS in sync:
# a drift would leave the builds differently instrumented than the
# committed fuzz record claims.
from .jpegls_binding import _SANITIZE_FLAGS, _asan_enabled


_LIB_PATH = os.path.join(
    _NATIVE_DIR, "build",
    "libjxlshim_asan.so" if _asan_enabled() else "libjxlshim.so",
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed: Optional[str] = None


def _find_libjxl() -> Optional[str]:
    name = ctypes.util.find_library("jxl")
    if name:
        return name
    for pat in ("/lib/*/libjxl.so*", "/usr/lib/*/libjxl.so*", "/usr/lib/libjxl.so*"):
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


def _build(libjxl: str) -> None:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    src = os.path.join(_NATIVE_DIR, "jxl_shim.cpp")
    # find_library may return a bare soname ("libjxl.so.0.7") or a path;
    # -l: links an exact file name either way
    base = os.path.basename(libjxl)
    link = ["-l:" + base] if base.startswith("lib") else ["-l" + base]
    libdir = os.path.dirname(libjxl) if "/" in libjxl else None
    opt = list(_SANITIZE_FLAGS) if _asan_enabled() else ["-O2"]
    cmd = ["g++", *opt, "-std=c++17", "-fPIC", "-shared", "-Wall",
           "-o", _LIB_PATH, src]
    if libdir:
        cmd += ["-L" + libdir]
    cmd += link
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"jxl shim build failed:\n{proc.stderr}")


def available() -> bool:
    if _lib is not None:
        return True
    if _build_failed is not None:
        return False
    return _find_libjxl() is not None


def load_library() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed is not None:
            raise RuntimeError(_build_failed)
        try:
            libjxl = _find_libjxl()
            if libjxl is None:
                raise RuntimeError("system libjxl not found")
            src = os.path.join(_NATIVE_DIR, "jxl_shim.cpp")
            hdr = os.path.join(_NATIVE_DIR, "jxl_min.h")
            if not os.path.exists(_LIB_PATH) or any(
                os.path.getmtime(p) > os.path.getmtime(_LIB_PATH)
                for p in (src, hdr)
                if os.path.exists(p)
            ):
                _build(libjxl)
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception as exc:
            _build_failed = f"jxl shim unavailable: {exc}"
            raise RuntimeError(_build_failed) from exc

        lib.jxl_encode.restype = ctypes.c_int
        lib.jxl_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.jxl_decode.restype = ctypes.c_int
        lib.jxl_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jxl_probe.restype = ctypes.c_int
        lib.jxl_probe.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jxl_runtime_version.restype = ctypes.c_uint
        lib.jxl_runtime_version.argtypes = []
        _lib = lib
        return lib


def runtime_version() -> int:
    """libjxl's numeric version (major*1e6 + minor*1e3 + patch)."""
    return int(load_library().jxl_runtime_version())


def encode(image: np.ndarray, effort: int = 3) -> bytes:
    """Lossless JPEG XL encode of a 2-D uint8/uint16 grayscale array.

    ``effort=3`` mirrors the reference's ``cjxl -d 0 -e 3`` invocation."""
    if image.ndim != 2:
        raise ValueError("JXL codec expects a 2-D grayscale array")
    if image.dtype not in (np.uint8, np.uint16):
        raise ValueError("JXL codec expects uint8 or uint16")
    lib = load_library()
    h, w = image.shape
    src = np.ascontiguousarray(image)
    cap = src.nbytes * 2 + (1 << 16)
    dst = np.empty(cap, dtype=np.uint8)
    out_size = ctypes.c_size_t(0)
    rc = lib.jxl_encode(
        src.ctypes.data_as(ctypes.c_void_p), h, w,
        image.dtype.itemsize * 8, effort,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(out_size),
    )
    if rc != 0:
        raise RuntimeError(f"jxl_encode failed (rc={rc})")
    return dst[: out_size.value].tobytes()


def probe(data: bytes) -> Tuple[int, int, int]:
    """(height, width, bits_per_sample) from a JXL stream's basic info."""
    import ctypes as C

    lib = load_library()
    src = np.frombuffer(data, dtype=np.uint8)
    h, w, bits = C.c_int(0), C.c_int(0), C.c_int(0)
    rc = lib.jxl_probe(
        src.ctypes.data_as(C.POINTER(C.c_uint8)), src.size,
        C.byref(h), C.byref(w), C.byref(bits),
    )
    if rc != 0:
        raise ValueError("not a JXL stream (or not grayscale)")
    return h.value, w.value, bits.value


def decode(data: bytes) -> np.ndarray:
    """Decode a JXL stream; dtype follows the codestream bit depth."""
    from .jpegls_binding import MAX_DECODE_PIXELS

    lib = load_library()
    src = np.frombuffer(data, dtype=np.uint8)
    ph, pw, pbits = probe(data)           # exact output size from the stream
    if not (0 < ph and 0 < pw and ph * pw <= MAX_DECODE_PIXELS):
        # JXL headers encode dimensions up to 2^30 each; an untrusted
        # stream's probed size must be capped before allocating
        raise ValueError(
            f"Invalid file: JXL header claims {ph}x{pw} pixels "
            f"(cap {MAX_DECODE_PIXELS})"
        )
    dst = np.empty(max(ph * pw, 1), dtype=np.uint16)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    bits = ctypes.c_int(0)
    rc = lib.jxl_decode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), dst.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError(f"not a decodable JXL stream (rc={rc})")
    out = dst[: h.value * w.value].reshape(h.value, w.value).copy()
    # libjxl scales integer samples of depth b to the full uint16 range
    # (v = round(s * 65535 / (2^b - 1))); invert to recover raw samples
    if bits.value < 16:
        scale = (1 << bits.value) - 1
        out = np.round(out.astype(np.float64) * scale / 65535.0).astype(np.uint16)
    if bits.value <= 8:
        return out.astype(np.uint8)
    return out
