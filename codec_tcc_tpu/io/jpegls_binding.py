"""ctypes binding for the native C++ JPEG-LS codec.

Builds ``codec_tcc_tpu/native/libjpegls.so`` on first use (g++ is part of the
baked toolchain; pybind11 is not available in this environment, hence ctypes
— see the project environment notes). The C API is defined in
``codec_tcc_tpu/native/jpegls.cpp``; this module exposes numpy-array
``encode``/``decode`` wrappers used by the ``jls`` entry of the codec
registry (replacing the reference's ``gdcmconv --jpegls`` subprocess round at
``/root/reference/src/codec.py:140-142``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _asan_enabled() -> bool:
    """CODEC_TCC_ASAN=1 selects the ASan+UBSan-instrumented native build —
    the fuzz campaign under sanitizers (tools/fuzz_asan.sh) catches
    out-of-bounds reads that don't segfault, which the plain -O3 campaign
    passes silently. The runner must LD_PRELOAD libasan before the
    interpreter starts (a sanitized .so cannot be dlopen'd into an
    uninstrumented process otherwise)."""
    return os.environ.get("CODEC_TCC_ASAN") == "1"


def _lib_path() -> str:
    name = "libjpegls_asan.so" if _asan_enabled() else "libjpegls.so"
    return os.path.join(_NATIVE_DIR, "build", name)


_LIB_PATH = _lib_path()

_SANITIZE_FLAGS = [
    "-O1", "-g", "-fno-omit-frame-pointer",
    "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
]

# Decode-side allocation bound: the output buffer is sized from the PROBED
# header of an untrusted stream, so dimensions must be capped before
# allocating (a single flipped SOF byte can otherwise claim 65535x65535 —
# an 8.6 GB uint16 buffer). 2^28 pixels (512 MB) is ~64x the largest
# supported medical image while keeping corrupt headers cheap to reject.
MAX_DECODE_PIXELS = 1 << 28

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed: Optional[str] = None


def _build() -> None:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    src = os.path.join(_NATIVE_DIR, "jpegls.cpp")
    opt = _SANITIZE_FLAGS if _asan_enabled() else ["-O3"]
    cmd = [
        "g++", *opt, "-std=c++17", "-fPIC", "-shared", "-Wall",
        "-o", _LIB_PATH, src,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"jpegls native build failed:\n{proc.stderr}")


def load_library() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed is not None:
            raise RuntimeError(_build_failed)
        try:
            src = os.path.join(_NATIVE_DIR, "jpegls.cpp")
            if not os.path.exists(_LIB_PATH) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception as exc:  # remember the failure; don't rebuild-loop
            _build_failed = f"jpegls native library unavailable: {exc}"
            raise RuntimeError(_build_failed) from exc

        lib.jls_encode.restype = ctypes.c_int
        lib.jls_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.jls_decode.restype = ctypes.c_int
        lib.jls_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.jls_probe.restype = ctypes.c_int
        lib.jls_probe.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return lib


def encode(image: np.ndarray, bits: Optional[int] = None) -> bytes:
    """Lossless JPEG-LS encode of a 2-D uint8/uint16 array."""
    if image.ndim != 2:
        raise ValueError("JPEG-LS codec expects a 2-D grayscale array")
    if image.dtype == np.uint8:
        bits = bits or 8
    elif image.dtype == np.uint16:
        bits = bits or 16
    else:
        raise ValueError("JPEG-LS codec expects uint8 or uint16")
    lib = load_library()
    h, w = image.shape
    if h > 65535 or w > 65535:
        raise ValueError(
            f"JPEG-LS (ITU-T T.87) caps dimensions at 65535 without LSE "
            f"extensions; got {h}x{w}"
        )
    src = np.ascontiguousarray(image, dtype=np.uint16)
    cap = src.size * 4 + 1024  # generous worst case (expansion is bounded)
    dst = np.empty(cap, dtype=np.uint8)
    out_size = ctypes.c_size_t(0)
    rc = lib.jls_encode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h, w, bits,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, ctypes.byref(out_size),
    )
    if rc != 0:
        raise RuntimeError(f"jls_encode failed (rc={rc})")
    return dst[: out_size.value].tobytes()


def decode(data: bytes) -> np.ndarray:
    """Decode a JPEG-LS stream to uint8/uint16 based on its precision field."""
    lib = load_library()
    src = np.frombuffer(data, dtype=np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    bits = ctypes.c_int(0)
    rc = lib.jls_probe(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError("not a JPEG-LS stream")
    if not (0 < h.value and 0 < w.value
            and h.value * w.value <= MAX_DECODE_PIXELS):
        # a flipped header byte must not demand an 8.6 GB buffer
        # (65535 x 65535 x uint16): reject before allocating
        raise ValueError(
            f"Invalid file: JPEG-LS header claims {h.value}x{w.value} pixels "
            f"(cap {MAX_DECODE_PIXELS})"
        )
    dst = np.empty(h.value * w.value, dtype=np.uint16)
    rc = lib.jls_decode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), dst.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(bits),
    )
    if rc != 0:
        raise RuntimeError(f"jls_decode failed (rc={rc})")
    out = dst.reshape(h.value, w.value)
    if bits.value <= 8:
        return out.astype(np.uint8)
    return out


def probe(data: bytes) -> Tuple[int, int, int]:
    lib = load_library()
    src = np.frombuffer(data, dtype=np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    bits = ctypes.c_int(0)
    rc = lib.jls_probe(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), src.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError("not a JPEG-LS stream")
    return h.value, w.value, bits.value
