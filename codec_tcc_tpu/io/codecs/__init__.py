"""Symmetric lossless image codec registry.

The reference's transport-codec layer (``/root/reference/src/codec.py:108-209``)
is asymmetric and partly broken: ``compress_image`` returns whole-DICOM-file
bytes for j2k/jls while ``decompress_image`` stuffs them unencapsulated into a
dummy dataset (defect B3, SURVEY §2.4), and the JXL path shells out to
Windows-named binaries. This registry fixes that with one contract
(SURVEY §7 stage 4):

    encode(array: np.ndarray) -> bytes      # self-describing payload
    decode(data: bytes) -> np.ndarray       # exact inverse

Backends (capability-detected at runtime, ``available()``):

* ``deflate`` — zlib with a tiny shape/dtype header; always available.
* ``png``     — PIL PNG (8-bit L / 16-bit I;16), always available here.
* ``j2k``     — PIL/OpenJPEG reversible JPEG 2000 (replaces ``gdcmconv --j2k``).
* ``jls``     — native C++ JPEG-LS (ITU-T T.87) via ctypes (replaces
  ``gdcmconv --jpegls``); see ``codec_tcc_tpu/native/jpegls.cpp``.
* ``jxl``     — external ``cjxl``/``djxl`` binaries when present on PATH
  (the reference hardcodes ``cjxl.exe``, src/codec.py:121,175).

Codec ids 1-4 keep the reference's container mapping
(``{'png':1,'j2k':2,'jls':3,'jxl':4}``, src/codec.py:616); deflate is 5.
"""

from __future__ import annotations

import abc
import struct
import zlib
from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "Codec",
    "get",
    "by_id",
    "names",
    "available_names",
    "register",
    "decode_transfer_syntax_frame",
]


class Codec(abc.ABC):
    name: str = ""
    codec_id: int = 0

    @abc.abstractmethod
    def available(self) -> bool: ...

    @abc.abstractmethod
    def encode(self, image: np.ndarray) -> bytes: ...

    @abc.abstractmethod
    def decode(self, data: bytes) -> np.ndarray: ...


_REGISTRY: Dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    _REGISTRY[codec.name] = codec
    return codec


def get(name: str) -> Codec:
    try:
        codec = _REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"Codec '{name}' not supported (have: {sorted(_REGISTRY)})"
        ) from None
    if not codec.available():
        raise RuntimeError(
            f"Codec '{name}' is registered but unavailable in this environment"
        )
    return codec


def by_id(codec_id: int) -> Codec:
    for codec in _REGISTRY.values():
        if codec.codec_id == codec_id:
            return codec
    raise ValueError(f"Unknown codec id {codec_id}")


def names() -> List[str]:
    return sorted(_REGISTRY)


def available_names() -> List[str]:
    return sorted(n for n, c in _REGISTRY.items() if c.available())


# ---------------------------------------------------------------------------
# deflate — always-available baseline (SURVEY §7 stage 3: "deflate as the only
# codec of the minimum slice, pure-Python zlib, no external binaries")
# ---------------------------------------------------------------------------

_DEFLATE_MAGIC = b"SDFL"
_DTYPE_CODES = {np.dtype(np.uint8): 1, np.dtype(np.uint16): 2}
_CODE_DTYPES = {1: np.uint8, 2: np.uint16}


class DeflateCodec(Codec):
    name = "deflate"
    codec_id = 5

    def available(self) -> bool:
        return True

    def encode(self, image: np.ndarray) -> bytes:
        # Z_RLE at level 1: ~1.7x faster than the default match strategy at
        # the same level for ~6-9% larger output on stego pixel data
        # (measured pe.dcm 8.7ms/342KB vs 14.5ms/313KB, torax 4.8 vs 8.1ms);
        # the single-core host shell is the serving path's bottleneck and
        # the strategy is not part of the format — any zlib stream decodes
        co = zlib.compressobj(1, zlib.DEFLATED, 15, 9, zlib.Z_RLE)
        if image.dtype == np.uint16:
            # byte-plane split (code 3): all low bytes, then all high bytes.
            # Interleaved lo,hi,lo,hi breaks the byte runs RLE feeds on; for
            # 12-bit medical data the high plane is near-constant, so the
            # split is strictly better on every axis (pe.dcm stego: 5.7 ->
            # 4.5 ms encode, 3.9 -> 2.7 ms decode, 342 -> 260 KB payload)
            code = 3
            raw = (
                (image & 0xFF).astype(np.uint8).tobytes()
                + (image >> 8).astype(np.uint8).tobytes()
            )
        else:
            code = _DTYPE_CODES[np.dtype(image.dtype)]
            raw = np.ascontiguousarray(image).tobytes()
        header = _DEFLATE_MAGIC + struct.pack(">BII", code, *image.shape)
        return header + co.compress(raw) + co.flush()

    def decode(self, data: bytes) -> np.ndarray:
        if data[:4] != _DEFLATE_MAGIC:
            raise ValueError("Not a deflate codec payload")
        try:
            code, h, w = struct.unpack(">BII", data[4:13])
            # code 2 (interleaved uint16) is the pre-round-3 layout: still
            # written by nothing, still decoded forever (golden .stgc
            # fixtures and old containers carry it)
            dtype = np.dtype(np.uint16 if code == 3 else _CODE_DTYPES[code])
        except (struct.error, KeyError) as exc:
            raise ValueError(f"Invalid file: corrupt deflate payload ({exc})") from exc
        from ..jpegls_binding import MAX_DECODE_PIXELS

        if not (0 < h and 0 < w and h * w <= MAX_DECODE_PIXELS):
            raise ValueError(
                f"Invalid file: deflate header claims {h}x{w} pixels "
                f"(cap {MAX_DECODE_PIXELS})"
            )
        # bounded inflate: the header fixes the exact byte count, so an
        # untrusted stream must never decompress past it (zip bomb)
        from ...utils.bits import bounded_inflate

        raw = bounded_inflate(
            data[13:], h * w * dtype.itemsize, "deflate payload"
        )
        if len(raw) != h * w * dtype.itemsize:
            raise ValueError(
                f"Invalid file: deflate payload holds {len(raw)} bytes, "
                f"header says {h}x{w} {dtype}"
            )
        if code == 3:
            planes = np.frombuffer(raw, dtype=np.uint8)
            n = h * w
            return (
                planes[:n].astype(np.uint16)
                | (planes[n:].astype(np.uint16) << 8)
            ).reshape(h, w)
        return np.frombuffer(raw, dtype=dtype).reshape(h, w).copy()


# ---------------------------------------------------------------------------
# PNG / JPEG 2000 via PIL
# ---------------------------------------------------------------------------


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _to_pil(image: np.ndarray):
    from PIL import Image

    # PIL maps uint16 -> I;16 and uint8 -> L automatically
    return Image.fromarray(image)


def _from_pil(img) -> np.ndarray:
    arr = np.array(img)
    if arr.dtype == np.int32:  # PIL 'I' mode for 16-bit sources
        arr = arr.astype(np.uint16)
    return arr


class PngCodec(Codec):
    """Deflate-family codec id 1.

    Encoding produces a real PNG. Decoding ALSO accepts the reference's
    actual 'png' payload — which despite the name is a whole **deflated
    DICOM file** (``DeflatedExplicitVRLittleEndian`` bytes,
    src/codec.py:151-162) — so v1 containers written by the reference
    decode here without conversion.
    """

    name = "png"
    codec_id = 1

    def available(self) -> bool:
        return _pil_available()

    def encode(self, image: np.ndarray) -> bytes:
        import io

        buf = io.BytesIO()
        _to_pil(image).save(buf, format="PNG", optimize=True)
        return buf.getvalue()

    def decode(self, data: bytes) -> np.ndarray:
        import io

        from PIL import Image

        if len(data) > 132 and data[128:132] == b"DICM":
            from ..dicom import read_bytes

            return read_bytes(data).pixel_array
        try:
            return _from_pil(Image.open(io.BytesIO(data)))
        except OSError as exc:   # PIL UnidentifiedImageError / truncated file
            raise ValueError(f"Invalid file: not a decodable image ({exc})") from exc


def _maybe_decode_dicom_payload(data: bytes):
    """The reference's ``compress_image`` returns **whole compressed DICOM
    file bytes** for j2k/jls (it runs ``gdcmconv`` on a temp DICOM and reads
    the output file back, ``/root/reference/src/codec.py:132-149``), so a
    reference-written v1 container with codec id 2/3 carries a Part-10 DICOM
    in its stego slot, not a bare codestream. Sniff the ``DICM`` magic (same
    rule :class:`PngCodec` uses for the reference's deflated-DICOM 'png'
    payloads) and decode through the encapsulated-frame path; return None
    for bare codestreams."""
    if len(data) > 132 and data[128:132] == b"DICM":
        from ..dicom import read_bytes

        return read_bytes(data).pixel_array
    return None


class J2kCodec(Codec):
    """Reversible (lossless) JPEG 2000 via PIL/OpenJPEG — symmetric
    replacement for the reference's ``gdcmconv --j2k`` round (defect B3)."""

    name = "j2k"
    codec_id = 2

    def available(self) -> bool:
        if not _pil_available():
            return False
        from PIL import features

        return bool(features.check("jpg_2000"))

    def encode(self, image: np.ndarray) -> bytes:
        import io

        buf = io.BytesIO()
        _to_pil(image).save(buf, format="JPEG2000", irreversible=False)
        return buf.getvalue()

    def decode(self, data: bytes) -> np.ndarray:
        import io

        from PIL import Image

        arr = _maybe_decode_dicom_payload(data)
        if arr is not None:
            return arr
        return _from_pil(Image.open(io.BytesIO(data)))


# ---------------------------------------------------------------------------
# JPEG-LS via the native C++ library (ctypes binding)
# ---------------------------------------------------------------------------


class JlsCodec(Codec):
    name = "jls"
    codec_id = 3

    def _lib(self):
        from ..jpegls_binding import load_library

        return load_library()

    def available(self) -> bool:
        try:
            return self._lib() is not None
        except Exception:
            return False

    def encode(self, image: np.ndarray) -> bytes:
        from ..jpegls_binding import encode as jls_encode

        return jls_encode(image)

    def decode(self, data: bytes) -> np.ndarray:
        from ..jpegls_binding import decode as jls_decode

        arr = _maybe_decode_dicom_payload(data)
        if arr is not None:
            return arr
        return jls_decode(data)


# ---------------------------------------------------------------------------
# JPEG XL: in-process libjxl shim, with the reference's subprocess binaries
# as a fallback
# ---------------------------------------------------------------------------


class JxlCodec(Codec):
    """JPEG XL lossless (codec id 4).

    Primary path: the in-process ``libjxl`` shim
    (:mod:`codec_tcc_tpu.io.jxl_binding`) — no subprocess, no temp files.
    Fallback: ``cjxl``/``djxl`` binaries on PATH, the reference's mechanism
    (``/root/reference/src/codec.py:108-182``, temp-PNG detour included)."""

    name = "jxl"
    codec_id = 4

    def _binding(self):
        from .. import jxl_binding

        return jxl_binding if jxl_binding.available() else None

    def _tools(self) -> Optional[tuple]:
        import shutil

        # accept both unix and the reference's Windows names (src/codec.py:121)
        for enc, dec in (("cjxl", "djxl"), ("cjxl.exe", "djxl.exe")):
            e, d = shutil.which(enc), shutil.which(dec)
            if e and d:
                return e, d
        return None

    def available(self) -> bool:
        return self._binding() is not None or self._tools() is not None

    def encode(self, image: np.ndarray) -> bytes:
        binding = self._binding()
        if binding is not None:
            try:
                return binding.encode(image)
            except RuntimeError:
                # libjxl present but the shim build failed (no compiler,
                # read-only package dir, ...): use the binaries if any
                if self._tools() is None:
                    raise
        return self._encode_subprocess(image)

    def decode(self, data: bytes) -> np.ndarray:
        binding = self._binding()
        if binding is not None:
            try:
                return binding.decode(data)
            except RuntimeError:
                if self._tools() is None:
                    raise
        return self._decode_subprocess(data)

    def _encode_subprocess(self, image: np.ndarray) -> bytes:
        import subprocess
        import tempfile
        import os

        tools = self._tools()
        if tools is None:
            raise RuntimeError("libjxl not present and cjxl/djxl not on PATH")
        enc, _ = tools
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.png")
            dst = os.path.join(td, "out.jxl")
            _to_pil(image).save(src, format="PNG")
            subprocess.run(
                [enc, src, dst, "-d", "0", "-e", "3"],
                check=True, capture_output=True, timeout=120,
            )
            with open(dst, "rb") as f:
                return f.read()

    def _decode_subprocess(self, data: bytes) -> np.ndarray:
        import subprocess
        import tempfile
        import os

        from PIL import Image

        tools = self._tools()
        if tools is None:
            raise RuntimeError("libjxl not present and cjxl/djxl not on PATH")
        _, dec = tools
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.jxl")
            dst = os.path.join(td, "out.png")
            with open(src, "wb") as f:
                f.write(data)
            subprocess.run([dec, src, dst], check=True, capture_output=True, timeout=120)
            return _from_pil(Image.open(dst))


register(DeflateCodec())
register(PngCodec())
register(J2kCodec())
register(JlsCodec())
register(JxlCodec())


def decode_transfer_syntax_frame(fragment: bytes, transfer_syntax: str) -> np.ndarray:
    """Decode one encapsulated DICOM pixel-data fragment (used by
    :mod:`codec_tcc_tpu.io.dicom` for JPEG2000/JPEG-LS transfer syntaxes)."""
    from ..dicom import JPEG2000_LOSSLESS, JPEGLS_LOSSLESS

    if transfer_syntax == JPEG2000_LOSSLESS:
        return get("j2k").decode(fragment)
    if transfer_syntax == JPEGLS_LOSSLESS:
        return get("jls").decode(fragment)
    raise ValueError(f"Unsupported encapsulated transfer syntax {transfer_syntax}")
