"""Host-side payload bit helpers.

Capability parity with the reference's ``message_to_bits``
(``/root/reference/src/codec.py:239-240``: 8 bits per ``ord(char)``) and the
byte re-packing inside its ``decode_message``
(``/root/reference/src/codec.py:779-787``), re-designed around *bytes*
payloads so arbitrary binary data round-trips exactly (the reference silently
corrupts any character with ``ord(c) > 255``).

Bit order is MSB-first within each byte, matching ``f"{ord(c):08b}"``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bytes_to_bits",
    "bits_to_bytes",
    "message_to_bits",
    "bits_to_message",
    "pack_bits",
    "unpack_bits",
    "expand_bits",
    "packed_planes_to_diff",
    "bounded_inflate",
]


def bounded_inflate(blob: bytes, want: int, what: str) -> bytes:
    """zlib-inflate an UNTRUSTED blob whose exact decompressed size the
    surrounding format's header commits to.

    Plain ``zlib.decompress`` inflates fully before any caller-side length
    check, so a crafted container could expand a few KB into GBs (zip bomb).
    Inflating with ``max_length = want + 1`` bounds the allocation: one extra
    byte distinguishes over-long streams, and a stream that ends early
    (``eof`` unset) is rejected as truncated. Raises ``ValueError`` with an
    ``Invalid file:`` message (the shared corrupt-input contract) on any
    mismatch; the caller still performs its own exact-length validation."""
    import zlib

    try:
        dobj = zlib.decompressobj()
        raw = dobj.decompress(blob, max(want, 0) + 1)
    except zlib.error as exc:
        raise ValueError(f"Invalid file: corrupt {what} ({exc})") from exc
    if dobj.unconsumed_tail or not dobj.eof:
        raise ValueError(
            f"Invalid file: {what} inflates past or short of the "
            f"{want} bytes its header commits to"
        )
    return raw


def bytes_to_bits(payload: bytes) -> np.ndarray:
    """``bytes`` -> uint8 array of 0/1 bits, MSB-first per byte."""
    if len(payload) == 0:
        return np.zeros((0,), dtype=np.uint8)
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.unpackbits(arr)  # MSB-first, matches the reference bit order


def bits_to_bytes(bits: np.ndarray) -> bytes:
    """uint8 0/1 bit array -> bytes; trailing partial bytes are dropped,
    mirroring the reference's ``if len(byte_bits) == 8`` guard
    (``src/codec.py:782``)."""
    bits = np.asarray(bits, dtype=np.uint8)
    n_full = (bits.size // 8) * 8
    if n_full == 0:
        return b""
    return np.packbits(bits[:n_full]).tobytes()


def message_to_bits(message: str) -> np.ndarray:
    """UTF-8 encode then bit-expand.

    For pure-ASCII messages this is bit-identical to the reference's
    ``''.join(f"{ord(c):08b}")`` (``src/codec.py:240``); for non-ASCII it is a
    correct generalization (the reference emits >8-bit chunks and breaks).
    """
    return bytes_to_bits(message.encode("utf-8"))


def bits_to_message(bits: np.ndarray) -> str:
    """Inverse of :func:`message_to_bits`; decodes UTF-8 with replacement,
    matching ``bytes(message_bytes).decode('utf-8', errors='replace')``
    (``src/codec.py:786``)."""
    return bits_to_bytes(bits).decode("utf-8", errors="replace")


def pack_bits(bits: np.ndarray) -> bytes:
    """Dense-pack a 0/1 array into bytes (MSB-first), padding with zeros."""
    return np.packbits(np.asarray(bits, dtype=np.uint8)).tobytes()


def unpack_bits(data: bytes, n_bits: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`, truncated to ``n_bits``."""
    arr = np.frombuffer(data, dtype=np.uint8)
    return np.unpackbits(arr)[:n_bits]


_PLANE_LUTS: dict = {}


def _plane_lut(k: int, dt: np.dtype) -> np.ndarray:
    """(256, 8) table: byte value -> its 8 MSB-first bits, each shifted to
    plane position ``k`` in dtype ``dt``. Cached per (plane, dtype)."""
    key = (k, dt.str)
    lut = _PLANE_LUTS.get(key)
    if lut is None:
        bits = ((np.arange(256)[:, None] >> (7 - np.arange(8))[None, :]) & 1)
        lut = (bits << k).astype(dt)
        _PLANE_LUTS[key] = lut
    return lut


_PAIR_LUTS: dict = {}


def _pair_lut(k: int, dt: np.dtype) -> np.ndarray:
    """(65536, 8) table: the byte pair ``(plane k << 8) | plane k+1`` -> 8
    MSB-first pixels with bits ``k`` and ``k+1`` both set. One gather covers
    two planes (s/2 passes over the output instead of s); the table is
    256x larger (1 MB at uint16) so the win is bounded by cache behaviour —
    measured ~15% on the single-core serving host, consistently positive."""
    key = (k, dt.str)
    lut = _PAIR_LUTS.get(key)
    if lut is None:
        lut = np.ascontiguousarray(
            (_plane_lut(k, dt)[:, None, :] | _plane_lut(k + 1, dt)[None, :, :])
            .reshape(65536, 8)
        )
        _PAIR_LUTS[key] = lut
    return lut


def expand_bits(packed: np.ndarray) -> np.ndarray:
    """``(..., nb) uint8`` packed bytes -> ``(..., nb*8) uint8`` 0/1 bits,
    MSB-first: same output as ``np.unpackbits(..., axis=-1)`` via one cached
    LUT gather — ~10-20x faster on the single-core serving host (unpackbits
    measured ~30 MB/s there)."""
    packed = np.asarray(packed)
    if packed.dtype != np.uint8:
        raise ValueError(f"packed bits must be uint8, got {packed.dtype}")
    return _plane_lut(0, np.dtype(np.uint8))[packed].reshape(
        *packed.shape[:-1], packed.shape[-1] * 8
    )


def packed_planes_to_diff(packed: np.ndarray, dtype) -> np.ndarray:
    """``(..., s, n//8)`` MSB-first bit-packed plane maps -> ``(..., n)``
    integer diff where plane ``k`` contributes bit ``k``.

    One cached 256->8 LUT gather per plane instead of ``np.unpackbits`` +
    per-plane ``astype``/shift/OR. On the serving host's single core the
    LUT route measures ~23x faster, and the unpack it replaces was the
    single largest cost of the batch serving path (round-3 bench
    ``batch_unpack`` stage: 2.7 s of a 3.7 s batch wall)."""
    packed = np.asarray(packed)
    if packed.dtype != np.uint8:
        raise ValueError(f"packed plane maps must be uint8, got {packed.dtype}")
    *lead, s, nb = packed.shape
    dt = np.dtype(dtype)
    if s == 0:
        return np.zeros((*lead, nb * 8), dt)
    if s > 8 * dt.itemsize:
        raise ValueError(f"{s} planes do not fit a {dt} diff")
    diff = None
    k = 0
    while k + 1 < s:
        # two planes per gather via the 16-bit pair table
        idx = packed[..., k, :].astype(np.uint16)
        idx <<= 8
        idx |= packed[..., k + 1, :]
        g = _pair_lut(k, dt)[idx]
        diff = g if diff is None else np.bitwise_or(diff, g, out=diff)
        k += 2
    if k < s:
        g = _plane_lut(k, dt)[packed[..., k, :]]
        diff = g if diff is None else np.bitwise_or(diff, g, out=diff)
    return diff.reshape(*lead, nb * 8)
