"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. jls_decode size_t underflow on a truncated entropy segment (medium);
2. v1 containers refusing plans whose planned sizes != embedded lengths (low);
3. jls_encode rejecting dimensions beyond T.87's 16-bit header fields (low);
4. decode_pee_container raising ValueError (not struct/zlib errors) on
   corrupt extension blocks and overflow-map blobs (low).
"""

import struct
import zlib

import numpy as np
import pytest

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.io import container as container_io
from codec_tcc_tpu.io import jpegls_binding as jls
from codec_tcc_tpu.pipeline import decode_container, encode_array


def test_jls_truncated_entropy_segment_rejected(rng):
    """ADVICE #1: data_start == n-1 used to wrap `n - data_start - 2` to
    SIZE_MAX and read out of bounds; it must fail cleanly instead."""
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    blob = jls.encode(img)
    # locate the SOS marker and compute the entropy-data start
    pos = blob.index(b"\xff\xda")
    seg_len = (blob[pos + 2] << 8) | blob[pos + 3]
    data_start = pos + 2 + seg_len
    # keep exactly one byte of entropy data: data_start == n - 1
    truncated = blob[: data_start + 1]
    with pytest.raises((RuntimeError, ValueError)):
        jls.decode(truncated)
    # zero bytes after the header must fail too
    with pytest.raises((RuntimeError, ValueError)):
        jls.decode(blob[:data_start])


def test_jls_oversize_dimensions_rejected():
    """ADVICE #3: T.87 SOF55 caps h/w at 65535; larger must raise, not
    silently truncate into a stream with the wrong geometry."""
    img = np.zeros((1, 70_000), dtype=np.uint8)
    with pytest.raises(ValueError, match="65535"):
        jls.encode(img)


def test_v1_refuses_unreplayable_plan(torax_image):
    """ADVICE #2: a 1-bit payload at s=3 plans sizes (-1, 1, 1); v1 stores
    only effective lengths, so its decode-side offset replay would misjoin
    the payload. encode must refuse v1 for such plans."""
    payload = np.array([1], dtype=np.uint8)
    cfg = EncodeConfig(
        strategy="multi_plane", container_version=1, codec="png",
        compute_metrics=False,
    )
    with pytest.raises(ValueError, match="v1 container"):
        encode_array(torax_image, payload, cfg)
    # the same plan round-trips through v2 (stores signed planned sizes)
    cfg2 = cfg.with_overrides(container_version=2, codec="deflate")
    res = encode_array(torax_image, payload, cfg2)
    dec = decode_container(res.container)
    np.testing.assert_array_equal(dec.payload_bits, payload)


@pytest.fixture(scope="module")
def pee_container(rng):
    img = np.random.default_rng(7).integers(0, 256, size=(64, 64)).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)
    res = encode_array(img, b"hello pee", cfg)
    return container_io.parse(res.container)


def test_pee_truncated_ext_is_valueerror(pee_container):
    """ADVICE #4a: a truncated PEE ext block must raise ValueError (which the
    CLI error handler catches), not struct.error."""
    from dataclasses import replace

    meta = replace(pee_container.meta, ext=pee_container.meta.ext[:5])
    blob = container_io.pack(meta, pee_container.bitmaps_blob,
                             pee_container.stego_blob)
    with pytest.raises(ValueError, match="PEE extension"):
        decode_container(blob)


def test_pee_corrupt_map_blob_is_valueerror(pee_container):
    """ADVICE #4b: a non-zlib overflow-map blob must raise ValueError, not
    zlib.error."""
    blob = container_io.pack(pee_container.meta, b"\x00garbage not zlib",
                             pee_container.stego_blob)
    with pytest.raises(ValueError, match="overflow map"):
        decode_container(blob)


# ---------------------------------------------------------------------------
# round-3 advisor findings: untrusted header dims must not scale inflate
# bounds (container bitmap blob and PEE overflow map)
# ---------------------------------------------------------------------------


def _huge_dims_blob(cont, width, height):
    from dataclasses import replace

    meta = replace(cont.meta, width=width, height=height)
    return container_io.pack(meta, cont.bitmaps_blob, cont.stego_blob)


def test_v2_huge_dims_rejected_at_parse(pee_container):
    """round-3 ADVICE #1/#2: a crafted header claiming huge dims used to set
    a multi-GB bounded_inflate cap for the bitmap / overflow-map blobs; the
    dims must be rejected at parse time (cap MAX_DECODE_PIXELS)."""
    blob = _huge_dims_blob(pee_container, 0xFFFF_FFF0, 0xFFFF_FFF0)
    with pytest.raises(ValueError, match="Invalid file"):
        container_io.parse(blob)
    # zero dims are equally invalid
    blob = _huge_dims_blob(pee_container, 0, 64)
    with pytest.raises(ValueError, match="Invalid file"):
        container_io.parse(blob)


def test_v2_oversize_s_rejected_at_parse(torax_image):
    """A stray s byte (<=255) must not multiply the bitmap inflate bound
    255x; parse caps s at 32 (any supported dtype has nbits <= 16)."""
    cfg = EncodeConfig(strategy="multi_plane", codec="deflate",
                       compute_metrics=False)
    res = encode_array(torax_image, b"hi", cfg)
    blob = bytearray(res.container)
    # header layout: MAGIC(4) + >I len(4) + >BBBBBBBB -> s is header byte 3
    assert blob[8] == 2  # version
    blob[8 + 3] = 200
    with pytest.raises(ValueError, match="Invalid file"):
        container_io.parse(bytes(blob))


def test_v1_huge_dims_rejected_at_parse():
    """The v1 parser shares the dims guard (>H fields still allow 65535^2
    ~ 4.3 GPix, 16x past MAX_DECODE_PIXELS)."""
    header = struct.pack(">BBBBHHH", 1, 1, 3, 0, 65535, 65535, 0)
    header += struct.pack(">3H", 8, 8, 8) + struct.pack(">3B", 0, 1, 2)
    header += struct.pack(">I", 0)
    blob = container_io.MAGIC + struct.pack(">I", len(header)) + header
    with pytest.raises(ValueError, match="Invalid file"):
        container_io.parse(blob)


def test_pee_parts_check_dims_even_without_parse(pee_container):
    """Defense in depth: parse_pee_container_parts re-checks dims (its n =
    h*w feeds the overflow-map inflate bound and expand_bits multiplies the
    inflated bytes 8x)."""
    from dataclasses import replace

    from codec_tcc_tpu.models.pee import parse_pee_container_parts

    meta = replace(pee_container.meta, width=1 << 20, height=1 << 20)
    cont = container_io.Container(meta, pee_container.bitmaps_blob,
                                  pee_container.stego_blob)
    with pytest.raises(ValueError, match="Invalid file"):
        parse_pee_container_parts(cont)


def test_max_pixel_dims_still_parse(pee_container):
    """The guard must not reject legitimate geometry: dims at exactly the
    cap parse fine (decode then fails later on blob size, not on dims)."""
    from codec_tcc_tpu.io.jpegls_binding import MAX_DECODE_PIXELS

    side = 1 << 14
    assert side * side <= MAX_DECODE_PIXELS
    blob = _huge_dims_blob(pee_container, side, side)
    cont = container_io.parse(blob)
    assert cont.meta.width == side


def test_pee_short_map_blob_is_valueerror(pee_container):
    """A valid-zlib blob holding fewer bits than the image must also fail
    with a clear ValueError, not a reshape error."""
    short = zlib.compress(b"\x00" * 8)  # 64 bits << 64*64 pixels
    blob = container_io.pack(pee_container.meta, short,
                             pee_container.stego_blob)
    with pytest.raises(ValueError, match="overflow map"):
        decode_container(blob)
