"""Native C++ JPEG-LS (ITU-T T.87) codec tests.

The reference delegates JPEG-LS to an external ``gdcmconv`` binary through
temp files (``src/codec.py:132-149``) with a broken decode path (defect B3);
here the codec is an in-process native library with a symmetric contract.
"""

import numpy as np
import pytest

from codec_tcc_tpu.io import jpegls_binding as jls


def test_library_builds_and_loads():
    lib = jls.load_library()
    assert lib is not None


@pytest.mark.parametrize("dtype,hi", [(np.uint8, 256), (np.uint16, 65536), (np.uint16, 4096)])
@pytest.mark.parametrize("shape", [(1, 1), (1, 64), (64, 1), (7, 13), (64, 64), (128, 100)])
def test_roundtrip_random(rng, dtype, hi, shape):
    img = rng.integers(0, hi, size=shape).astype(dtype)
    out = jls.decode(jls.encode(img))
    assert out.dtype == img.dtype and out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_roundtrip_structured(rng):
    """Run-mode-heavy content: flats, gradients, block patterns."""
    cases = [
        np.zeros((33, 57), dtype=np.uint8),
        np.full((64, 64), 255, dtype=np.uint8),
        np.full((64, 64), 65535, dtype=np.uint16),
        (np.arange(64)[:, None] + np.arange(64)[None, :]).astype(np.uint8),
        np.kron(rng.integers(0, 2, (8, 8)), np.ones((8, 8))).astype(np.uint8) * 200,
        np.where(rng.random((100, 100)) < 0.9, 1000,
                 rng.integers(0, 4096, (100, 100))).astype(np.uint16),
    ]
    for img in cases:
        np.testing.assert_array_equal(jls.decode(jls.encode(img)), img)


def test_roundtrip_bundled_images(pe_image, torax_image):
    for img in (pe_image, torax_image):
        blob = jls.encode(img)
        np.testing.assert_array_equal(jls.decode(blob), img)
        # lossless compression actually compresses natural images
        assert len(blob) < img.nbytes


def test_compression_beats_raw_on_smooth_content():
    img = np.full((256, 256), 1234, dtype=np.uint16)
    blob = jls.encode(img)
    assert len(blob) < img.nbytes / 50  # run mode collapses flat regions


def test_probe():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = jls.encode(img)
    assert jls.probe(blob) == (8, 8, 8)
    with pytest.raises(ValueError):
        jls.probe(b"\x00" * 100)


def test_marker_structure():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = jls.encode(img)
    assert blob[:2] == b"\xff\xd8"       # SOI
    assert blob[2:4] == b"\xff\xf7"      # SOF55 (JPEG-LS frame)
    assert blob[-2:] == b"\xff\xd9"      # EOI


def test_explicit_bits_stored(rng):
    """12-bit data in uint16 carriers encodes with P=12."""
    img = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
    blob = jls.encode(img, bits=12)
    assert jls.probe(blob)[2] == 12
    np.testing.assert_array_equal(jls.decode(blob), img)


def test_invalid_inputs(rng):
    with pytest.raises(ValueError):
        jls.encode(np.zeros((4, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        jls.encode(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError):
        jls.decode(b"not a jpeg-ls stream at all")


def test_garbage_after_header_fails_cleanly(rng):
    img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    blob = bytearray(jls.encode(img))
    # corrupt the entropy data heavily
    for i in range(30, min(len(blob) - 2, 200), 3):
        blob[i] ^= 0xA5
    try:
        out = jls.decode(bytes(blob))
        assert out.shape == (32, 32)  # may decode to junk, must not crash
    except (RuntimeError, ValueError):
        pass  # clean failure is equally acceptable


def test_encapsulated_dicom_frame_decode(rng):
    """The DICOM reader can decode JPEG-LS transfer-syntax fragments through
    the codec registry (capability the reference lacks entirely)."""
    from codec_tcc_tpu.io.codecs import decode_transfer_syntax_frame
    from codec_tcc_tpu.io.dicom import JPEGLS_LOSSLESS

    img = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
    frag = jls.encode(img)
    out = decode_transfer_syntax_frame(frag, JPEGLS_LOSSLESS)
    np.testing.assert_array_equal(out, img)
