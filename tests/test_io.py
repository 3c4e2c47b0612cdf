"""DICOM I/O, codec registry, and container format unit tests."""

import numpy as np
import pytest
import zlib

from codec_tcc_tpu.io import container as container_io
from codec_tcc_tpu.io import dicom
from codec_tcc_tpu.io import codecs


# ---------------------------------------------------------------------------
# DICOM
# ---------------------------------------------------------------------------


def test_read_bundled_images_metadata():
    """Facts verified by the survey's manual tag parse (SURVEY §0 table)."""
    ds = dicom.read_file("/root/reference/images/pe.dcm")
    assert ds.transfer_syntax == dicom.EXPLICIT_VR_LE
    assert (ds.rows, ds.columns) == (512, 512)
    assert ds.bits_allocated == 16 and ds.bits_stored == 12 and ds.high_bit == 11
    assert ds.modality == "MR"
    arr = ds.pixel_array
    assert arr.dtype == np.uint16 and int(arr.max()) == 836

    ds2 = dicom.read_file("/root/reference/images/torax.dcm")
    assert ds2.transfer_syntax == dicom.IMPLICIT_VR_LE
    assert ds2.bits_allocated == 8 and ds2.bits_stored == 8
    arr2 = ds2.pixel_array
    assert arr2.dtype == np.uint8 and int(arr2.max()) == 255


@pytest.mark.parametrize("dtype,maxv", [(np.uint8, 255), (np.uint16, 836)])
def test_secondary_capture_roundtrip(rng, dtype, maxv):
    img = rng.integers(0, maxv + 1, size=(96, 64)).astype(dtype)
    data = dicom.to_bytes(dicom.build_secondary_capture(img))
    ds = dicom.read_bytes(data)
    np.testing.assert_array_equal(ds.pixel_array, img)
    # BitsStored = ceil(log2(max+1)) rule (src/codec.py:30-32)
    assert ds.bits_stored == max(1, int(img.max()).bit_length())
    assert ds.get_str((0x0010, 0x0010)) == "STEGO^"
    assert ds.photometric_interpretation == "MONOCHROME2"


def test_deflated_transfer_syntax_roundtrip(rng):
    img = rng.integers(0, 4096, size=(40, 56)).astype(np.uint16)
    data = dicom.to_bytes(dicom.build_secondary_capture(img), deflated=True)
    ds = dicom.read_bytes(data)
    assert ds.transfer_syntax == dicom.DEFLATED_EXPLICIT_VR_LE
    np.testing.assert_array_equal(ds.pixel_array, img)


def test_invalid_inputs():
    with pytest.raises(ValueError):
        # 3-D is now multiframe-valid; 4-D is not
        dicom.build_secondary_capture(np.zeros((2, 4, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        dicom.build_secondary_capture(np.zeros((4, 4), dtype=np.int32))


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["deflate", "png", "j2k", "jls"])
@pytest.mark.parametrize("dtype,hi", [(np.uint8, 256), (np.uint16, 65536)])
def test_codec_symmetry(rng, name, dtype, hi):
    """Property-tested encode/decode round-trip — the defect-B3 fix contract."""
    codec = codecs.get(name)
    img = rng.integers(0, hi, size=(64, 48)).astype(dtype)
    blob = codec.encode(img)
    out = codec.decode(blob)
    assert out.dtype == img.dtype
    np.testing.assert_array_equal(out, img)


def test_deflate_legacy_interleaved_layout_decodes(rng):
    """Pre-round-3 SDFL payloads (code 2: interleaved uint16 bytes) must
    decode forever — old containers and the golden .stgc fixtures carry
    them. Round-3 encode writes code 3 (byte-plane split: the high plane of
    12-bit data is near-constant, so splitting is faster AND ~24% smaller
    under the same Z_RLE deflate)."""
    import struct
    import zlib

    img = rng.integers(0, 4096, size=(32, 24)).astype(np.uint16)
    legacy = (b"SDFL" + struct.pack(">BII", 2, 32, 24)
              + zlib.compress(img.tobytes()))
    np.testing.assert_array_equal(codecs.get("deflate").decode(legacy), img)
    # and the current encoder emits the split layout for uint16
    blob = codecs.get("deflate").encode(img)
    assert blob[4] == 3
    n = img.size
    raw = zlib.decompress(blob[13:])
    assert raw[:n] == (img & 0xFF).astype(np.uint8).tobytes()
    assert raw[n:] == (img >> 8).astype(np.uint8).tobytes()


def test_codec_registry():
    assert set(codecs.names()) == {"deflate", "png", "j2k", "jls", "jxl"}
    avail = codecs.available_names()
    assert {"deflate", "png", "j2k", "jls"} <= set(avail)
    with pytest.raises(ValueError):
        codecs.get("nope")
    # jxl binaries are absent in this environment -> clear runtime error
    if "jxl" not in avail:
        with pytest.raises(RuntimeError):
            codecs.get("jxl")


def test_codec_ids_match_reference():
    """Container ids must keep the reference mapping (src/codec.py:616)."""
    assert codecs.get("png").codec_id == 1
    assert codecs.get("j2k").codec_id == 2
    assert codecs.by_id(3).name == "jls"
    assert codecs.by_id(4).name == "jxl"
    assert codecs.get("deflate").codec_id == 5


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _meta(**kw):
    defaults = dict(
        version=2, codec="deflate", strategy="hybrid", s=3, nbits=8,
        bits_stored=8, dtype=np.dtype(np.uint8), width=64, height=48,
        start_offset=1234, seed=42, payload_bits=999,
        align_across_planes=False, has_bitmaps=True,
        sizes=(500, 300, 199), indices=(2, 0, 1), eff_lengths=(500, 300, 199),
        plane_starts=(10, 20, 30), ext=b"",
    )
    defaults.update(kw)
    return container_io.ContainerMeta(**defaults)


def test_v2_pack_parse_roundtrip():
    meta = _meta()
    maps = np.zeros((3, 48, 64), dtype=np.uint8)
    blob = container_io.pack(meta, container_io.compress_bitmaps(maps), b"STEGO")
    cont = container_io.parse(blob)
    m = cont.meta
    assert (m.version, m.codec, m.strategy, m.s) == (2, "deflate", "hybrid", 3)
    assert (m.width, m.height, m.start_offset, m.seed) == (64, 48, 1234, 42)
    assert m.payload_bits == 999
    assert m.sizes == (500, 300, 199)
    assert m.indices == (2, 0, 1)
    assert m.plane_starts == (10, 20, 30)
    assert cont.stego_blob == b"STEGO"
    np.testing.assert_array_equal(cont.bitmaps(), maps)


def test_v2_packed_bitmaps_roundtrip(rng):
    """v2.1 FLAG_PACKED_BITMAPS: the blob zlibs bit-PACKED planes; parse
    reports the flag and bitmaps() returns the identical unpacked maps.
    Both writer inputs — unpacked (s,H,W) maps and the device's already
    bit-packed (s,H*W/8) download — must produce the same blob."""
    maps = rng.integers(0, 2, size=(3, 48, 64)).astype(np.uint8)
    packed = np.packbits(maps.reshape(3, -1), axis=1)
    meta = _meta(bitmaps_packed=True)
    blob_a = container_io.compress_bitmaps_packed(maps)
    blob_b = container_io.compress_bitmaps_packed(packed)
    assert blob_a == blob_b
    cont = container_io.parse(container_io.pack(meta, blob_a, b"STEGO"))
    assert cont.meta.bitmaps_packed
    np.testing.assert_array_equal(cont.bitmaps(), maps)
    # unpacked blobs (flag off) keep parsing — on-disk back-compat with
    # round-1/2 v2 files (the golden fixtures pin this end-to-end too)
    cont2 = container_io.parse(
        container_io.pack(_meta(), container_io.compress_bitmaps(maps), b"S")
    )
    assert not cont2.meta.bitmaps_packed
    np.testing.assert_array_equal(cont2.bitmaps(), maps)
    # a packed blob whose bit count disagrees with the header must refuse
    bad = container_io.pack(
        _meta(bitmaps_packed=True), container_io.compress_bitmaps_packed(
            packed[:, :-1]
        ), b"S",
    )
    with pytest.raises(ValueError, match="Invalid file"):
        container_io.parse(bad).bitmaps()


def test_v2_negative_planned_size():
    """The reference's excess correction can go negative (SURVEY B-edge);
    v2 stores signed sizes."""
    meta = _meta(sizes=(-1, 2, 1), eff_lengths=(0, 2, 1), payload_bits=2)
    blob = container_io.pack(meta, b"", b"")
    assert container_io.parse(blob).meta.sizes == (-1, 2, 1)


def test_v2_wide_fields():
    """Defect B5 fixed: fields the v1 >H format cannot hold. Dims exceed
    65535 (the v1 struct cap) while the pixel count stays inside the parse
    guard (`_check_dims` caps H*W at MAX_DECODE_PIXELS — test_advice_fixes
    covers the rejection side)."""
    meta = _meta(width=70_000, height=3_000, start_offset=1_000_000,
                 eff_lengths=(300_000, 200_000, 100_000), payload_bits=600_000)
    cont = container_io.parse(container_io.pack(meta, b"", b""))
    assert cont.meta.width == 70_000
    assert cont.meta.start_offset == 1_000_000
    assert cont.meta.eff_lengths == (300_000, 200_000, 100_000)


def test_v1_limits_preserved():
    """v1 keeps the reference's struct caps (defect B5 documented behavior)."""
    import struct

    with pytest.raises(struct.error):
        container_io.pack_v1("png", 1, [70_000], [0], b"", b"", 512, 512, 0, False)


def test_v1_pack_parse_roundtrip():
    blob = container_io.pack_v1(
        "jxl", 2, [100, 200], [1, 0], zlib.compress(b"\0" * 8), b"IMG",
        512, 512, 77, True,
    )
    cont = container_io.parse(blob)
    assert cont.meta.version == 1
    assert cont.meta.codec == "jxl"
    assert cont.meta.s == 2
    assert cont.meta.start_offset == 77
    assert cont.meta.align_across_planes is True
    assert cont.meta.sizes == (100, 200)
    assert cont.stego_blob == b"IMG"


def test_bad_magic():
    with pytest.raises(ValueError):
        container_io.parse(b"NOPE" + b"\0" * 100)


def test_encapsulated_dicom_write_read(rng):
    """Compressed encapsulated DICOMs (the reference's gdcmconv output
    equivalent, src/codec.py:132-149) round-trip through our own writer and
    reader via the codec registry."""
    for ts, hi, dt, bits in [
        (dicom.JPEGLS_LOSSLESS, 4096, np.uint16, 12),
        (dicom.JPEGLS_LOSSLESS, 256, np.uint8, 8),
        (dicom.JPEG2000_LOSSLESS, 256, np.uint8, 8),
    ]:
        img = rng.integers(0, hi, (64, 64)).astype(dt)
        data = dicom.to_bytes(
            dicom.build_secondary_capture(img, bits_stored=bits),
            transfer_syntax=ts,
        )
        ds = dicom.read_bytes(data)
        assert ds.transfer_syntax == ts
        np.testing.assert_array_equal(ds.pixel_array, img)


def test_encapsulated_compresses_real_image(pe_image):
    data = dicom.to_bytes(
        dicom.build_secondary_capture(pe_image, bits_stored=12),
        transfer_syntax=dicom.JPEGLS_LOSSLESS,
    )
    assert len(data) < pe_image.nbytes / 2  # ~2.9x on pe.dcm
    ds = dicom.read_bytes(data)
    np.testing.assert_array_equal(ds.pixel_array, pe_image)


def test_container_fuzz_truncation(pe_image, rng):
    """Truncated/corrupted containers fail with clear errors, never crash."""
    from codec_tcc_tpu import EncodeConfig, encode_array

    res = encode_array(pe_image[:64, :64].copy(), b"xx",
                       EncodeConfig(compute_metrics=False))
    blob = res.container
    for cut in [0, 3, 5, 8, 12, 20, len(blob) // 2]:
        with pytest.raises((ValueError, Exception)):
            c = container_io.parse(blob[:cut])
            # parsing may succeed for large cuts; decoding must then fail
            from codec_tcc_tpu import decode_container

            decode_container(blob[:cut])
    for _ in range(5):  # random byte corruption in the header region
        b = bytearray(blob)
        for i in rng.integers(4, 40, size=4):
            b[int(i)] ^= 0xFF
        try:
            container_io.parse(bytes(b))
        except (ValueError, Exception):
            pass  # any clean Python exception is acceptable


def test_dicom_fuzz_truncation(rng):
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = dicom.to_bytes(dicom.build_secondary_capture(img))
    for cut in [10, 100, 140, len(data) - 20]:
        try:
            dicom.read_bytes(data[:cut])
        except Exception as exc:
            assert not isinstance(exc, (SystemExit, MemoryError))
