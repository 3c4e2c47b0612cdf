"""End-to-end golden tests: encode -> container -> decode -> exact payload +
bit-identical images on the bundled DICOMs (SURVEY §4 item 3, §7 stage 3
"end of minimum slice")."""

import numpy as np
import pytest

from codec_tcc_tpu import EncodeConfig, decode_container, encode_array, encode_dicom
from codec_tcc_tpu.io import container as container_io


MESSAGE = "Mensagem de teste para esteganografia!"


@pytest.mark.parametrize("which", ["pe", "torax"])
@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid", "block_adaptive"])
def test_roundtrip_strategies(which, strategy, pe_image, torax_image):
    image = pe_image if which == "pe" else torax_image
    cfg = EncodeConfig(strategy=strategy, codec="deflate", compute_metrics=False)
    res = encode_array(image, MESSAGE, cfg)
    dec = decode_container(res.container)
    assert dec.message == MESSAGE
    # stego image survives the transport codec bit-exactly
    np.testing.assert_array_equal(dec.stego, res.stego)
    # reversibility: original restored exactly from stego + XOR maps
    np.testing.assert_array_equal(dec.original, image)


def test_roundtrip_binary_payload(pe_image, rng):
    payload = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    cfg = EncodeConfig(strategy="hybrid", beta=0.8, compute_metrics=False)
    res = encode_array(pe_image, payload, cfg)
    dec = decode_container(res.container)
    assert dec.payload[: len(payload)] == payload


def test_roundtrip_empty_payload(torax_image):
    res = encode_array(torax_image, b"", EncodeConfig(compute_metrics=False))
    dec = decode_container(res.container)
    assert dec.payload == b""
    np.testing.assert_array_equal(dec.original, torax_image)


def test_encode_dicom_uses_bits_stored(tmp_path):
    """Defect B6 fix: pe.dcm has BitsStored=12, so only 12 planes ride along
    (the reference would carry 16, 4 of them always-zero)."""
    res = encode_dicom("/root/reference/images/pe.dcm", MESSAGE,
                       EncodeConfig(compute_metrics=False))
    assert res.meta.nbits == 12
    res_ref = encode_dicom("/root/reference/images/pe.dcm", MESSAGE,
                           EncodeConfig(use_bits_stored=False, compute_metrics=False))
    assert res_ref.meta.nbits == 16
    # identical stego either way: the cut point only ever lands in the low
    # planes for these betas
    np.testing.assert_array_equal(res.stego, res_ref.stego)


def test_golden_fidelity_through_pipeline(pe_image):
    """BASELINE.md anchors must hold through the full pipeline (304-bit
    payload, hybrid, beta=0.4: 141 pixels changed on pe.dcm)."""
    cfg = EncodeConfig(strategy="hybrid", search_block_size=16)
    res = encode_array(pe_image, MESSAGE, cfg)
    assert res.s == 4
    assert res.metrics is not None
    assert int(res.metrics["changed_pixels"]) == 141
    assert res.metrics["mse"] == pytest.approx(0.00290, abs=2e-4)
    assert res.metrics["psnr"] == pytest.approx(83.8, abs=0.3)


def test_container_v2_roundtrip_bytes(pe_image):
    res = encode_array(pe_image, MESSAGE, EncodeConfig(compute_metrics=False))
    cont = container_io.parse(res.container)
    assert cont.meta.version == 2
    assert cont.meta.codec == "deflate"
    assert cont.meta.strategy == "hybrid"
    assert cont.meta.s == res.s
    repacked = container_io.pack(cont.meta, cont.bitmaps_blob, cont.stego_blob)
    assert repacked == res.container  # byte-exact container round-trip


def test_container_v1_interchange(torax_image):
    """v1 (reference layout) writing stays within its >H limits and decodes."""
    cfg = EncodeConfig(container_version=1, codec="png", strategy="multi_plane",
                      compute_metrics=False)
    res = encode_array(torax_image, MESSAGE, cfg)
    cont = container_io.parse(res.container)
    assert cont.meta.version == 1
    assert cont.meta.codec == "png"
    assert cont.meta.s == res.s
    # v1 headers parse byte-exactly back
    assert cont.meta.width == 512 and cont.meta.height == 512


def test_large_payload_v2_exceeds_v1_limits(pe_image, rng):
    """Defect B5: the v2 container handles per-plane lengths > 65,535 that
    break the reference's >H fields."""
    payload = rng.integers(0, 2, size=200_000).astype(np.uint8)
    cfg = EncodeConfig(strategy="multi_plane", beta=0.8, compute_metrics=False)
    res = encode_array(pe_image, payload, cfg)
    assert max(res.meta.eff_lengths) > 65_535
    dec = decode_container(res.container)
    # all bits that fit per-plane round-trip; verify against plan
    n = pe_image.size
    recoverable = np.zeros(payload.size, dtype=bool)
    starts, lengths, offsets = {}, {}, {}
    bit_idx = 0
    for plane in res.meta.indices:
        size = res.meta.sizes[plane]
        eff = res.meta.eff_lengths[plane]
        lo = max(bit_idx, 0)
        recoverable[lo : lo + eff] = True
        bit_idx += size
    np.testing.assert_array_equal(
        dec.payload_bits[recoverable], payload[recoverable]
    )


@pytest.mark.parametrize("codec", ["deflate", "png", "j2k", "jls"])
def test_transport_codecs_end_to_end(torax_image, codec):
    cfg = EncodeConfig(codec=codec, compute_metrics=False)
    res = encode_array(torax_image, MESSAGE, cfg)
    dec = decode_container(res.container)
    assert dec.message == MESSAGE
    np.testing.assert_array_equal(dec.stego, res.stego)


def test_cli_end_to_end(tmp_path, capsys):
    from codec_tcc_tpu.cli import main

    out = tmp_path / "out.stgc"
    report = tmp_path / "encode.json"
    rc = main([
        "encode", "/root/reference/images/torax.dcm", str(out),
        "--message", MESSAGE, "--codec", "png", "--report", str(report),
    ])
    assert rc == 0
    assert out.exists() and report.exists()

    prefix = str(tmp_path / "dec")
    rc = main(["decode", str(out), "--output-prefix", prefix])
    assert rc == 0
    with open(prefix + "_message.txt", encoding="utf-8") as f:
        assert f.read() == MESSAGE

    # restored original must equal the source image exactly
    from codec_tcc_tpu.io import dicom

    orig, _ = dicom.load_image("/root/reference/images/torax.dcm")
    restored, _ = dicom.load_image(prefix + "_original.dcm")
    np.testing.assert_array_equal(restored, orig)

    rc = main(["analyze", "/root/reference/images/torax.dcm", prefix + "_stego.dcm"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "PSNR" in captured.out


def test_cli_demo(tmp_path):
    """The reference demo flow, but it actually round-trips (defect B1)."""
    from codec_tcc_tpu.cli import main

    rc = main(["demo", "--input", "/root/reference/images/torax.dcm",
               "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    assert (tmp_path / "out" / "example.stgc").exists()


def test_cli_analyze_batch(tmp_path, capsys, torax_image, rng):
    from codec_tcc_tpu.cli import main
    from codec_tcc_tpu.io import dicom

    orig = tmp_path / "o.dcm"
    dicom.save_image(torax_image, str(orig))
    paths = [str(orig)]
    for i in range(2):
        st = torax_image.copy()
        st.ravel()[rng.integers(0, st.size, size=100)] ^= 1
        p = tmp_path / f"s{i}.dcm"
        dicom.save_image(st, str(p))
        paths = paths if i else paths  # keep orig first
    s0, s1 = tmp_path / "s0.dcm", tmp_path / "s1.dcm"
    report = tmp_path / "batch.json"
    rc = main(["analyze-batch", str(orig), str(s0), str(orig), str(s1),
               "--report", str(report)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mean PSNR" in out and report.exists()
    import json

    rep = json.loads(report.read_text())
    assert rep["summary"]["count"] == 2


def test_cli_payload_file_and_decode_report(tmp_path, rng):
    from codec_tcc_tpu.cli import main

    payload = rng.integers(0, 256, size=512, dtype=np.uint8).tobytes()
    pf = tmp_path / "payload.bin"
    pf.write_bytes(payload)
    out = tmp_path / "o.stgc"
    rc = main(["encode", "/root/reference/images/torax.dcm", str(out),
               "--payload-file", str(pf)])
    assert rc == 0

    prefix = str(tmp_path / "d")
    report = tmp_path / "dec.json"
    rc = main(["decode", str(out), "--output-prefix", prefix,
               "--no-restore", "--report", str(report)])
    assert rc == 0
    # binary payload lands in _payload.bin (not valid UTF-8 text)
    import os

    recovered = None
    for cand in (prefix + "_payload.bin", prefix + "_message.txt"):
        if os.path.exists(cand):
            recovered = open(cand, "rb").read()
    assert recovered[: len(payload)] == payload
    # --no-restore skips the original image output
    assert not os.path.exists(prefix + "_original.dcm")
    import json

    rep = json.loads(report.read_text())
    assert rep["restored_original"] is False


@pytest.mark.parametrize("shape", [(33, 47), (1, 257), (100, 100), (63, 129)])
def test_odd_shapes_end_to_end(shape, rng):
    """Non-tileable geometries exercise the XLA fallback paths end to end."""
    img = rng.integers(0, 4096, size=shape).astype(np.uint16)
    payload = rng.integers(0, 2, size=min(64, img.size // 4) or 1).astype(np.uint8)
    for strategy in ("multi_plane", "hybrid"):
        res = encode_array(img, payload,
                           EncodeConfig(strategy=strategy, compute_metrics=False))
        dec = decode_container(res.container)
        np.testing.assert_array_equal(dec.payload_bits[: payload.size], payload)
        np.testing.assert_array_equal(dec.original, img)
