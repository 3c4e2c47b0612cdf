"""CLI volume surface: encode-volume / decode-volume round-trip (STGV)."""

import numpy as np

from codec_tcc_tpu.cli import main
from codec_tcc_tpu.io import dicom


def test_volume_roundtrip_npy(tmp_path, rng, capsys):
    vol = rng.integers(0, 4096, size=(6, 64, 64)).astype(np.uint16)
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    payload = rng.bytes(600)
    pf = tmp_path / "payload.bin"
    pf.write_bytes(payload)
    out = tmp_path / "vol.stgv"

    rc = main(["encode-volume", str(vol_path), "--output", str(out),
               "--payload-file", str(pf), "--codec", "deflate"])
    assert rc == 0
    assert out.exists()

    prefix = str(tmp_path / "dec")
    rc = main(["decode-volume", str(out), "--output-prefix", prefix])
    assert rc == 0
    got = (tmp_path / "dec_payload.bin").read_bytes()
    assert got == payload
    stego = np.load(prefix + "_stego.npy")
    original = np.load(prefix + "_original.npy")
    assert stego.shape == vol.shape
    np.testing.assert_array_equal(original, vol)
    assert (stego != vol).any()          # something was actually embedded


def test_volume_from_dicom_slices(tmp_path, rng):
    slices = []
    for i in range(3):
        img = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
        p = tmp_path / f"slice{i}.dcm"
        dicom.save_image(img, str(p), bits_stored=12)
        slices.append(str(p))
    out = tmp_path / "v.stgv"
    rc = main(["encode-volume", *slices, "--output", str(out),
               "--message", "fatias dicom"])
    assert rc == 0
    prefix = str(tmp_path / "d")
    assert main(["decode-volume", str(out), "--output-prefix", prefix]) == 0
    payload = (tmp_path / "d_payload.bin").read_bytes()
    assert payload.decode("utf-8", errors="replace").startswith("fatias dicom")


def test_volume_shape_mismatch_errors(tmp_path, rng, capsys):
    a = tmp_path / "a.npy"
    np.save(a, rng.integers(0, 10, size=(4, 4)).astype(np.uint8))  # 2-D
    rc = main(["encode-volume", str(a), "--output", str(tmp_path / "x.stgv"),
               "--message", "x"])
    assert rc == 1
    assert "3-D" in capsys.readouterr().err


def test_stgv_truncated_is_valueerror(tmp_path, rng):
    import pytest
    from codec_tcc_tpu.parallel import volume as volume_par
    from codec_tcc_tpu.config import EncodeConfig

    vol = rng.integers(0, 256, size=(2, 32, 32)).astype(np.uint8)
    res = volume_par.encode_volume(vol, b"x" * 8, EncodeConfig(codec="deflate"))
    blob = volume_par.pack_volume(vol, res, EncodeConfig(codec="deflate"))
    with pytest.raises(ValueError, match="STGV"):
        volume_par.unpack_volume(blob[:10])          # truncated header
    with pytest.raises(ValueError, match="truncated"):
        volume_par.unpack_volume(blob[: len(blob) // 2])   # truncated body


def test_analyze_bits_stored_range_flag(capsys):
    """--bits-stored-range reproduces the reference mse.py CLI policy
    (BitsStored-derived PSNR range for DICOM inputs)."""
    rc = main(["analyze", "/root/reference/images/pe.dcm",
               "/root/reference/images/pe.dcm", "--bits-stored-range"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PSNR" in out and "inf" in out  # identical pair


def test_encode_batch_cli_with_resume(tmp_path, rng, capsys):
    """encode-batch: per-item checkpointing, failure isolation, resume."""
    from codec_tcc_tpu.io import dicom

    paths = []
    for i in range(3):
        img = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
        p = tmp_path / f"img{i}.dcm"
        dicom.save_image(img, str(p), bits_stored=12)
        paths.append(str(p))
    bad = tmp_path / "bad.dcm"
    bad.write_bytes(b"not a dicom at all")
    outdir = tmp_path / "out"

    rc = main(["encode-batch", *paths, str(bad), "--output-dir", str(outdir),
               "--message", "lote"])
    assert rc == 1                       # one failure isolated, not fatal
    out = capsys.readouterr().out
    assert "3/4 done" in out
    assert (outdir / "manifest.json").exists()
    assert len(list(outdir.glob("*.stgc"))) == 3

    # resume: finished items skipped (their outputs untouched), failure retried
    before = {f.name: f.stat().st_mtime_ns for f in outdir.glob("*.stgc")}
    rc = main(["encode-batch", *paths, str(bad), "--output-dir", str(outdir),
               "--message", "lote"])
    assert rc == 1
    after = {f.name: f.stat().st_mtime_ns for f in outdir.glob("*.stgc")}
    assert before == after


def test_encode_batch_png_inputs(tmp_path, rng):
    """encode-batch supports the same non-DICOM formats as `encode`."""
    from PIL import Image

    paths = []
    for i in range(2):
        img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
        p = tmp_path / f"g{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    outdir = tmp_path / "out"
    rc = main(["encode-batch", *paths, "--output-dir", str(outdir),
               "--message", "png lote"])
    assert rc == 0
    assert len(list(outdir.glob("*.stgc"))) == 2


def test_volume_pee_cli_roundtrip(tmp_path, rng, capsys):
    yy, xx = np.mgrid[0:64, 0:64]
    base = (300 + 80 * np.sin(yy / 8.0) * np.cos(xx / 6.0)).astype(np.int64)
    vol = np.stack([
        (base + rng.integers(-1, 2, size=(64, 64))).clip(0, 700).astype(np.uint16)
        for _ in range(4)
    ])
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    out = tmp_path / "vol.stgv"

    rc = main(["encode-volume", str(vol_path), "--output", str(out),
               "--message", "volume com expansao de erro de predicao",
               "--strategy", "pee"])
    assert rc == 0
    assert "PEE threshold" in capsys.readouterr().out

    prefix = str(tmp_path / "pd")
    assert main(["decode-volume", str(out), "--output-prefix", prefix]) == 0
    payload = (tmp_path / "pd_payload.bin").read_bytes()
    assert payload.decode("utf-8").startswith(
        "volume com expansao de erro de predicao")
    original = np.load(prefix + "_original.npy")
    np.testing.assert_array_equal(original, vol)


def test_volume_multiframe_dicom_roundtrip(tmp_path, rng):
    """One multiframe DICOM file IS the volume: encode-volume reads it
    directly, decode-volume --dicom writes multiframe DICOMs back, and the
    restored file's frames equal the input exactly."""
    vol = rng.integers(0, 4096, size=(5, 32, 32)).astype(np.uint16)
    src = tmp_path / "series.dcm"
    dicom.save_image(vol, str(src), bits_stored=12)

    # reader returns the (frames, rows, cols) stack
    back, ds = dicom.load_image(str(src))
    assert ds.number_of_frames == 5
    np.testing.assert_array_equal(back, vol)

    out = tmp_path / "mf.stgv"
    assert main(["encode-volume", str(src), "--output", str(out),
                 "--message", "multiframe"]) == 0
    prefix = str(tmp_path / "mf")
    assert main(["decode-volume", str(out), "--output-prefix", prefix,
                 "--dicom"]) == 0
    restored, _ = dicom.load_image(prefix + "_original.dcm")
    np.testing.assert_array_equal(restored, vol)
    payload = (tmp_path / "mf_payload.bin").read_bytes()
    assert payload.decode("utf-8").startswith("multiframe")


def test_analyze_multiframe_pair(tmp_path, rng, capsys):
    """`analyze` on a multiframe DICOM pair covers ALL frames in one fused
    reduction (the reference's mse.py silently compared only the first
    frame; the parity branch --bits-stored-range still does)."""
    vol = rng.integers(0, 4096, size=(3, 32, 32)).astype(np.uint16)
    stego = vol.copy()
    stego[2] ^= 1                      # change only the LAST frame
    a, b = tmp_path / "a.dcm", tmp_path / "b.dcm"
    dicom.save_image(vol, str(a), bits_stored=12)
    dicom.save_image(stego, str(b), bits_stored=12)

    assert main(["analyze", str(a), str(b)]) == 0
    out = capsys.readouterr().out
    changed = int(out.split("pixels changed")[1].split(":")[1].split("(")[0])
    assert changed == 32 * 32          # last frame's flips are counted

    bad = tmp_path / "c.dcm"
    dicom.save_image(vol[:2], str(bad), bits_stored=12)
    assert main(["analyze", str(a), str(bad)]) == 1
    assert "Shape mismatch" in capsys.readouterr().err


def test_volume_from_npy_slices(tmp_path, rng):
    """Multiple 2-D .npy slice files stack into the volume (used to crash
    with a raw PIL traceback)."""
    paths = []
    vol = rng.integers(0, 4096, size=(3, 32, 32)).astype(np.uint16)
    for i in range(3):
        p = tmp_path / f"s{i}.npy"
        np.save(p, vol[i])
        paths.append(str(p))
    out = tmp_path / "v.stgv"
    assert main(["encode-volume", *paths, "--output", str(out),
                 "--message", "fatias npy"]) == 0
    prefix = str(tmp_path / "nd")
    assert main(["decode-volume", str(out), "--output-prefix", prefix]) == 0
    np.testing.assert_array_equal(np.load(prefix + "_original.npy"), vol)
