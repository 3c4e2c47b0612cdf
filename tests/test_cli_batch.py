"""CLI fused-batch surface: encode-batch --fused and decode-batch."""

import numpy as np

from codec_tcc_tpu.cli import main
from codec_tcc_tpu.io import dicom


def _write_dicoms(tmp_path, rng, n=3, shape=(64, 64)):
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, size=shape).astype(np.uint8)
        p = tmp_path / f"img{i}.dcm"
        dicom.save_image(arr, str(p))
        paths.append((str(p), arr))
    return paths


def test_encode_batch_fused_and_decode_batch(tmp_path, rng, capsys):
    paths = _write_dicoms(tmp_path, rng)
    out_dir = tmp_path / "out"
    rc = main([
        "encode-batch", *[p for p, _ in paths],
        "--output-dir", str(out_dir), "--message", "fused batch hello",
        "--codec", "deflate", "--fused",
    ])
    assert rc == 0
    conts = sorted(out_dir.glob("*.stgc"))
    assert len(conts) == len(paths)
    assert "(fused)" in capsys.readouterr().out

    dec_dir = tmp_path / "dec"
    rc = main([
        "decode-batch", *[str(c) for c in conts], "--output-dir", str(dec_dir),
    ])
    assert rc == 0
    for (p, arr), cont in zip(paths, conts):
        stem = cont.stem
        msg = (dec_dir / f"{stem}_message.txt").read_text()
        assert msg == "fused batch hello"
        restored, _ = dicom.load_image(str(dec_dir / f"{stem}_original.dcm"))
        np.testing.assert_array_equal(restored, arr)


def test_encode_batch_fused_rejects_mixed_geometry(tmp_path, rng, capsys):
    a = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    b = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    pa, pb = tmp_path / "a.dcm", tmp_path / "b.dcm"
    dicom.save_image(a, str(pa))
    dicom.save_image(b, str(pb))
    rc = main([
        "encode-batch", str(pa), str(pb),
        "--output-dir", str(tmp_path / "o"), "--message", "x", "--fused",
    ])
    assert rc == 1  # CLI error contract: message on stderr, nonzero exit
    assert "same-geometry" in capsys.readouterr().err


def test_fused_refuses_mixed_bits_stored(tmp_path, rng):
    from codec_tcc_tpu.io import dicom

    a = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
    p1, p2 = tmp_path / "a.dcm", tmp_path / "b.dcm"
    dicom.save_image(a, str(p1), bits_stored=12)
    dicom.save_image(a, str(p2), bits_stored=14)
    rc = main(["encode-batch", str(p1), str(p2), "--fused",
               "--output-dir", str(tmp_path / "o"), "--message", "x"])
    assert rc == 1  # uniform-BitsStored contract (clean error, not a drop)
