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


def test_encode_batch_fused_buckets_mixed_geometry(tmp_path, rng):
    """Mixed geometries fuse per same-shape group (round-3 upgrade: the
    pre-round-3 contract refused them) and every container is byte-identical
    to the single-image pipeline's."""
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.pipeline import encode_array

    arrays = {
        "a64": rng.integers(0, 256, size=(64, 64)).astype(np.uint8),
        "b32": rng.integers(0, 256, size=(32, 32)).astype(np.uint8),
        "c64": rng.integers(0, 256, size=(64, 64)).astype(np.uint8),
    }
    paths = []
    for name, arr in arrays.items():
        p = tmp_path / f"{name}.dcm"
        dicom.save_image(arr, str(p))
        paths.append(str(p))
    out_dir = tmp_path / "o"
    rc = main(["encode-batch", *paths, "--output-dir", str(out_dir),
               "--message", "mixed shapes", "--codec", "deflate", "--fused"])
    assert rc == 0
    cfg = EncodeConfig(codec="deflate", compute_metrics=False)
    for name, arr in arrays.items():
        blob = (out_dir / f"{name}.stgc").read_bytes()
        assert blob == encode_array(arr, "mixed shapes", cfg).container


def test_fused_buckets_mixed_bits_stored(tmp_path, rng):
    """Mixed BitsStored caps land in separate fused groups (each plan keeps
    its own cap — pre-round-3 this refused) and both round-trip."""
    from codec_tcc_tpu.pipeline import decode_container

    a = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
    b = rng.integers(0, 16384, size=(32, 32)).astype(np.uint16)
    p1, p2 = tmp_path / "a.dcm", tmp_path / "b.dcm"
    dicom.save_image(a, str(p1), bits_stored=12)
    dicom.save_image(b, str(p2), bits_stored=14)
    out_dir = tmp_path / "o"
    rc = main(["encode-batch", str(p1), str(p2), "--fused",
               "--output-dir", str(out_dir), "--message", "caps differ"])
    assert rc == 0
    for stem, arr in (("a", a), ("b", b)):
        dec = decode_container((out_dir / f"{stem}.stgc").read_bytes())
        assert dec.payload == b"caps differ"
        np.testing.assert_array_equal(dec.original, arr)
