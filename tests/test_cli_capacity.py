"""CLI `capacity` surface: pre-encode payload planning.

The reported numbers must be the boundary the encoders actually accept
(tightness of ``usable_capacity_bits`` / the PEE probe themselves is covered
by test_review_fixes / test_round3_contracts); here we pin the CLI contract:
JSON fields, agreement with the library APIs, volume (global-cut) semantics,
and that an exactly-capacity LSB payload encodes.
"""

import json

import numpy as np
import pytest

from codec_tcc_tpu.cli import main
from codec_tcc_tpu.io import dicom


@pytest.fixture
def smooth_dcm(tmp_path, rng):
    """A smooth 64x64 uint16 DICOM (gradient + mild noise: nonzero PEE
    capacity, unlike pure noise)."""
    y, x = np.mgrid[0:64, 0:64]
    arr = (40 * y + 25 * x + rng.integers(0, 7, size=(64, 64))).astype(
        np.uint16
    )
    p = tmp_path / "img.dcm"
    dicom.save_image(arr, str(p))
    return str(p), arr


def test_capacity_json_matches_library(smooth_dcm, capsys):
    path, arr = smooth_dcm
    rc = main(["capacity", path, "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)

    from codec_tcc_tpu.models import get_embedder
    from codec_tcc_tpu.ops.decompose import decompose
    from codec_tcc_tpu.ops.segments import usable_capacity_bits

    dec = decompose(arr, beta=0.4, nbits=16)
    assert out["cut_point_s"] == dec.s
    assert out["lsb_bits"] == usable_capacity_bits(dec.s, arr.size)
    assert out["pee_bits"] == get_embedder("pee").capacity_bits(
        arr, bits_stored=16
    )
    assert out["reference_rule_bits"] == dec.s * arr.size
    assert out["lsb_bits"] < out["reference_rule_bits"]
    assert out["pee_bits"] > 0


def test_capacity_lsb_bits_actually_encode(smooth_dcm, tmp_path, capsys):
    path, _ = smooth_dcm
    rc = main(["capacity", path, "--json"])
    assert rc == 0
    cap_bits = json.loads(capsys.readouterr().out)["lsb_bits"]

    payload = tmp_path / "p.bin"
    payload.write_bytes(b"\xa5" * (cap_bits // 8))
    rc = main([
        "encode", path, str(tmp_path / "o.stgc"),
        "--payload-file", str(payload),
    ])
    capsys.readouterr()
    assert rc == 0

    over = tmp_path / "over.bin"
    over.write_bytes(b"\xa5" * (cap_bits // 8 + 1))
    rc = main([
        "encode", path, str(tmp_path / "o2.stgc"),
        "--payload-file", str(over),
    ])
    assert rc != 0
    assert "capacity" in capsys.readouterr().err


def test_capacity_volume_global_cut(tmp_path, rng, capsys):
    vol = rng.integers(0, 4096, size=(3, 64, 64), dtype=np.uint16)
    p = tmp_path / "vol.npy"
    np.save(p, vol)
    rc = main(["capacity", str(p), "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)

    from codec_tcc_tpu.ops.segments import usable_capacity_bits
    from codec_tcc_tpu.parallel.volume import volume_cut_point

    s, _ = volume_cut_point(vol, 0.4)
    assert out["cut_point_s"] == s
    assert out["frames"] == 3
    assert out["lsb_bits"] == usable_capacity_bits(s, 64 * 64) * 3


def test_capacity_text_output(smooth_dcm, capsys):
    path, _ = smooth_dcm
    rc = main(["capacity", path])
    assert rc == 0
    text = capsys.readouterr().out
    assert "cut point s" in text
    assert "multi_plane/hybrid/block_adaptive" in text
    assert "pee (two-pass" in text
