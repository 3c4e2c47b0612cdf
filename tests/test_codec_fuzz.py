"""Randomized decoder-robustness campaign + allocation-bomb guards.

The container/STGV formats have their own fuzz suite
(``test_container_fuzz.py``); this covers the remaining untrusted-input
parsers — the native JPEG-LS decoder, the libjxl shim, the deflate/PNG/J2K
codec entries, and the DICOM reader across every written transfer syntax —
via ``tools/fuzz_codecs.py`` run in a SUBPROCESS so a native-code crash
(segfault) fails the test instead of killing the pytest worker.

The unit tests pin the decode-side allocation bounds: output buffers are
sized from the PROBED header of an untrusted stream, so a single flipped
dimension byte must raise ``ValueError`` instead of demanding gigabytes
(jls: 65535x65535 x uint16 = 8.6 GB; jxl headers encode dims up to 2^30;
deflate: 32-bit h/w fields).
"""

from __future__ import annotations

import json
import os
import struct
import subprocess
import sys
import zlib

import numpy as np
import pytest

from codec_tcc_tpu.io import jpegls_binding as jls
from codec_tcc_tpu.io.codecs import get as get_codec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FUZZ = os.path.join(REPO, "tools", "fuzz_codecs.py")


def test_fuzz_campaign_subprocess():
    """200+ mutations per decoder survive with clean errors, no crashes."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, FUZZ, "jls", "deflate", "png", "dicom",
         "--iters", "40", "--seed", "11"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    # rc -SIGSEGV etc. means a decoder crashed the interpreter
    assert proc.returncode == 0, (
        f"fuzz campaign failed rc={proc.returncode}\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
    results = [json.loads(line) for line in proc.stdout.splitlines()
               if line.startswith("{")]
    assert len(results) == 4
    for res in results:
        assert not res["failures"], res
        assert res["blobs"] >= 2
        # mutations actually exercised the error paths
        assert res["clean_errors"] > 0


def test_jls_dimension_bomb_rejected():
    """A flipped SOF55 byte claiming 65535x65535 must not allocate 8.6 GB."""
    img = (np.add.outer(np.arange(32), np.arange(40)) % 255).astype(np.uint8)
    blob = bytearray(jls.encode(img))
    sof = bytes(blob).find(b"\xff\xf7")
    assert sof > 0
    # SOF55 layout: FF F7 | Lf(2) | P(1) | Y(2) | X(2) | ...
    blob[sof + 5 : sof + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="pixels"):
        jls.decode(bytes(blob))


def test_jxl_dimension_bomb_rejected(monkeypatch):
    """Probed JXL dims past the cap must raise before the output alloc."""
    jxl = pytest.importorskip("codec_tcc_tpu.io.jxl_binding")
    if not jxl.available():
        pytest.skip("libjxl shim unavailable")
    monkeypatch.setattr(jxl, "probe", lambda data: (1 << 20, 1 << 20, 16))
    with pytest.raises(ValueError, match="pixels"):
        jxl.decode(b"\xff\x0a" + b"\x00" * 64)


def test_deflate_header_bomb_and_overlong_stream_rejected():
    codec = get_codec("deflate")
    img = (np.arange(64 * 48, dtype=np.uint16) & 0xFFF).reshape(64, 48)
    blob = codec.encode(img)
    # 32-bit height field flipped to ~4 billion rows
    bomb = bytearray(blob)
    bomb[5:9] = struct.pack(">I", 0xFFFFFFF0)
    with pytest.raises(ValueError, match="pixels"):
        codec.decode(bytes(bomb))
    # stream inflating past the header's byte count stops at the bound
    overlong = blob[:13] + zlib.compress(b"\x00" * (64 * 48 * 2 + 999))
    with pytest.raises(ValueError, match="inflates past or short"):
        codec.decode(overlong)
    # truncated stream (no eof) is rejected by the same bound
    with pytest.raises(ValueError):
        codec.decode(blob[:-6])
    # and the unmutated blob still round-trips
    np.testing.assert_array_equal(codec.decode(blob), img)


def test_container_bitmap_blob_bomb_rejected():
    """A container whose bitmap blob inflates past the size its header
    commits to must fail at the bound, not after a full zip-bomb inflate."""
    from codec_tcc_tpu import EncodeConfig, decode_container, encode_array
    from codec_tcc_tpu.io import container as container_io

    img = (np.arange(64 * 64, dtype=np.uint16) & 0xFFF).reshape(64, 64)
    blob = encode_array(img, b"pp", EncodeConfig(compute_metrics=False)).container
    cont = container_io.parse(blob)
    assert cont.meta.has_bitmaps
    cont.bitmaps_blob = zlib.compress(b"\x00" * (4 << 20))  # 4 MB of zeros
    with pytest.raises(ValueError, match="Invalid file"):
        cont.bitmaps()
    # unmutated container still decodes
    assert decode_container(blob).payload.startswith(b"pp")


def test_pee_overflow_map_bomb_rejected():
    """Same bound on the PEE overflow-map blob."""
    from codec_tcc_tpu import EncodeConfig, decode_container, encode_array
    from codec_tcc_tpu.io import container as container_io

    rng = np.random.default_rng(9)
    img = rng.integers(100, 160, (64, 64)).astype(np.uint16)
    blob = encode_array(
        img, b"qq", EncodeConfig(strategy="pee", compute_metrics=False)
    ).container
    cont = container_io.parse(blob)
    cont.bitmaps_blob = zlib.compress(b"\x00" * (4 << 20))
    with pytest.raises(ValueError, match="Invalid file"):
        decode_container(cont)
    assert decode_container(blob).payload.startswith(b"qq")


def test_jls_decode_still_roundtrips_at_cap_guard():
    """The guard must not reject legitimate streams."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, (64, 64)).astype(np.uint16)
    np.testing.assert_array_equal(jls.decode(jls.encode(img, bits=12)), img)
