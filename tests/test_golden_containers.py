"""Format-stability goldens: committed STGC-v2 containers from round 1 must
keep decoding bit-exactly in every future round (catching accidental format
or plan-derivation changes that fresh encode/decode round-trips would mask)."""

import os

import numpy as np
import pytest

from codec_tcc_tpu import decode_container

DATA = os.path.join(os.path.dirname(__file__), "data")


def _payload() -> bytes:
    with open(os.path.join(DATA, "golden_payload.bin"), "rb") as f:
        return f.read()


@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid", "block_adaptive"])
def test_golden_lsb_containers_decode(strategy):
    img = np.load(os.path.join(DATA, "golden_image.npy"))
    with open(os.path.join(DATA, f"golden_{strategy}.stgc"), "rb") as f:
        blob = f.read()
    dec = decode_container(blob)
    assert dec.meta.strategy == strategy
    assert dec.payload == _payload()
    np.testing.assert_array_equal(dec.original, img)


def test_golden_packed_bitmaps_container_decodes():
    """Round-3 v2.1 fixture: FLAG_PACKED_BITMAPS container committed the day
    the flag landed — future format drift in the packed blob layout (bit
    order, plane count, zlib framing) breaks this, not just fresh
    round-trips."""
    from codec_tcc_tpu.io import container as container_io

    img = np.load(os.path.join(DATA, "golden_image.npy"))
    with open(os.path.join(DATA, "golden_hybrid_packed.stgc"), "rb") as f:
        blob = f.read()
    cont = container_io.parse(blob)
    assert cont.meta.bitmaps_packed and cont.meta.has_bitmaps
    dec = decode_container(blob)
    assert dec.meta.strategy == "hybrid"
    assert dec.payload == _payload()
    np.testing.assert_array_equal(dec.original, img)


def test_golden_pee_container_decodes():
    img = np.load(os.path.join(DATA, "golden_pee_image.npy"))
    with open(os.path.join(DATA, "golden_pee.stgc"), "rb") as f:
        blob = f.read()
    dec = decode_container(blob)
    assert dec.meta.strategy == "pee"
    assert dec.payload == _payload()
    np.testing.assert_array_equal(dec.original, img)


def test_golden_block_volume_decodes():
    """Round-3 fixture: STGV volume written with strategy=block_adaptive
    (volume-level strategy id + per-slice block ext) committed the day the
    strategy joined volumes — future drift in the STGV header, the block
    ext, or the rank-placement semantics breaks this, not just fresh
    round-trips."""
    import numpy as np

    from codec_tcc_tpu.parallel import volume as volume_par

    vol = np.load(os.path.join(DATA, "golden_block_volume.npy"))
    with open(os.path.join(DATA, "golden_block_volume.stgv"), "rb") as f:
        blob = f.read()
    bits, stego, original = volume_par.unpack_volume(blob)
    want = np.unpackbits(np.frombuffer(_payload(), np.uint8))[:1200]
    np.testing.assert_array_equal(bits, want)
    np.testing.assert_array_equal(original, vol)
