"""Round-3 review findings, pinned.

1. v1 containers cannot record block_adaptive/pee, so encoding them as v1
   must raise up front instead of producing a container that silently
   decodes to garbage (the v1 header has no strategy field).
2. capacity_report's 3-D PEE figure must probe with the SAME max_val the
   volume PEE encoder embeds with (full dtype — STGV volumes carry no
   BitsStored), so the report is the boundary encode_volume accepts.
3. A second daemon must refuse to start on a live socket instead of
   unlinking it and orphaning the running daemon (covered in test_serve).
4. The fused batch PEE decoder zeroes nproc1 for 1-pass containers like
   the single-image decoder does (guards foreign/corrupt ext blocks).
"""

import jax
import numpy as np
import pytest

from codec_tcc_tpu.config import EncodeConfig


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Pallas kernels run in interpret mode off-TPU (same convention as
    test_pallas_pee.py) so the fused group decoder is exercisable here."""
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() == "tpu":
        yield
        return
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("strategy", ["block_adaptive", "pee"])
def test_v1_rejects_strategies_it_cannot_record(strategy):
    with pytest.raises(ValueError, match="v1 container"):
        EncodeConfig(strategy=strategy, container_version=1).validate()
    # encode_array goes through validate(), so the pipeline inherits it
    from codec_tcc_tpu.pipeline import encode_array

    img = np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) % 4096
    with pytest.raises(ValueError, match="v1 container"):
        encode_array(
            img, b"x", EncodeConfig(strategy=strategy, container_version=1)
        )


def test_v1_still_works_for_raster_strategies(tmp_path):
    from codec_tcc_tpu.pipeline import decode_container, encode_array

    img = (np.arange(64 * 64, dtype=np.uint16) % 4096).reshape(64, 64)
    for strategy in ("multi_plane", "hybrid"):
        res = encode_array(
            img, b"v1 ok", EncodeConfig(
                strategy=strategy, container_version=1, codec="png",
                compute_metrics=False,
            )
        )
        dec = decode_container(res.container)
        assert dec.payload == b"v1 ok"


def test_volume_capacity_report_matches_encoder_max_val(tmp_path, rng):
    """A BitsStored=12 multiframe volume: the report must use the encoder's
    full-dtype max_val, not the BitsStored cap (parallel/volume.py:213)."""
    from codec_tcc_tpu.parallel.batch_pee import probe_capacity_batch
    from codec_tcc_tpu.pipeline import capacity_report

    y, x = np.mgrid[0:32, 0:32]
    vol = np.stack([
        (30 * y + 20 * x + rng.integers(0, 5, size=(32, 32))).astype(np.uint16)
        for _ in range(3)
    ])
    rep = capacity_report(vol, bits_stored=12, pee_threshold=2)
    expected = int(np.sum(probe_capacity_batch(vol, 2, 65535)))
    assert rep["pee_bits"] == expected


def test_fused_batch_decode_ignores_nproc1_of_one_pass_containers(rng):
    """Tamper a 1-pass PEE container's ext to carry a bogus nproc1: the
    batch decoder must restore exactly like the single-image decoder (which
    guards `nproc1 if passes == 2 else 0`)."""
    import struct

    from codec_tcc_tpu.io import container as container_io
    from codec_tcc_tpu.models.pee import (
        decode_pee_container,
        parse_pee_container_parts,
    )
    from codec_tcc_tpu.parallel import batch_pee as bp

    y, x = np.mgrid[0:32, 0:32]
    imgs = np.stack([
        (40 * y + 25 * x + rng.integers(0, 5, size=(32, 32))).astype(np.uint16)
        for _ in range(2)
    ])
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)
    res = bp.encode_pee_batch(imgs, [b"ab", b"cd"], cfg)

    fmt = container_io._PEE_EXT_FMT
    size = struct.calcsize(fmt)
    tampered = []
    saw_one_pass = False
    for blob in res.containers:
        cont = container_io.parse(blob)
        vals = list(struct.unpack(fmt, cont.meta.ext[:size]))
        passes, nproc0 = vals[1], vals[2]
        if passes == 1:
            saw_one_pass = True
            assert vals[3] == 0
            vals[3] = max(1, nproc0 // 2)    # bogus pass-1 boundary
            meta = container_io.ContainerMeta(
                **{**cont.meta.__dict__,
                   "ext": struct.pack(fmt, *vals) + cont.meta.ext[size:]}
            )
            blob = container_io.pack(meta, cont.bitmaps_blob, cont.stego_blob)
        tampered.append(blob)
    if not saw_one_pass:
        pytest.skip("payload unexpectedly needed two passes; nothing to tamper")

    conts = [container_io.parse(b) for b in tampered]
    parts = [parse_pee_container_parts(c) for c in conts]
    fused = bp._decode_group_fused(
        conts, [p[0] for p in parts], [p[1] for p in parts], True
    )
    for i, (cont, out) in enumerate(zip(conts, fused)):
        single = decode_pee_container(cont)
        np.testing.assert_array_equal(out.original, imgs[i])
        np.testing.assert_array_equal(single.original, imgs[i])
        assert out.payload == single.payload
