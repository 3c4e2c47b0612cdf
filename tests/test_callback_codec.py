"""Host-callback codec stages inside jit + v1 container interop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# io_callback needs host-callback support, which the experimental axon TPU
# tunnel backend lacks; these tests run on the CPU suite (conftest scrubs the
# plugin) and skip gracefully if someone forces the TPU backend.
import os

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu" and bool(os.environ.get("PALLAS_AXON_POOL_IPS")),
    reason="host callbacks unsupported over the axon TPU tunnel",
)

from oracle import numpy_ref as oracle
from codec_tcc_tpu.ops import callback_codec
from codec_tcc_tpu.ops import embed as embed_ops


@pytest.mark.parametrize("codec", ["deflate", "png", "jls"])
def test_codec_callback_roundtrip_in_jit(rng, codec):
    img = rng.integers(0, 4096, size=(64, 64)).astype(np.uint16)
    out = np.asarray(callback_codec.roundtrip_in_jit(img, codec, capacity=1 << 16))
    np.testing.assert_array_equal(out, img)


def test_callback_capacity_overflow(rng):
    img = rng.integers(0, 65536, size=(64, 64)).astype(np.uint16)  # incompressible
    with pytest.raises(Exception):
        np.asarray(callback_codec.roundtrip_in_jit(img, "deflate", capacity=16))


def test_embed_compress_decode_extract_under_jit(rng, torax_image):
    """The full encode->compress->decode->extract flow as one jitted graph
    (BASELINE config[4] shape, with deflate standing in for the gated jxl)."""
    from codec_tcc_tpu.ops import segments as segment_ops

    img = torax_image
    payload = rng.integers(0, 2, size=2000).astype(np.uint8)
    s, nbits = 3, 4
    plan = segment_ops.distribute_segments(s, payload.size)
    pp = segment_ops.raster_plane_plan(plan, img.size, nbits, 0, True)
    msg = embed_ops.pad_message(payload, img.size, int(pp.offsets.max(initial=0)))
    cap = 1 << 19

    @jax.jit
    def flow(im, ms):
        stego = embed_ops.embed(im, ms, pp.starts, pp.lengths, pp.offsets,
                                jnp.int32(s), nbits)
        buf, n = callback_codec.compress_stage(stego, "deflate", cap)
        back = callback_codec.decompress_stage(buf, n, "deflate", im.shape, im.dtype)
        aligned = embed_ops.extract_aligned(back, pp.starts, pp.lengths,
                                            jnp.int32(s), nbits)
        return back, aligned

    back, aligned = flow(img, msg)
    bits = embed_ops.assemble_message(aligned, pp.offsets, pp.lengths, payload.size)
    np.testing.assert_array_equal(bits, payload)


def test_v1_container_from_oracle_decodes(torax_image, rng):
    """Interop: a v1 (reference-layout) container built from oracle embed
    output decodes through the standard pipeline with exact recovery."""
    import zlib

    from codec_tcc_tpu import decode_container
    from codec_tcc_tpu.io import codecs, container as container_io

    s = 3
    payload = rng.integers(0, 2, size=1500).astype(np.uint8)
    local = oracle.split_planes(torax_image, 8)[:s]
    res = oracle.embed_multi_plane(local, payload)
    stego = oracle.merge_planes(oracle.split_planes(torax_image, 8)[s:], res.stego_planes)

    eff = [res.plan.eff_lengths[list(res.plan.indices).index(p)] for p in range(s)]
    blob = container_io.pack_v1(
        "png", s, eff, list(res.plan.indices),
        zlib.compress(np.stack(res.bitmaps).tobytes()),
        codecs.get("png").encode(stego),
        torax_image.shape[1], torax_image.shape[0], 0, True,
        # align=True: multi_plane embeds every plane from raster 0 (v1 decode
        # replays the hybrid walk, advancing starts when align is False)
    )
    dec = decode_container(blob)
    np.testing.assert_array_equal(dec.payload_bits[: payload.size], payload)
    np.testing.assert_array_equal(dec.original, torax_image)


def test_v1_reference_png_payload_is_deflated_dicom(torax_image, rng):
    """Full reference-file emulation: the reference's 'png' codec stores a
    whole deflated DICOM file as the stego payload (src/codec.py:151-162).
    A v1 container built that way must decode here without conversion."""
    import zlib

    from codec_tcc_tpu import decode_container
    from codec_tcc_tpu.io import container as container_io, dicom

    s = 3
    payload = rng.integers(0, 2, size=900).astype(np.uint8)
    local = oracle.split_planes(torax_image, 8)[:s]
    res = oracle.embed_multi_plane(local, payload)
    stego = oracle.merge_planes(oracle.split_planes(torax_image, 8)[s:], res.stego_planes)

    # reference-style payload: deflated-DICOM whole-file bytes
    stego_blob = dicom.to_bytes(dicom.build_secondary_capture(stego), deflated=True)
    eff = [res.plan.eff_lengths[list(res.plan.indices).index(p)] for p in range(s)]
    blob = container_io.pack_v1(
        "png", s, eff, list(res.plan.indices),
        zlib.compress(np.stack(res.bitmaps).tobytes()), stego_blob,
        torax_image.shape[1], torax_image.shape[0], 0, True,
    )
    dec = decode_container(blob)
    np.testing.assert_array_equal(dec.payload_bits[: payload.size], payload)
    np.testing.assert_array_equal(dec.original, torax_image)
