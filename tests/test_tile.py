"""Spatial (tile) sharding tests — VERDICT round-1 item 1.

A single >= 2048x2048 image is sharded by rows over the 8-device ``tile``
mesh; embed/extract must be bit-exact vs the single-device kernels, and the
compiled shard_map programs must contain **no collectives at all** (the
decomposition histogram is the pipeline's single psum — asserted separately).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.ops import embed as embed_ops
from codec_tcc_tpu.ops import segments as segment_ops
from codec_tcc_tpu.parallel import mesh as mesh_par
from codec_tcc_tpu.parallel import tile as tile_par


@pytest.fixture(scope="module")
def tile_mesh():
    return mesh_par.make_mesh(8, ("tile",))


@pytest.fixture(scope="module")
def big_image():
    rng = np.random.default_rng(42)
    return rng.integers(0, 4096, size=(2048, 2048)).astype(np.uint16)


def _plan(img, payload_bits, s, nbits, start, align, seed=42):
    plan = segment_ops.distribute_segments(s, payload_bits, seed)
    return segment_ops.raster_plane_plan(plan, img.size, nbits, start, align)


def test_shard_windows_cover_ring_exactly():
    """Every (plane, global position, message bit) assignment of the plan is
    reproduced exactly once by the per-shard windows, including wraparound."""
    n, k = 4096, 8
    pp = _plan(np.zeros((64, 64), np.uint8), 6000, 3, 8, start=3900, align=False)
    tp = tile_par.shard_windows(pp, n, k)
    for p in range(pp.s):
        st, ln, mo = int(pp.starts[p]), min(int(pp.lengths[p]), n), int(pp.offsets[p])
        want = {}  # global pos -> message bit index
        for r in range(ln):
            want[(st + r) % n] = mo + r
        got = {}
        for kk in range(k):
            for j in range(tp.nwin):
                if tp.plane_id[kk, j] != p or tp.lens[kk, j] == 0:
                    continue
                for r in range(int(tp.lens[kk, j])):
                    g = kk * tp.local_n + int(tp.starts[kk, j]) + r
                    assert g not in got, "window overlap"
                    got[g] = int(tp.moffs[kk, j]) + r
        # note: two planes may share a (k, j) slot ordering; compare per plane
        want_items = set(want.items())
        got_items = set(got.items())
        assert got_items == want_items


@pytest.mark.parametrize("start,align", [(0, True), (1_234_567, False)])
def test_tiled_embed_extract_bitexact_2048(tile_mesh, big_image, start, align):
    """2048x2048 uint16 sharded over 8 devices: bit-exact vs single-device
    embed; extraction recovers the payload exactly."""
    img = big_image
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 2, size=1_000_000).astype(np.uint8)
    s, nbits = 4, 16
    pp = _plan(img, payload.size, s, nbits, start, align)

    # single-device reference
    msg_pad_ref = embed_ops.pad_message(payload, img.size, int(pp.offsets.max()))
    ref = np.asarray(
        embed_ops.embed(img, msg_pad_ref, pp.starts, pp.lengths, pp.offsets,
                        np.int32(s), nbits)
    )

    tp = tile_par.shard_windows(pp, img.size, 8)
    msg_pad = embed_ops.pad_message(payload, tp.local_n, int(tp.moffs.max()))
    stego = tile_par.embed_tiled(img, msg_pad, tp, tile_mesh)
    # output stays sharded over the tile axis
    assert stego.sharding.spec == P("tile", None)
    np.testing.assert_array_equal(np.asarray(stego), ref)

    aligned = tile_par.extract_tiled_aligned(np.asarray(stego), tp, tile_mesh)
    out = tile_par.assemble_tiled(aligned, tp, payload.size)
    np.testing.assert_array_equal(out, payload)


def test_tiled_kernels_compile_without_collectives(tile_mesh, big_image):
    """The embed/extract shard_map programs must move zero pixel data between
    shards: no all-gather, all-reduce, all-to-all, or collective-permute in
    the compiled HLO."""
    img = big_image
    pp = _plan(img, 500_000, 4, 16, start=999_999, align=False)
    tp = tile_par.shard_windows(pp, img.size, 8)
    msg_pad = embed_ops.pad_message(
        np.zeros(500_000, np.uint8), tp.local_n, int(tp.moffs.max())
    )
    sh = NamedSharding(tile_mesh, P("tile", None))
    img_d = jax.device_put(jnp.asarray(img), sh)
    msg_d = jax.device_put(jnp.asarray(msg_pad), NamedSharding(tile_mesh, P()))
    args = (img_d, msg_d, jnp.asarray(tp.plane_id), jnp.asarray(tp.starts),
            jnp.asarray(tp.lens), jnp.asarray(tp.moffs))
    lowered = tile_par._embed_tiled_jit.lower(*args, mesh=tile_mesh, axis="tile")
    hlo = lowered.compile().as_text()
    assert not re.search(r"all-gather|all-reduce|all-to-all|collective-permute", hlo)

    lowered_x = tile_par._extract_tiled_jit.lower(
        img_d, args[2], args[3], args[4], mesh=tile_mesh, axis="tile"
    )
    hlo_x = lowered_x.compile().as_text()
    assert not re.search(r"all-gather|all-reduce|all-to-all|collective-permute", hlo_x)

    # ... while the decomposition histogram performs exactly its one psum
    lowered_h = tile_par._hist_tiled_jit.lower(
        img_d, nbins=65536, mesh=tile_mesh, axis="tile"
    )
    hlo_h = lowered_h.compile().as_text()
    assert re.search(r"all-reduce", hlo_h)
    assert not re.search(r"all-gather|all-to-all|collective-permute", hlo_h)


def test_tiled_pipeline_matches_single_device(tile_mesh, big_image):
    """encode_array_tiled must produce the byte-identical STGC container the
    single-device pipeline writes, and decode_container_tiled must round-trip
    payload + original."""
    from codec_tcc_tpu import pipeline

    rng = np.random.default_rng(3)
    payload = rng.bytes(40_000)
    cfg = EncodeConfig(strategy="hybrid", codec="deflate", beta=0.4)

    res_ref = pipeline.encode_array(big_image, payload, cfg)
    res_tiled = tile_par.encode_array_tiled(big_image, payload, cfg, tile_mesh)
    assert res_tiled.container == res_ref.container
    assert res_tiled.meta.s == res_ref.meta.s
    assert res_tiled.metrics["mse"] == pytest.approx(res_ref.metrics["mse"], rel=1e-5)

    dec = tile_par.decode_container_tiled(res_tiled.container, tile_mesh)
    assert dec.payload == payload
    np.testing.assert_array_equal(dec.original, big_image)

    # cross-decode: tiled containers decode on a single device and vice versa
    dec_single = pipeline.decode_container(res_tiled.container)
    assert dec_single.payload == payload


def test_tiled_block_adaptive_matches_single_device(tile_mesh, big_image):
    """Round-3: block_adaptive joins the tile layer. The sharded band
    rank-compare embed must write the byte-identical container the
    single-device pipeline writes (replicated bases + message, global-row
    rank formula), and the tiled decode (sharded plane extraction + host
    rank placement) must round-trip payload and original, cross-decoding
    with the single-device decoder both ways."""
    from codec_tcc_tpu import pipeline

    rng = np.random.default_rng(7)
    payload = rng.bytes(40_000)
    cfg = EncodeConfig(strategy="block_adaptive", codec="deflate", beta=0.4)

    res_ref = pipeline.encode_array(big_image, payload, cfg)
    res_tiled = tile_par.encode_array_tiled(big_image, payload, cfg, tile_mesh)
    assert res_tiled.container == res_ref.container

    dec = tile_par.decode_container_tiled(res_tiled.container, tile_mesh)
    assert dec.payload == payload
    np.testing.assert_array_equal(dec.original, big_image)

    dec_single = pipeline.decode_container(res_tiled.container)
    assert dec_single.payload == payload
    np.testing.assert_array_equal(
        dec.payload_bits, dec_single.payload_bits
    )


def test_tiled_block_embed_compiles_without_collectives(tile_mesh, big_image):
    """The sharded band rank-compare embed, like the raster tile kernels,
    must compile with no collectives (bases and message replicated; each
    pixel's rank depends only on its own tile's base)."""
    h, w = big_image.shape
    pp = _plan(big_image, 9000, 4, 8, start=0, align=True)
    from codec_tcc_tpu.pipeline import _block_bases

    bases = _block_bases(jnp.asarray(big_image), 8, 4, 16, h, w)
    msg = np.zeros(big_image.size, np.uint8)
    lowered = tile_par._block_embed_tiled_jit.lower(
        jax.device_put(jnp.asarray(big_image),
                       NamedSharding(tile_mesh, P("tile", None))),
        jnp.asarray(msg), jnp.asarray(bases), jnp.asarray(pp.lengths),
        jnp.asarray(pp.offsets), jnp.int32(4),
        nbits=8, block=16, mesh=tile_mesh, axis="tile",
    )
    hlo = lowered.compile().as_text()
    assert not re.search(
        r"all-reduce|all-gather|collective-permute|all-to-all", hlo
    ), "unexpected collective in tiled block embed"


@pytest.mark.parametrize("strategy", ["hybrid", "multi_plane", "block_adaptive"])
def test_tiled_odd_geometry_matches_single_device(tile_mesh, strategy):
    """round-3 VERDICT missing #3 / next-step #6: a PRIME-row image must
    tile over 8 shards (zero-padded last band, sliced away), with containers
    still byte-identical to the single-device pipeline and payload +
    original round-tripping through both decoders."""
    from codec_tcc_tpu import pipeline

    rng = np.random.default_rng(11)
    img = rng.integers(0, 4096, size=(509, 512)).astype(np.uint16)  # 509 prime
    payload = rng.bytes(4_000)
    cfg = EncodeConfig(strategy=strategy, codec="deflate", beta=0.4)

    res_ref = pipeline.encode_array(img, payload, cfg)
    res_tiled = tile_par.encode_array_tiled(img, payload, cfg, tile_mesh)
    assert res_tiled.container == res_ref.container
    assert res_tiled.stego.shape == img.shape
    assert res_tiled.metrics["mse"] == pytest.approx(
        res_ref.metrics["mse"], rel=1e-5)

    dec = tile_par.decode_container_tiled(res_tiled.container, tile_mesh)
    assert dec.payload == payload
    np.testing.assert_array_equal(dec.original, img)
    dec_single = pipeline.decode_container(res_tiled.container)
    assert dec_single.payload == payload


def test_tiled_pee_odd_geometry_matches_single_device(tile_mesh):
    """PEE tile sharding on a prime-row image: pad rows are outside the
    interior geometry set, so containers stay byte-identical to the
    single-device encoder and both decoders round-trip."""
    from codec_tcc_tpu.models.pee import encode_pee_array
    from codec_tcc_tpu.parallel import tile_pee
    from codec_tcc_tpu import pipeline

    rng = np.random.default_rng(17)
    img = np.clip(
        400 + 40 * np.sin(np.arange(509)[:, None] / 23.0)
        + 40 * np.cos(np.arange(512)[None, :] / 31.0)
        + rng.integers(-2, 3, size=(509, 512)),
        0, 4095,
    ).astype(np.uint16)
    payload = rng.bytes(900)
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)

    ref = encode_pee_array(img, payload, cfg)
    res = tile_pee.encode_array_tiled_pee(img, payload, cfg, tile_mesh,
                                          backend="xla")
    assert res.container == ref.container
    assert res.stego.shape == img.shape

    dec = tile_pee.decode_container_tiled_pee(res.container, tile_mesh,
                                              backend="xla")
    assert dec.payload == payload
    np.testing.assert_array_equal(dec.original, img)
    dec_single = pipeline.decode_container(res.container)
    assert dec_single.payload == payload


def test_tiled_odd_geometry_histogram_exact(tile_mesh):
    """Pad rows land in bin 0 and must be subtracted exactly."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(101, 64)).astype(np.uint8)
    counts = tile_par.histogram_tiled(img, 256, tile_mesh)
    want = np.bincount(img.ravel(), minlength=256)
    np.testing.assert_array_equal(counts, want)


def test_tiled_decode_rejects_wrong_shape_stego(tile_mesh):
    """A container whose stego blob decodes to a different geometry than its
    header must fail with the 'Invalid file' contract in the tiled decoder
    too (review regression)."""
    from codec_tcc_tpu import pipeline
    from codec_tcc_tpu.io import container as container_io
    from codec_tcc_tpu.io.codecs import get as get_codec

    rng = np.random.default_rng(9)
    img = rng.integers(0, 4096, size=(64, 64)).astype(np.uint16)
    cfg = EncodeConfig(strategy="block_adaptive", compute_metrics=False)
    cont = container_io.parse(pipeline.encode_array(img, b"x", cfg).container)
    wrong = rng.integers(0, 4096, size=(16, 64)).astype(np.uint16)
    bad = container_io.pack(
        cont.meta, cont.bitmaps_blob, get_codec("deflate").encode(wrong)
    )
    with pytest.raises(ValueError, match="Invalid file"):
        tile_par.decode_container_tiled(bad, tile_mesh)


def test_tiled_volume_slice_plane(tile_mesh):
    """One slice-plane of a synthetic volume sharded spatially over the mesh
    (the SURVEY §5 volume formulation at the slice level)."""
    rng = np.random.default_rng(11)
    volume = rng.integers(0, 4096, size=(4, 512, 512)).astype(np.uint16)
    slice_img = volume[2]
    payload = rng.integers(0, 2, size=120_000).astype(np.uint8)
    pp = _plan(slice_img, payload.size, 3, 16, start=0, align=True)
    tp = tile_par.shard_windows(pp, slice_img.size, 8)
    msg_pad = embed_ops.pad_message(payload, tp.local_n, int(tp.moffs.max()))
    stego = np.asarray(tile_par.embed_tiled(slice_img, msg_pad, tp, tile_mesh))
    ref = np.asarray(
        embed_ops.embed(
            slice_img,
            embed_ops.pad_message(payload, slice_img.size, int(pp.offsets.max())),
            pp.starts, pp.lengths, pp.offsets, np.int32(3), 16,
        )
    )
    np.testing.assert_array_equal(stego, ref)
    aligned = tile_par.extract_tiled_aligned(stego, tp, tile_mesh)
    out = tile_par.assemble_tiled(aligned, tp, payload.size)
    np.testing.assert_array_equal(out, payload)


def test_tiled_histogram_matches_host(tile_mesh, big_image):
    from codec_tcc_tpu.ops.histogram import host_histogram

    counts = tile_par.histogram_tiled(big_image, 65536, tile_mesh)
    np.testing.assert_array_equal(counts, host_histogram(big_image, 65536))


# ---------------------------------------------------------------------------
# tile-sharded PEE (round 2): halo exchange + rank-prefix collectives
# ---------------------------------------------------------------------------


def test_tiled_pee_matches_single_device(tile_mesh):
    """Tile-sharded PEE containers are byte-identical to the single-device
    encoder's; both decoders recover the exact payload and original."""
    from codec_tcc_tpu import decode_container
    from codec_tcc_tpu.models.pee import encode_pee_array
    from codec_tcc_tpu.parallel import tile_pee

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:256, 0:256]
    base = (500 + 200 * np.sin(yy / 23.0) * np.cos(xx / 31.0)).astype(np.int64)
    img = (base + rng.integers(-1, 2, size=(256, 256))).clip(0, 900).astype(np.uint16)
    payload = rng.integers(0, 2, size=9_000).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)

    ref = encode_pee_array(img, payload, cfg)
    res = tile_pee.encode_array_tiled_pee(img, payload, cfg, tile_mesh)
    assert res.container == ref.container          # byte-identical
    np.testing.assert_array_equal(res.stego, ref.stego)

    dec = tile_pee.decode_container_tiled_pee(res.container, tile_mesh)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    np.testing.assert_array_equal(dec.original, img)

    # and the standard decoder reads the tiled container
    dec2 = decode_container(res.container)
    np.testing.assert_array_equal(dec2.payload_bits, payload)
    np.testing.assert_array_equal(dec2.original, img)


def test_tiled_pee_two_pass_and_saturation(tile_mesh):
    """Payload spilling into pass 1 + capacity error behavior."""
    from codec_tcc_tpu.models.pee import encode_pee_array
    from codec_tcc_tpu.parallel import tile_pee

    rng = np.random.default_rng(13)
    yy, xx = np.mgrid[0:128, 0:128]
    base = (300 + 100 * np.sin(yy / 11.0) * np.cos(xx / 13.0)).astype(np.int64)
    img = (base + rng.integers(-1, 2, size=(128, 128))).clip(0, 600).astype(np.uint16)
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)

    # two-pass: more bits than one pass holds at the chosen T
    payload = rng.integers(0, 2, size=9_500).astype(np.uint8)
    ref = encode_pee_array(img, payload, cfg)
    res = tile_pee.encode_array_tiled_pee(img, payload, cfg, tile_mesh)
    assert res.container == ref.container
    dec = tile_pee.decode_container_tiled_pee(res.container, tile_mesh)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    np.testing.assert_array_equal(dec.original, img)

    with pytest.raises(ValueError, match="capacity"):
        tile_pee.encode_array_tiled_pee(
            img, np.ones(200_000, np.uint8), cfg, tile_mesh
        )


def test_tiled_pee_pallas_backend_matches(tile_mesh):
    """The per-shard Pallas route (interpret mode on the CPU mesh) produces
    byte-identical containers to both the XLA shard_map route and the
    single-device encoder, and its decoder round-trips exactly."""
    from codec_tcc_tpu.models.pee import encode_pee_array
    from codec_tcc_tpu.parallel import tile_pee

    h, w = 4096, 128           # 8 shards x one 65,536-px kernel tile each
    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (420 + 180 * np.sin(yy / 29.0) * np.cos(xx / 17.0)).astype(np.int64)
    img = (base + rng.integers(-1, 2, size=(h, w))).clip(0, 800).astype(np.uint16)
    payload = rng.integers(0, 2, size=60_000).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)

    assert tile_pee.pallas_supported(h, w, 8)
    ref = encode_pee_array(img, payload, cfg)
    res = tile_pee.encode_array_tiled_pee(
        img, payload, cfg, tile_mesh, backend="pallas", interpret=True
    )
    assert res.container == ref.container

    dec = tile_pee.decode_container_tiled_pee(
        res.container, tile_mesh, backend="pallas", interpret=True
    )
    np.testing.assert_array_equal(dec.payload_bits, payload)
    np.testing.assert_array_equal(dec.original, img)
