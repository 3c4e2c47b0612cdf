"""Data-parallel batch + tiled-volume tests on the virtual 8-device CPU mesh
(SURVEY §4 item 4: multi-chip correctness without TPUs)."""

import jax
import numpy as np
import pytest

from oracle import numpy_ref as oracle
from codec_tcc_tpu import EncodeConfig
from codec_tcc_tpu.parallel import batch as batch_par
from codec_tcc_tpu.parallel import mesh as mesh_par
from codec_tcc_tpu.parallel import volume as volume_par


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return mesh_par.make_mesh(8, axes=("dp",))


def _make_batch(rng, b=8, h=64, w=64, dtype=np.uint16, hi=837):
    return rng.integers(0, hi, size=(b, h, w)).astype(dtype)


def test_batched_histograms_exact(rng):
    imgs = _make_batch(rng, b=4)
    hists = np.asarray(batch_par.batched_histograms(imgs, 65536))
    for i in range(4):
        np.testing.assert_array_equal(
            hists[i], np.bincount(imgs[i].ravel(), minlength=65536)
        )


def test_batch_plan_matches_single_image(rng):
    imgs = _make_batch(rng, b=4)
    payloads = [rng.integers(0, 2, size=500).astype(np.uint8) for _ in range(4)]
    plan = batch_par.plan_batch(imgs, payloads)
    for i in range(4):
        s_ref, _, _ = oracle.adaptive_decomposition(imgs[i], beta=0.4)
        assert plan.s[i] == s_ref


def test_batch_encode_extract_sharded(mesh8, rng):
    """Sharded batched embed must equal the per-image oracle bit-for-bit and
    round-trip every payload."""
    b = 8
    imgs = _make_batch(rng, b=b)
    payloads = [
        rng.integers(0, 2, size=int(k)).astype(np.uint8)
        for k in rng.integers(10, 1200, size=b)
    ]
    plan = batch_par.plan_batch(
        imgs, payloads, EncodeConfig(beta=0.4, strategy="multi_plane")
    )
    stego = batch_par.encode_batch(imgs, plan, mesh8)
    stego_np = np.asarray(stego)

    for i in range(b):
        s = int(plan.s[i])
        local = oracle.split_planes(imgs[i], 16)[:s]
        res = oracle.embed_multi_plane(local, payloads[i])
        ref = oracle.merge_planes(oracle.split_planes(imgs[i], 16)[s:], res.stego_planes)
        np.testing.assert_array_equal(stego_np[i], ref)

    bits = np.asarray(batch_par.extract_batch(stego, plan, mesh8))
    for i in range(b):
        nb = int(plan.payload_bits[i])
        np.testing.assert_array_equal(bits[i, :nb], payloads[i])


@pytest.mark.parametrize("h,w", [(64, 64), (100, 100)])
def test_batch_packed_backend_matches_xla(rng, h, w):
    """The 'packed' serving backend (round 3: plane windows folded into
    clear/value words on device, one fused embed sweep) is bit-exact with
    the XLA path on even and odd (pad-to-128) geometries, and its extract
    round-trips every payload."""
    b = 4
    imgs = rng.integers(0, 837, size=(b, h, w)).astype(np.uint16)
    payloads = [
        rng.integers(0, 2, size=int(k)).astype(np.uint8)
        for k in rng.integers(10, 900, size=b)
    ]
    plan = batch_par.plan_batch(
        imgs, payloads, EncodeConfig(beta=0.4, strategy="hybrid")
    )
    ref = np.asarray(batch_par.encode_batch(imgs, plan, backend="xla"))
    got = np.asarray(batch_par.encode_batch(imgs, plan, backend="packed"))
    np.testing.assert_array_equal(got, ref)
    bits = batch_par.extract_batch(got, plan, backend="packed")
    for i in range(b):
        nb = int(plan.payload_bits[i])
        np.testing.assert_array_equal(bits[i, :nb], payloads[i])


def test_batch_packed_sharded_matches_unsharded(mesh8, rng):
    """The packed tier under a dp mesh (elementwise XLA, sharded with zero
    collectives) equals the unsharded packed result, and sharded extract
    round-trips."""
    b = 8
    imgs = _make_batch(rng, b=b)
    payloads = [
        rng.integers(0, 2, size=int(k)).astype(np.uint8)
        for k in rng.integers(10, 700, size=b)
    ]
    plan = batch_par.plan_batch(imgs, payloads)
    ref = np.asarray(batch_par.encode_batch(imgs, plan, None, backend="packed"))
    got = np.asarray(batch_par.encode_batch(imgs, plan, mesh8, backend="packed"))
    np.testing.assert_array_equal(got, ref)
    bits = batch_par.extract_batch(got, plan, mesh8, backend="packed")
    for i in range(b):
        nb = int(plan.payload_bits[i])
        np.testing.assert_array_equal(bits[i, :nb], payloads[i])


def test_batch_unsharded_equals_sharded(mesh8, rng):
    imgs = _make_batch(rng, b=8, dtype=np.uint8, hi=256)
    payloads = [rng.integers(0, 2, size=300).astype(np.uint8)] * 8
    plan = batch_par.plan_batch(imgs, payloads)
    a = np.asarray(batch_par.encode_batch(imgs, plan, None))
    b_ = np.asarray(batch_par.encode_batch(imgs, plan, mesh8))
    np.testing.assert_array_equal(a, b_)


def test_volume_roundtrip_sharded(mesh8, rng):
    """BASELINE config[3] shape (scaled down): uint16 volume, tiled
    embed/extract across the DP mesh, global cut point, psum'd histogram."""
    vol = rng.integers(0, 4096, size=(16, 64, 64)).astype(np.uint16)
    payload = rng.integers(0, 2, size=60_000).astype(np.uint8)
    cfg = EncodeConfig(beta=0.8, compute_metrics=True)
    res = volume_par.encode_volume(vol, payload, cfg, mesh8)

    # global s equals a host decomposition of the concatenated volume
    s_ref, _, _ = oracle.adaptive_decomposition(vol.reshape(16 * 64, 64), beta=0.8)
    assert res.s == s_ref

    got = volume_par.extract_volume(res.stego, res.plan, mesh8)
    np.testing.assert_array_equal(got, payload)
    assert res.metrics is not None and res.metrics["psnr"] > 30


def test_volume_capacity_error(rng):
    vol = rng.integers(0, 4096, size=(2, 32, 32)).astype(np.uint16)
    too_big = np.ones(2 * 16 * 32 * 32 + 1, dtype=np.uint8)
    with pytest.raises(ValueError, match="capacity"):
        volume_par.encode_volume(vol, too_big, EncodeConfig(compute_metrics=False))


def test_mesh_construction():
    m = mesh_par.make_mesh(8, axes=("dp", "tile"), shape=(4, 2))
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("dp", "tile")


def test_batch_hybrid_strategy_matches_oracle(rng):
    """Batched hybrid planning: per-image variance-chosen start offsets."""
    imgs = _make_batch(rng, b=4, dtype=np.uint8, hi=256)
    payloads = [rng.integers(0, 2, size=800).astype(np.uint8) for _ in range(4)]
    cfg = EncodeConfig(beta=0.4, strategy="hybrid", search_block_size=16)
    plan = batch_par.plan_batch(imgs, payloads, cfg)
    stego = np.asarray(batch_par.encode_batch(imgs, plan))
    for i in range(4):
        s = int(plan.s[i])
        local = oracle.split_planes(imgs[i], 8)[:s]
        res = oracle.embed_hybrid(local, payloads[i], 16)
        ref = oracle.merge_planes(oracle.split_planes(imgs[i], 8)[s:], res.stego_planes)
        np.testing.assert_array_equal(stego[i], ref)
    bits = batch_par.extract_batch(stego, plan)
    for i in range(4):
        np.testing.assert_array_equal(bits[i, :800], payloads[i])


@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid"])
def test_batch_containers_match_single_image(rng, strategy):
    """encode_batch_containers must produce containers byte-identical to the
    single-image pipeline's, and decode_batch_containers must round-trip
    payloads and originals."""
    from codec_tcc_tpu import decode_container, encode_array

    b = 4
    imgs = _make_batch(rng, b=b, dtype=np.uint8, hi=256)
    payloads = [rng.bytes(int(k)) for k in rng.integers(5, 120, size=b)]
    cfg = EncodeConfig(
        beta=0.4, strategy=strategy, codec="deflate", compute_metrics=True
    )
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    assert res.metrics is not None and len(res.metrics) == b

    for i in range(b):
        single = encode_array(imgs[i], payloads[i], cfg)
        assert res.containers[i] == single.container, f"container {i} differs"
        np.testing.assert_array_equal(res.stego[i], single.stego)
        assert res.metrics[i]["psnr"] == pytest.approx(single.metrics["psnr"])

    # fused batched decode
    decs = batch_par.decode_batch_containers(res.containers)
    for i, dec in enumerate(decs):
        assert dec.payload == payloads[i]
        np.testing.assert_array_equal(dec.original, imgs[i])

    # single-image decoder reads the batch containers too (interop)
    one = decode_container(res.containers[2])
    assert one.payload == payloads[2]


def test_decode_batch_containers_mixed_buckets(rng, mesh8):
    """A heterogeneous container list decodes per (geometry, strategy, ...)
    group — fused raster groups, fused PEE groups, per-item for strategies
    with no fused route (block_adaptive) — with results in input order,
    exactly equal to the single-image decoder's."""
    from codec_tcc_tpu import decode_container, encode_array

    imgs = _make_batch(rng, b=4, dtype=np.uint16, hi=837)
    small = rng.integers(0, 837, size=(32, 32)).astype(np.uint16)
    blobs = [
        encode_array(imgs[0], b"alpha", EncodeConfig(strategy="multi_plane")).container,
        encode_array(imgs[1], b"beta", EncodeConfig(strategy="block_adaptive")).container,
        encode_array(imgs[2], b"gamma", EncodeConfig(strategy="hybrid")).container,
        encode_array(imgs[3], b"delta", EncodeConfig(strategy="hybrid")).container,
        encode_array(small, b"echo", EncodeConfig(strategy="hybrid")).container,
        encode_array(imgs[0], b"fox", EncodeConfig(strategy="pee")).container,
    ]
    decs = batch_par.decode_batch_containers(blobs)
    assert [d.payload for d in decs] == [
        b"alpha", b"beta", b"gamma", b"delta", b"echo", b"fox",
    ]
    for blob, dec in zip(blobs, decs):
        single = decode_container(blob)
        np.testing.assert_array_equal(dec.original, single.original)
        np.testing.assert_array_equal(dec.stego, single.stego)

    # homogeneous + mesh: fused path under sharding
    cfg = EncodeConfig(strategy="hybrid", codec="deflate")
    payloads = [rng.bytes(40) for _ in range(8)]
    imgs8 = _make_batch(rng, b=8, dtype=np.uint16, hi=837)
    res = batch_par.encode_batch_containers(imgs8, payloads, cfg, mesh8)
    decs = batch_par.decode_batch_containers(res.containers, mesh8)
    for i, dec in enumerate(decs):
        assert dec.payload == payloads[i]
        np.testing.assert_array_equal(dec.original, imgs8[i])


def test_batch_block_adaptive_fused_bit_exact(rng):
    """Round-3 upgrade: block_adaptive joins the fused batch matrix — one
    vmapped popcount + one vmapped rank-compare embed dispatch for the whole
    batch, containers byte-identical to the single-image pipeline, and the
    grouped fused decode bit-equal to the single-image decoder."""
    from codec_tcc_tpu import decode_container, encode_array

    imgs = _make_batch(rng, b=4, dtype=np.uint16, hi=837)
    payloads = [rng.bytes(30 + 11 * i) for i in range(4)]
    cfg = EncodeConfig(strategy="block_adaptive", codec="deflate",
                       compute_metrics=False)
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    for i in range(4):
        assert res.containers[i] == encode_array(imgs[i], payloads[i], cfg).container
    decs = batch_par.decode_batch_containers(res.containers)
    for i, dec in enumerate(decs):
        assert dec.payload == payloads[i]
        np.testing.assert_array_equal(dec.original, imgs[i])
        single = decode_container(res.containers[i])
        np.testing.assert_array_equal(dec.payload_bits, single.payload_bits)


def test_decode_batch_ragged_groups_under_mesh(rng, mesh8):
    """A mixed batch whose groups don't divide the dp axis must decode
    unsharded instead of crashing in device_put (review regression: the
    pre-bucketing code fell back per-item for mixed lists, so grouped decode
    must not be less robust under a mesh)."""
    from codec_tcc_tpu import encode_array

    imgs = _make_batch(rng, b=3, dtype=np.uint16, hi=837)
    blobs = [
        encode_array(imgs[0], b"one", EncodeConfig(strategy="multi_plane")).container,
        encode_array(imgs[1], b"two", EncodeConfig(strategy="multi_plane")).container,
        encode_array(imgs[2], b"three", EncodeConfig(strategy="hybrid")).container,
    ]
    decs = batch_par.decode_batch_containers(blobs, mesh8)
    assert [d.payload for d in decs] == [b"one", b"two", b"three"]


def test_decode_block_group_rejects_wrong_shape_stego(rng):
    """A block_adaptive container whose stego blob decodes to a different
    geometry than its header must fail with the 'Invalid file' contract,
    not a raw numpy stack/broadcast error."""
    from codec_tcc_tpu import encode_array
    from codec_tcc_tpu.io import container as container_io
    from codec_tcc_tpu.io.codecs import get as get_codec

    img = rng.integers(0, 837, size=(32, 32)).astype(np.uint16)
    cfg = EncodeConfig(strategy="block_adaptive", compute_metrics=False)
    good = encode_array(img, b"ok", cfg).container
    cont = container_io.parse(good)
    wrong = rng.integers(0, 837, size=(16, 16)).astype(np.uint16)
    bad = container_io.pack(
        cont.meta, cont.bitmaps_blob, get_codec("deflate").encode(wrong)
    )
    with pytest.raises(ValueError, match="Invalid file"):
        batch_par.decode_batch_containers([good, bad])


def test_batch_containers_capacity_error(rng):
    imgs = _make_batch(rng, b=2, h=32, w=32, dtype=np.uint8, hi=256)
    payloads = [b"ok", bytes(4096)]  # second exceeds 32x32 capacity
    with pytest.raises(ValueError, match="capacity"):
        batch_par.encode_batch_containers(
            imgs, payloads, EncodeConfig(compute_metrics=False)
        )


def test_batch_rejects_nonraster_strategy(rng):
    imgs = _make_batch(rng, b=2)
    with pytest.raises(ValueError, match="raster"):
        batch_par.plan_batch(imgs, [b"x", b"y"], EncodeConfig(strategy="pee"))


@pytest.mark.parametrize(
    "strategy", ["multi_plane", "hybrid", "block_adaptive"]
)
def test_volume_container_roundtrip(rng, strategy):
    """STGV serialization: per-slice self-contained containers, exact payload
    and full original-volume restoration — every raster strategy at the
    volume's GLOBAL cut point (block_adaptive joined in round 3)."""
    vol = rng.integers(0, 4096, size=(4, 64, 64)).astype(np.uint16)
    payload = rng.integers(0, 2, size=9_000).astype(np.uint8)
    cfg = EncodeConfig(beta=0.8, codec="deflate", compute_metrics=False,
                       strategy=strategy)
    res = volume_par.encode_volume(vol, payload, cfg)
    blob = volume_par.pack_volume(vol, res, cfg)
    got_bits, stego, original = volume_par.unpack_volume(blob)
    np.testing.assert_array_equal(got_bits, payload)
    np.testing.assert_array_equal(stego, res.stego)
    np.testing.assert_array_equal(original, vol)


def test_volume_container_bad_magic():
    with pytest.raises(ValueError, match="STGV"):
        volume_par.unpack_volume(b"XXXX" + b"\0" * 64)


def test_batch_pee_roundtrip(mesh8, rng):
    """Batched PEE with a shared threshold: every image's container decodes
    to its exact payload and original, sharded over the mesh."""
    from codec_tcc_tpu import decode_container
    from codec_tcc_tpu.parallel.batch_pee import encode_pee_batch
    from codec_tcc_tpu.io import dicom

    base, _ = dicom.load_image("/root/reference/images/torax.dcm")
    imgs = np.stack([base[i * 32 : i * 32 + 64, :64] for i in range(8)]).copy()
    payloads = [rng.integers(0, 2, size=int(k)).astype(np.uint8)
                for k in rng.integers(16, 300, size=8)]
    res = encode_pee_batch(imgs, payloads, EncodeConfig(codec="deflate"),
                           mesh8, bits_stored=8)
    assert len(res.containers) == 8
    for i in range(8):
        dec = decode_container(res.containers[i])
        np.testing.assert_array_equal(dec.payload_bits, payloads[i])
        np.testing.assert_array_equal(dec.original, imgs[i])

    # the symmetric batched decode (Pallas on TPU, per-item fallback here)
    from codec_tcc_tpu.parallel.batch_pee import decode_pee_batch

    outs = decode_pee_batch(res.containers)
    assert len(outs) == 8
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out.payload_bits, payloads[i])
        np.testing.assert_array_equal(out.original, imgs[i])


def test_volume_pee_roundtrip(rng):
    """PEE volume: shared threshold, capacity-aware contiguous split spanning
    multiple slices, exact payload + original back through STGV."""
    from codec_tcc_tpu.parallel import volume as volume_par

    yy, xx = np.mgrid[0:64, 0:64]
    base = (400 + 90 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).astype(np.int64)
    vol = np.stack([
        (base + rng.integers(-1, 2, size=(64, 64))).clip(0, 836).astype(np.uint16)
        for _ in range(5)
    ])
    payload = rng.integers(0, 2, size=5_000).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", codec="deflate")

    res = volume_par.encode_volume(vol, payload, cfg)
    assert res.threshold is not None and res.plan is None
    assert int(res.slice_bits.sum()) == payload.size
    assert (res.slice_bits > 0).sum() >= 2          # the split really spans slices
    blob = volume_par.pack_volume(vol, res, cfg)

    bits, stego, original = volume_par.unpack_volume(blob)
    np.testing.assert_array_equal(bits, payload)
    np.testing.assert_array_equal(stego, res.stego)
    np.testing.assert_array_equal(original, vol)


def test_volume_pee_capacity_error(rng):
    from codec_tcc_tpu.parallel import volume as volume_par

    vol = rng.integers(0, 65536, size=(2, 16, 16)).astype(np.uint16)  # noise
    with np.testing.assert_raises(ValueError):
        volume_par.encode_volume(
            vol, np.ones(200_000, np.uint8), EncodeConfig(strategy="pee")
        )


def test_batch_containers_honor_bits_stored(rng):
    """The fused batch path must decompose under the same nbits cap as the
    single-image pipeline (defect B6 fix): bits_stored-limited uint16 images
    produce byte-identical containers through both paths."""
    from codec_tcc_tpu import encode_array

    from codec_tcc_tpu.ops import decompose as decompose_ops

    b = 3
    # 12-bit data in uint16 carriers with a binding 8-plane cap: at beta=0.8
    # the MI target exceeds what 8 planes can accumulate, so the capped scan
    # yields a different s than the full-width scan — exactly the divergence
    # the fused path showed before plan_batch learned the cap
    imgs = rng.integers(0, 4096, size=(b, 64, 64)).astype(np.uint16)
    assert (
        decompose_ops.decompose(imgs[0], beta=0.8, nbits=8).s
        != decompose_ops.decompose(imgs[0], beta=0.8, nbits=16).s
    ), "test inputs must make the cap binding"
    payloads = [rng.bytes(20) for _ in range(b)]
    cfg = EncodeConfig(beta=0.8, nbits=8, strategy="multi_plane",
                       codec="deflate", compute_metrics=False)
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    for i in range(b):
        single = encode_array(imgs[i], payloads[i], cfg)
        assert res.containers[i] == single.container, f"container {i} differs"

    decs = batch_par.decode_batch_containers(res.containers)
    for i, dec in enumerate(decs):
        assert dec.payload == payloads[i]
        np.testing.assert_array_equal(dec.original, imgs[i])
