"""Round-5 serving-path contracts.

1. ``utils.bits.xor_packed_windows`` — the O(payload) stego/original
   reconstruction — is bit-exact with the full ``packed_planes_to_diff``
   expansion for any raster plan shape (wrapping, overlapping, clamped).
2. ``parallel.batch.hybrid_base_offsets_host`` picks byte-identical start
   offsets to the device scan (the serving plan stage must be device-free
   without changing a single container byte).
3. ``Container.restore_original`` equals ``stego ^ diff`` on well-formed
   containers AND on adversarial blobs with bits outside the declared
   windows (where it must detect the violation and fall back to the exact
   full expansion).
4. The fused batch encode path (which now plans device-free and
   reconstructs stego through the window form) still produces containers
   byte-identical to the single-image pipeline.
"""

import numpy as np
import pytest

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.io import container as container_io
from codec_tcc_tpu.pipeline import decode_container, encode_array
from codec_tcc_tpu.utils import bits as bit_utils


def _window_packed(rng, n, s, starts, lengths):
    """Bit-packed plane maps nonzero only inside each plane's window."""
    packed = np.zeros((s, n // 8), np.uint8)
    for p in range(s):
        ln = min(int(lengths[p]), n)
        if ln <= 0:
            continue
        st = int(starts[p]) % n
        bits = np.zeros(n, np.uint8)
        idx = (st + np.arange(ln)) % n
        bits[idx] = rng.integers(0, 2, ln).astype(np.uint8)
        packed[p] = np.packbits(bits)
    return packed


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_xor_packed_windows_matches_full_expansion(dtype):
    rng = np.random.default_rng(0)
    h = w = 40
    n = h * w
    for trial in range(12):
        img = rng.integers(0, np.iinfo(dtype).max + 1, (h, w)).astype(dtype)
        s = int(rng.integers(1, 1 + 8 * np.dtype(dtype).itemsize // 2))
        starts = rng.integers(0, n, s)
        # mix short, wrapping, and full-length windows
        lengths = rng.integers(0, n + 1, s)
        if trial % 3 == 0:
            starts[0] = n - 13          # force a wraparound
            lengths[0] = 200
        packed = _window_packed(rng, n, s, starts, lengths)
        got = bit_utils.xor_packed_windows(img, packed, starts, lengths)
        want = img ^ bit_utils.packed_planes_to_diff(
            packed, img.dtype
        ).reshape(h, w)
        assert np.array_equal(got, want)
        assert got.dtype == img.dtype


def test_xor_packed_windows_full_capacity_wrap_overlap():
    """A wrapping window within 7 bits of full plane capacity with an
    unaligned start makes the two spans' BYTE ranges overlap; the shared
    byte must be XORed exactly once (the un-merged form applied it twice,
    cancelling every diff bit it held)."""
    rng = np.random.default_rng(0)
    h = w = 8
    n = h * w
    img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    for start, ln in ((10, n), (13, n - 3), (7, n - 7), (9, n - 8)):
        starts, lengths = np.array([start]), np.array([ln])
        packed = _window_packed(rng, n, 1, starts, lengths)
        got = bit_utils.xor_packed_windows(img, packed, starts, lengths)
        want = img ^ bit_utils.packed_planes_to_diff(
            packed, img.dtype
        ).reshape(h, w)
        assert np.array_equal(got, want), (start, ln)


def test_xor_packed_windows_zero_and_overlong():
    img = np.arange(64, dtype=np.uint16).reshape(8, 8)
    packed = np.zeros((2, 8), np.uint8)
    out = bit_utils.xor_packed_windows(img, packed, [0, 5], [0, 10_000])
    assert np.array_equal(out, img)
    # not a view of the input
    out[0, 0] ^= 1
    assert img[0, 0] == 0


@pytest.mark.parametrize("geometry", [(64, 64), (50, 37)])
def test_hybrid_offsets_host_matches_device(geometry):
    from codec_tcc_tpu.parallel import batch as batch_par

    h, w = geometry
    rng = np.random.default_rng(3)
    images = rng.integers(0, 4096, (5, h, w)).astype(np.uint16)
    for blk in (8, 16):
        host = batch_par.hybrid_base_offsets_host(images, h, w, blk)
        dev = batch_par.hybrid_base_offsets(images, h, w, blk)
        assert host == dev


@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid"])
def test_restore_original_window_route(strategy):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 4096, (48, 48)).astype(np.uint16)
    cfg = EncodeConfig(strategy=strategy, codec="deflate",
                       compute_metrics=False)
    res = encode_array(img, rng.bytes(400), cfg)
    cont = container_io.parse(res.container)
    stego = decode_container(res.container, restore_original=False).stego
    full = stego ^ cont.diff(stego.dtype)
    got = cont.restore_original(stego)
    assert np.array_equal(got, full)
    assert np.array_equal(got, img)          # reversibility


def test_restore_original_adversarial_out_of_window_bits():
    """A blob with map bits OUTSIDE the declared windows must restore
    exactly like the full-diff path (guard detects, falls back)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 4096, (48, 48)).astype(np.uint16)
    cfg = EncodeConfig(strategy="multi_plane", codec="deflate",
                       compute_metrics=False)
    res = encode_array(img, rng.bytes(40), cfg)
    cont = container_io.parse(res.container)
    m = cont.meta
    n = m.height * m.width
    packed = np.frombuffer(
        cont._raw_maps_blob(), dtype=np.uint8
    ).reshape(m.s, n // 8).copy()
    # the short payload leaves the tail of plane 0 untouched: flip a bit
    # far outside the window
    tail = (int(m.plane_starts[0]) + int(m.eff_lengths[0])) // 8 + 4
    assert tail < n // 8
    packed[0, tail] ^= 0x40
    cont.bitmaps_blob = container_io.compress_bitmaps_packed(packed)
    stego = decode_container(res.container, restore_original=False).stego
    want = stego ^ cont.diff(stego.dtype)
    got = cont.restore_original(stego)
    assert np.array_equal(got, want)
    assert not np.array_equal(got, img)      # the flip really landed


@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid"])
def test_batch_containers_byte_identical_after_device_free_plan(strategy):
    """encode_batch_containers (device-free plan + window unpack) must keep
    producing containers byte-identical to the single-image pipeline."""
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 4096, (3, 40, 40)).astype(np.uint16)
    payloads = [rng.bytes(120) for _ in range(3)]
    cfg = EncodeConfig(strategy=strategy, codec="deflate",
                       compute_metrics=False)
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    for i in range(3):
        single = encode_array(imgs[i], payloads[i], cfg)
        assert res.containers[i] == single.container
        dec = decode_container(res.containers[i])
        assert dec.payload == payloads[i]
        assert np.array_equal(dec.original, imgs[i])


@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid"])
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_host_embed_route_matches_device_route(strategy, dtype):
    """device_policy='host' (O(payload) window embed, ops.host_embed) must
    produce stego batches AND containers byte-identical to the forced
    device route for the same inputs."""
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(21)
    imgs = rng.integers(
        0, np.iinfo(dtype).max + 1, (4, 40, 40)
    ).astype(dtype)
    payloads = [rng.bytes(60 + 17 * i) for i in range(4)]
    dev = batch_par.encode_batch_containers(
        imgs, payloads,
        EncodeConfig(strategy=strategy, codec="deflate",
                     compute_metrics=False, device_policy="device"),
    )
    host = batch_par.encode_batch_containers(
        imgs, payloads,
        EncodeConfig(strategy=strategy, codec="deflate",
                     compute_metrics=False, device_policy="host"),
    )
    assert np.array_equal(dev.stego, host.stego)
    assert dev.containers == host.containers
    for c, p, im in zip(host.containers, payloads, imgs):
        d = decode_container(c)
        assert d.payload == p
        assert np.array_equal(d.original, im)


def test_host_embed_route_capacity_edge_wrap():
    """Exact-capacity hybrid payload: every plane's window wraps and the
    last one ends within bits of full capacity — the host route's span/byte
    handling must stay byte-identical to the device kernels."""
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(23)
    imgs = rng.integers(0, 65536, (2, 24, 24)).astype(np.uint16)
    cfg0 = EncodeConfig(strategy="hybrid", codec="deflate",
                        compute_metrics=False)
    # find each image's exact capacity at its cut point, then fill it
    probe = batch_par.plan_batch(imgs, [b"", b""], cfg0)
    payloads = []
    for i in range(2):
        cap_bits = int(probe.lengths[i, : probe.s[i]].sum())
        payloads.append(
            rng.integers(0, 2, cap_bits).astype(np.uint8)
        )
    dev = batch_par.encode_batch_containers(
        imgs, payloads, cfg0.with_overrides(device_policy="device")
    )
    host = batch_par.encode_batch_containers(
        imgs, payloads, cfg0.with_overrides(device_policy="host")
    )
    assert dev.containers == host.containers
    for c, p, im in zip(host.containers, payloads, imgs):
        d = decode_container(c)
        assert np.array_equal(
            np.frombuffer(d.payload_bits, np.uint8)
            if isinstance(d.payload_bits, bytes) else d.payload_bits, p
        )
        assert np.array_equal(d.original, im)


def test_host_policy_rejects_unsupported():
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(25)
    imgs = rng.integers(0, 256, (2, 16, 16)).astype(np.uint8)
    with pytest.raises(ValueError, match="device_policy"):
        batch_par.encode_batch_containers(
            imgs, [b"a", b"b"],
            EncodeConfig(strategy="block_adaptive", codec="deflate",
                         compute_metrics=False, device_policy="host"),
        )


def test_auto_policy_keeps_device_for_block_adaptive():
    """auto must still route block_adaptive through the device kernels
    (rank-compare permutations are device compute) — and round-trip."""
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(27)
    imgs = rng.integers(0, 4096, (2, 32, 32)).astype(np.uint16)
    payloads = [rng.bytes(40), rng.bytes(52)]
    cfg = EncodeConfig(strategy="block_adaptive", codec="deflate",
                       compute_metrics=False, block_size=8)
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    for c, p, im in zip(res.containers, payloads, imgs):
        d = decode_container(c)
        assert d.payload == p
        assert np.array_equal(d.original, im)


@pytest.mark.parametrize("strategy", ["multi_plane", "hybrid"])
def test_single_image_host_route_matches_device(strategy):
    """pipeline.encode_array with device_policy='host' must emit a
    byte-identical container to the forced device route (the serving
    daemon's single-image encode op rides this)."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 4096, (40, 40)).astype(np.uint16)
    payload = rng.bytes(200)
    dev = encode_array(
        img, payload,
        EncodeConfig(strategy=strategy, codec="deflate",
                     compute_metrics=False, device_policy="device"),
    )
    host = encode_array(
        img, payload,
        EncodeConfig(strategy=strategy, codec="deflate",
                     compute_metrics=False, device_policy="host"),
    )
    assert dev.container == host.container
    assert np.array_equal(dev.stego, host.stego)
    d = decode_container(host.container)
    assert d.payload == payload
    assert np.array_equal(d.original, img)


def test_resolve_host_route_decision_table():
    """EncodeConfig.resolve_host_route is THE routing decision shared by
    the single-image and batch encoders — pin its table."""
    base = EncodeConfig(strategy="hybrid", codec="deflate",
                        compute_metrics=False)
    n = 64 * 64
    assert base.resolve_host_route(n) is True
    # metrics requested -> device under auto
    assert base.with_overrides(
        compute_metrics=True).resolve_host_route(n) is False
    # multi-device mesh -> device under auto
    assert base.resolve_host_route(n, n_devices=8) is False
    # forced host overrides metrics and mesh
    forced = base.with_overrides(device_policy="host",
                                 compute_metrics=True)
    assert forced.resolve_host_route(n, n_devices=8) is True
    # forced device
    assert base.with_overrides(
        device_policy="device").resolve_host_route(n) is False
    # non-raster strategy or non-byte-aligned geometry
    assert base.with_overrides(
        strategy="block_adaptive").resolve_host_route(n) is False
    assert base.resolve_host_route(63 * 63) is False
    with pytest.raises(ValueError, match="device_policy"):
        base.with_overrides(
            strategy="pee", device_policy="host").resolve_host_route(n)
