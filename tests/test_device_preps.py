"""Device-side prep twins introduced for tunnel resilience (round 3).

The bench (and any remote caller on a thin host link) ships payload BITS 8x
packed and rebuilds the kernel input layouts on device instead of uploading
them pre-strided from the host. Each device prep must be bit-identical to
its host twin:

1. ``pallas_pee.prep_messages_device`` == ``pallas_pee.prep_messages``;
2. ``bench._ship_bits`` round-trips arbitrary bit matrices exactly;
3. ``bench._tile_plan`` over one planned image equals ``plan_batch`` over a
   batch of stat-identical images (plan rows are pure window geometry).
"""

import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root
import bench  # noqa: E402

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.ops import pallas_pee as pp
from codec_tcc_tpu.parallel import batch as batch_par


def test_prep_messages_device_matches_host(rng):
    b, lpad, n = 3, 4096, 64 * 128
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    host2d, host_l2 = pp.prep_messages(msgs, n)
    dev2d, dev_l2 = pp.prep_messages_device(jnp.asarray(msgs), n)
    assert dev_l2 == host_l2
    assert dev2d.shape == host2d.shape
    np.testing.assert_array_equal(np.asarray(dev2d), host2d)


def test_ship_bits_roundtrip(rng):
    for l in (1, 7, 8, 100, 1023):
        msgs = rng.integers(0, 2, size=(2, l)).astype(np.uint8)
        out = np.asarray(bench._ship_bits(msgs))
        np.testing.assert_array_equal(out, msgs)


def test_xor_maps_packed_batch_matches_host(rng):
    from codec_tcc_tpu.ops.embed import xor_maps_packed_batch
    from codec_tcc_tpu.pipeline import _host_xor_maps

    for dtype, nbits in ((np.uint16, 5), (np.uint8, 3)):
        b, h, w = 2, 16, 32
        orig = rng.integers(0, np.iinfo(dtype).max, size=(b, h, w)).astype(dtype)
        # flip only low-plane bits, like an embed
        stego = orig ^ rng.integers(0, 1 << nbits, size=(b, h, w)).astype(dtype)
        packed = np.asarray(
            xor_maps_packed_batch(jnp.asarray(orig), jnp.asarray(stego), nbits)
        )
        n = h * w
        maps = np.unpackbits(packed.reshape(b * nbits, n // 8), axis=1)
        maps = maps.reshape(b, nbits, h, w)
        for i in range(b):
            np.testing.assert_array_equal(
                maps[i], _host_xor_maps(orig[i], stego[i], nbits)
            )
        # reconstruction: orig ^ unpacked-diff == stego
        diff = np.zeros((b, h, w), dtype)
        for k in range(nbits):
            diff |= maps[:, k].astype(dtype) << k
        np.testing.assert_array_equal(orig ^ diff, stego)


def test_tile_plan_matches_plan_batch(rng):
    B, h, w = 3, 64, 64
    img = rng.integers(0, 837, size=(h, w)).astype(np.uint16)
    payloads = [rng.integers(0, 2, size=500).astype(np.uint8) for _ in range(B)]
    cfg = EncodeConfig(beta=0.4)

    full = batch_par.plan_batch(
        np.broadcast_to(img, (B, h, w)).copy(), payloads, cfg
    )
    tiled = bench._tile_plan(
        batch_par.plan_batch(img[None], payloads[:1], cfg), payloads, B
    )

    assert tiled.nbits == full.nbits and tiled.lpad == full.lpad
    np.testing.assert_array_equal(tiled.s, full.s)
    np.testing.assert_array_equal(tiled.starts, full.starts)
    np.testing.assert_array_equal(tiled.lengths, full.lengths)
    np.testing.assert_array_equal(tiled.offsets, full.offsets)
    np.testing.assert_array_equal(tiled.msgs, full.msgs)
    np.testing.assert_array_equal(tiled.payload_bits, full.payload_bits)
