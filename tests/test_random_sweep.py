"""Randomized end-to-end sweep: every strategy/codec/beta/shape combination
drawn here must round-trip payload AND original exactly (the SURVEY §4
property-test layer over the whole pipeline rather than single kernels)."""

import numpy as np
import pytest

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.io.codecs import get as get_codec
from codec_tcc_tpu.ops.segments import usable_capacity_bits
from codec_tcc_tpu.pipeline import decode_container, encode_array


def _smooth(rng, h, w, hi, dtype):
    yy, xx = np.mgrid[0:h, 0:w]
    base = hi / 2 + (hi / 3) * np.sin(yy / 11.0) * np.cos(xx / 17.0)
    img = base + rng.integers(-2, 3, size=(h, w))
    return img.clip(0, hi - 1).astype(dtype)


CASES = [
    # (strategy, dtype, hi, shape, beta, codec, payload_frac/bits)
    ("multi_plane", np.uint8, 256, (48, 52), 0.4, "deflate", 0.5),
    ("multi_plane", np.uint16, 4096, (64, 64), 0.8, "png", 0.3),
    ("hybrid", np.uint8, 256, (40, 72), 0.4, "jls", 0.6),
    ("hybrid", np.uint16, 837, (96, 64), 0.6, "deflate", 0.4),
    ("hybrid", np.uint16, 65536, (33, 67), 0.4, "png", 0.2),
    ("block_adaptive", np.uint8, 256, (64, 48), 0.5, "deflate", 0.3),
    ("block_adaptive", np.uint16, 4096, (56, 56), 0.4, "jls", 0.5),
    ("pee", np.uint8, 200, (64, 64), 0.4, "deflate", 150),
    ("pee", np.uint16, 837, (80, 80), 0.4, "jls", 300),
]


@pytest.mark.parametrize("strategy,dtype,hi,shape,beta,codec,frac", CASES)
def test_random_config_roundtrip(rng, strategy, dtype, hi, shape, beta, codec, frac):
    if not get_codec(codec).available():
        pytest.skip(f"codec {codec} unavailable")
    img = _smooth(rng, *shape, hi, dtype)
    cfg = EncodeConfig(strategy=strategy, beta=beta, codec=codec,
                       compute_metrics=False)
    if strategy == "pee":
        nbits_payload = int(frac)
    else:
        # derive s the same way encode will, to bound the payload safely
        from codec_tcc_tpu.ops.decompose import decompose

        s = decompose(img, beta=beta, nbits=dtype().itemsize * 8).s
        cap = usable_capacity_bits(s, img.size)
        nbits_payload = max(1, int(cap * frac))
    payload = rng.integers(0, 2, size=nbits_payload).astype(np.uint8)

    res = encode_array(img, payload, cfg)
    dec = decode_container(res.container)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    assert dec.original is not None
    np.testing.assert_array_equal(dec.original, img)
    assert dec.stego.dtype == img.dtype


def test_jxl_in_sweep_if_available(rng):
    if not get_codec("jxl").available():
        pytest.skip("jxl unavailable")
    img = _smooth(rng, 64, 64, 4096, np.uint16)
    cfg = EncodeConfig(strategy="hybrid", codec="jxl", compute_metrics=False)
    payload = rng.integers(0, 2, size=2000).astype(np.uint8)
    dec = decode_container(encode_array(img, payload, cfg).container)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    np.testing.assert_array_equal(dec.original, img)


BATCH_CASES = [
    ("multi_plane", np.uint8, 256, (40, 64), 0.4, "deflate"),
    ("hybrid", np.uint16, 4096, (48, 48), 0.6, "png"),
    ("hybrid", np.uint16, 837, (64, 32), 0.4, "jls"),
    ("pee", np.uint16, 700, (64, 64), 0.4, "deflate"),
]


def test_random_mixed_bucket_sweep(rng):
    """Round-3 bucketing under the property contract: a shuffled pile of
    containers spanning every strategy, two geometries and both dtypes
    decodes through the grouped batch decoder with per-item results exactly
    equal to the single-image decoder's, in input order."""
    from codec_tcc_tpu.parallel.batch import decode_batch_containers

    specs = [
        ("multi_plane", np.uint8, 256, (40, 64)),
        ("hybrid", np.uint16, 837, (40, 64)),
        ("hybrid", np.uint16, 837, (40, 64)),
        ("block_adaptive", np.uint16, 4096, (48, 48)),
        ("block_adaptive", np.uint16, 4096, (48, 48)),
        ("pee", np.uint16, 700, (48, 48)),
        ("multi_plane", np.uint8, 256, (48, 48)),
        ("pee", np.uint16, 700, (48, 48)),
    ]
    order = rng.permutation(len(specs))
    blobs, payloads = [], []
    for k in order:
        strategy, dtype, hi, shape = specs[k]
        img = _smooth(rng, *shape, hi, dtype)
        payload = rng.bytes(int(rng.integers(4, 30)))
        cfg = EncodeConfig(strategy=strategy, compute_metrics=False)
        blobs.append(encode_array(img, payload, cfg).container)
        payloads.append(payload)
    decs = decode_batch_containers(blobs)
    for i, dec in enumerate(decs):
        single = decode_container(blobs[i])
        assert dec.payload == payloads[i], f"payload {i}"
        np.testing.assert_array_equal(dec.payload_bits, single.payload_bits)
        np.testing.assert_array_equal(dec.original, single.original)
        np.testing.assert_array_equal(dec.stego, single.stego)


BATCH_CASES_EXT = BATCH_CASES + [
    ("block_adaptive", np.uint16, 4096, (48, 48), 0.4, "deflate"),
]


@pytest.mark.parametrize("strategy,dtype,hi,shape,beta,codec", BATCH_CASES_EXT)
def test_random_fused_batch_roundtrip(rng, strategy, dtype, hi, shape, beta, codec):
    """The fused batch serving path under the same property contract: random
    mixed-size payloads, exact payload + original back per item, containers
    readable by the single-image decoder."""
    from codec_tcc_tpu.parallel.batch import (
        decode_batch_containers, encode_batch_containers,
    )

    if not get_codec(codec).available():
        pytest.skip(f"codec {codec} unavailable")
    b = 3
    imgs = np.stack([_smooth(rng, *shape, hi, dtype) for _ in range(b)])
    payloads = [rng.bytes(int(k)) for k in rng.integers(4, 40, size=b)]
    cfg = EncodeConfig(strategy=strategy, beta=beta, codec=codec,
                       compute_metrics=False)
    res = encode_batch_containers(imgs, payloads, cfg)
    decs = decode_batch_containers(res.containers)
    for i, dec in enumerate(decs):
        assert dec.payload == payloads[i], f"payload {i}"
        np.testing.assert_array_equal(dec.original, imgs[i])
    one = decode_container(res.containers[1])
    assert one.payload == payloads[1]
    np.testing.assert_array_equal(one.original, imgs[1])
