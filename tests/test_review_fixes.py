"""Regression tests for the round-1 code-review findings (all reproduced
before fixing; each test pins the corrected behavior)."""

import numpy as np
import pytest

from codec_tcc_tpu import EncodeConfig, decode_container, encode_array
from codec_tcc_tpu.io import container as container_io
from codec_tcc_tpu.ops import embed as embed_ops
from codec_tcc_tpu.ops.segments import usable_capacity_bits


def test_capacity_overflow_rejected_loudly(rng):
    """Finding 1: payloads beyond the usable (per-plane-clamped) capacity must
    raise instead of silently dropping bits."""
    img = rng.integers(0, 65536, size=(128, 128)).astype(np.uint16)
    # beta=0.1 forces s=1, so a 3*H*W payload grossly exceeds capacity
    cfg = EncodeConfig(strategy="multi_plane", beta=0.1, compute_metrics=False)
    # grossly oversized payload -> loud error naming the usable capacity
    payload = rng.integers(0, 2, size=3 * img.size).astype(np.uint8)
    with pytest.raises(ValueError, match="usable capacity"):
        encode_array(img, payload, cfg)
    # opting into reference semantics restores the silent clamp
    res = encode_array(
        img, payload, cfg.with_overrides(allow_capacity_overflow=True)
    )
    assert res.meta.payload_bits == payload.size


def test_usable_capacity_is_exact_boundary(rng):
    """usable_capacity_bits is tight: that payload embeds and round-trips;
    one more bit is rejected."""
    img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    cfg = EncodeConfig(strategy="multi_plane", beta=0.99, compute_metrics=False)
    from codec_tcc_tpu.ops.decompose import decompose

    s = decompose(img, beta=0.99, nbits=8).s
    cap = usable_capacity_bits(s, img.size)
    payload = rng.integers(0, 2, size=cap).astype(np.uint8)
    res = encode_array(img, payload, cfg)
    dec = decode_container(res.container)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    with pytest.raises(ValueError, match="usable capacity"):
        encode_array(img, np.ones(cap + 1, dtype=np.uint8), cfg)


def test_pee_pass1_capacity_measured_on_modified_image(rng):
    """Finding 2: payloads near the two-pass capacity must either embed
    correctly (possibly at a higher T) or fail with ValueError — never the
    old AssertionError from measuring pass-1 capacity on the pristine image."""
    from codec_tcc_tpu.ops import pee as pee_ops

    img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    cap0 = int(pee_ops.capacity(img, 0, 2, 255))
    cap1 = int(pee_ops.capacity(img, 1, 2, 255))
    payload = rng.integers(0, 2, size=cap0 + cap1).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", pee_threshold=2, compute_metrics=False)
    try:
        res = encode_array(img, payload, cfg)
    except ValueError as exc:
        assert "capacity" in str(exc)
    else:
        dec = decode_container(res.container)
        np.testing.assert_array_equal(dec.payload_bits, payload)
        np.testing.assert_array_equal(dec.original, img)


def test_pee_threshold_selection_covers_max():
    """Finding 6 (round-3 form): threshold selection must be able to reach
    T=128 — a payload that only fits at the maximum threshold is not
    skipped, and an over-capacity payload yields None (callers then run one
    exact attempt at T=128 before raising CapacityError)."""
    import numpy as np

    from codec_tcc_tpu.models.pee import _MAX_T, select_threshold

    cap0 = np.arange(1, _MAX_T + 1) * 10
    cap1 = np.arange(1, _MAX_T + 1) * 10
    # fits exactly at the maximum threshold only
    assert select_threshold(cap0, cap1, int(cap0[-1] + cap1[-1]), 1) == _MAX_T
    # beyond any capacity -> None
    assert select_threshold(cap0, cap1, int(cap0[-1] + cap1[-1]) + 1, 1) is None
    # smallest fitting T, honoring the configured floor
    assert select_threshold(cap0, cap1, 20, 1) == 1
    assert select_threshold(cap0, cap1, 20, 5) == 5
    assert select_threshold(cap0, cap1, 130, 1) == 7


def test_v1_hybrid_container_roundtrips(torax_image):
    """Finding 3: v1 decode replays the hybrid start-offset walk."""
    cfg = EncodeConfig(strategy="hybrid", container_version=1, codec="png",
                      compute_metrics=False)
    res = encode_array(torax_image, "v1 hybrid payload", cfg)
    assert res.meta.start_offset > 0  # variance-chosen, non-zero on torax
    dec = decode_container(res.container)
    assert dec.message == "v1 hybrid payload"
    np.testing.assert_array_equal(dec.original, torax_image)


def test_v1_field_overflow_raises(pe_image, rng):
    """Finding 4: v1 packing must fail loudly beyond its 16-bit limits."""
    payload = rng.integers(0, 2, size=200_000).astype(np.uint8)
    cfg = EncodeConfig(strategy="multi_plane", beta=0.8, container_version=1,
                      codec="png", compute_metrics=False)
    with pytest.raises(ValueError, match="v1 container"):
        encode_array(pe_image, payload, cfg)


def test_v1_unrepresentable_codec_raises(torax_image):
    """Finding 5: v1 has no id for 'deflate' — packing must raise, not write
    an undecodable codec_id 0."""
    cfg = EncodeConfig(container_version=1, codec="deflate", compute_metrics=False)
    with pytest.raises(ValueError, match="v1"):
        encode_array(torax_image, "x", cfg)


def test_xor_maps_explicit_nbits(rng):
    """Finding 7: the documented nbits_planes parameter works under jit."""
    img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    stego = img ^ 1
    maps = np.asarray(embed_ops.xor_maps(img, stego, 4))
    assert maps.shape == (4, 32, 32)
    assert maps[0].all()


def test_pee_ext_single_format():
    """Finding 8: one PEE ext format, shared between container and model."""
    from codec_tcc_tpu.models.pee import _pack_ext, _parse_ext

    blob = container_io.pack_pee_ext(4, 2, 100, 200, 1000, 500)
    assert _pack_ext(4, 2, 100, 200, 1000, 500) == blob
    assert container_io.parse_pee_ext(blob) == (4, 2, 100, 200, 1000, 500)
    assert _parse_ext(blob) == (4, 2, 100, 200, 1000, 500)
