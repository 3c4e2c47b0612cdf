"""PEE embedder tests: invertibility, capacity, overflow handling, fidelity
(the reference has no PEE despite its README claim — SURVEY §0 naming caution;
these tests define the scheme's contract from scratch)."""

import numpy as np
import pytest

from codec_tcc_tpu import EncodeConfig, decode_container, encode_array
from codec_tcc_tpu.ops import pee as pee_ops


def test_rhombus_predictor_edges():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    pred = np.asarray(pee_ops.rhombus_predict(img))
    # interior pixel (1,1): neighbors 1,9,4,6 -> floor(20/4)=5
    assert pred[1, 1] == 5
    # corner (0,0): replicated neighbors 0,4,0,1 -> floor(5/4)=1
    assert pred[0, 0] == 1


def test_capacity_monotone_in_t(pe_image):
    caps = [int(pee_ops.capacity(pe_image, 0, t, 4095)) for t in (1, 2, 4, 8)]
    assert caps == sorted(caps)
    assert caps[0] > 0


@pytest.mark.parametrize("which", ["pe", "torax"])
@pytest.mark.parametrize("nbits_payload", [0, 304, 26214])  # 26214 ~ 0.1 bpp
def test_pee_roundtrip(which, nbits_payload, pe_image, torax_image, rng):
    """Config[0] of BASELINE.json: PEE embed+extract at up to 0.1 bpp with
    bit-exact recovery — plus exact original-image restoration."""
    image = pe_image if which == "pe" else torax_image
    payload = rng.integers(0, 2, size=nbits_payload).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=True)
    res = encode_array(image, payload, cfg,
                       bits_stored=12 if which == "pe" else 8)
    dec = decode_container(res.container)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    # reversibility: PEE restores the original exactly
    np.testing.assert_array_equal(dec.original, image)
    if nbits_payload:
        assert res.metrics["psnr"] > 30  # distortion bounded


def test_pee_quality_scales_with_payload(torax_image, rng):
    """The processed-prefix boundary keeps distortion proportional to the
    payload — a tiny payload must not expand the whole image."""
    small = rng.integers(0, 2, size=64).astype(np.uint8)
    big = rng.integers(0, 2, size=50_000).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", compute_metrics=True)
    r_small = encode_array(torax_image, small, cfg)
    r_big = encode_array(torax_image, big, cfg)
    assert r_small.metrics["changed_pixels"] < r_big.metrics["changed_pixels"]
    assert r_small.metrics["psnr"] > r_big.metrics["psnr"]
    assert r_small.metrics["changed_pixels"] < 5 * 64  # prefix, not full pass


def test_pee_overflow_pixels_survive(rng):
    """Saturated pixels (0 / max) are overflow candidates; they must pass
    through unmodified and still round-trip."""
    img = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    img[::3, ::3] = 255
    img[1::3, 1::3] = 0
    payload = rng.integers(0, 2, size=500).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", compute_metrics=False)
    res = encode_array(img, payload, cfg)
    dec = decode_container(res.container)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    np.testing.assert_array_equal(dec.original, img)


def test_pee_capacity_error():
    img = np.zeros((16, 16), dtype=np.uint8)  # constant image: tiny capacity
    payload = np.ones(10_000, dtype=np.uint8)
    with pytest.raises(ValueError, match="capacity"):
        encode_array(img, payload, EncodeConfig(strategy="pee"))


def test_pee_multipass_16bit_max_capacity(pe_image, rng):
    """Config[2] analog: 16-bit image near max PEE capacity with overflow
    location map handling, both passes active."""
    cap0 = int(pee_ops.capacity(pe_image, 0, 2, 4095))
    cap1 = int(pee_ops.capacity(pe_image, 1, 2, 4095))
    payload = rng.integers(0, 2, size=cap0 + cap1 // 2).astype(np.uint8)
    cfg = EncodeConfig(strategy="pee", pee_threshold=2, compute_metrics=False)
    res = encode_array(pe_image, payload, cfg, bits_stored=12)
    dec = decode_container(res.container)
    np.testing.assert_array_equal(dec.payload_bits, payload)
    np.testing.assert_array_equal(dec.original, pe_image)


def test_error_histogram_matches_capacity(torax_image):
    """The cumulative central bins of the prediction-error histogram equal
    the expandable pixel count (capacity modulo overflow exclusions)."""
    hist = np.asarray(pee_ops.error_histogram(torax_image, 0, t_max=64))
    assert hist.sum() > 0
    # reference check against a dense recomputation
    pred = np.asarray(pee_ops.rhombus_predict(torax_image))
    e = torax_image.astype(np.int64) - pred
    mask = np.asarray(pee_ops.parity_mask(*torax_image.shape, 0))
    e_in = np.clip(e[mask], -64, 64)
    ref = np.bincount(e_in + 64, minlength=129)
    np.testing.assert_array_equal(hist, ref)
    # expandable count at T: central bins [-T, T) == capacity + overflow
    for t in (1, 2, 4):
        central = hist[64 - t : 64 + t].sum()
        cap = int(pee_ops.capacity(torax_image, 0, t, 255))
        assert cap <= central  # capacity excludes overflow pixels
        # overflow exclusions (saturated regions of torax.dcm) stay a small
        # fraction of the expandable population
        assert central - cap < 0.05 * central


def test_capacity_histogram_exact_at_every_threshold(rng):
    """capacities_by_threshold(capacity_histogram(img)) == capacity(img, T)
    for ALL T — the exactness claim the histogram-driven threshold
    selection rests on (review finding: an off-by-one here would silently
    inflate every image's T or add escalation embeds without failing any
    round-trip test)."""
    cases = [
        (rng.integers(0, 900, size=(64, 64)).astype(np.uint16), 4095),
        (rng.integers(0, 256, size=(50, 100)).astype(np.uint8), 255),
    ]
    # saturated regions exercise the expansion-overflow exclusion
    cases[0][0][:8] = 4090
    cases[1][0][-5:] = 254
    for img, max_val in cases:
        for parity in (0, 1):
            hist = pee_ops.capacity_histogram(img, parity, 128, max_val)
            caps = pee_ops.capacities_by_threshold(np.asarray(hist))
            for t in range(1, 129):
                exact = int(pee_ops.capacity(img, parity, t, max_val))
                assert caps[t - 1] == exact, (parity, t, caps[t - 1], exact)
