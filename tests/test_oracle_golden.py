"""Golden regression anchors: the NumPy oracle must reproduce every number
the survey verified by executing the reference (BASELINE.md / SURVEY.md §6)."""

import numpy as np
import pytest

from oracle import numpy_ref as oracle
from codec_tcc_tpu.utils import bits as bitutils


def test_entropy_golden(pe_image, torax_image):
    assert oracle.entropy(pe_image) == pytest.approx(8.4176, abs=5e-5)
    assert oracle.entropy(torax_image) == pytest.approx(6.4002, abs=5e-5)


@pytest.mark.parametrize(
    "img,beta,expected_s",
    [
        ("pe", 0.4, 4),
        ("pe", 0.8, 7),
        ("torax", 0.4, 3),
        ("torax", 0.8, 6),
    ],
)
def test_cut_points_golden(img, beta, expected_s, pe_image, torax_image):
    image = pe_image if img == "pe" else torax_image
    s, global_planes, local_planes = oracle.adaptive_decomposition(image, beta=beta)
    assert s == expected_s
    assert len(local_planes) == s
    assert len(global_planes) == image.dtype.itemsize * 8 - s


def test_mi_equals_plane_entropy(pe_image):
    """The structural insight the TPU path builds on: MI(plane, image) ==
    H(plane) exactly up to float summation noise, because the plane is a
    deterministic function of the pixel value."""
    planes = oracle.split_planes(pe_image, 16)
    for p in planes[:8]:
        mi = oracle.mutual_information(p, pe_image)
        h = oracle.entropy(p.astype(np.uint8))
        assert mi == pytest.approx(h, abs=1e-9)


def test_capacity_rule(pe_image, torax_image):
    s_pe, _, _ = oracle.adaptive_decomposition(pe_image, beta=0.4)
    s_tx, _, _ = oracle.adaptive_decomposition(torax_image, beta=0.4)
    assert s_pe * pe_image.size == 1_048_576
    assert s_tx * torax_image.size == 786_432


def test_hybrid_fidelity_golden(pe_image, torax_image):
    """304-bit payload, hybrid embed, beta=0.4: MSE/PSNR/pixels-changed anchors
    from BASELINE.md (measured by executing the reference this session)."""
    message = "Mensagem de teste para esteganografia!"
    msg_bits = bitutils.message_to_bits(message)
    assert msg_bits.size == 304

    for image, exp_mse, exp_psnr, exp_changed in [
        (pe_image, 0.00290, 83.8, 141),
        (torax_image, 0.00221, 74.7, 174),
    ]:
        s, global_planes, local_planes = oracle.adaptive_decomposition(image, beta=0.4)
        res = oracle.embed_hybrid(local_planes, msg_bits, search_block_size=16)
        stego = oracle.merge_planes(global_planes, res.stego_planes)
        assert stego.dtype == image.dtype
        # mse.py's *array* input branch uses each array's own max as its range
        # (src/mse.py:85-87,92-94), which is how BASELINE.md was measured
        m, max_range = oracle.mse(
            image, stego, float(image.max()), float(stego.max())
        )
        p = oracle.psnr(m, max_range)
        changed = int(np.sum(image != stego))
        assert m == pytest.approx(exp_mse, abs=2e-4)
        assert p == pytest.approx(exp_psnr, abs=0.3)
        assert changed == exp_changed


def test_roundtrip_all_strategies(pe_image, rng):
    """BASELINE.md: corrected extractor recovers the payload 100% exactly."""
    s, global_planes, local_planes = oracle.adaptive_decomposition(pe_image, beta=0.4)
    payload = rng.integers(0, 2, size=5000).astype(np.uint8)

    # strategy 1
    res = oracle.embed_multi_plane(local_planes, payload)
    stego = oracle.merge_planes(global_planes, res.stego_planes)
    planes = oracle.extract_local_planes(stego, s)
    got = oracle.extract_raster(planes, res.plan, res.plane_starts)
    np.testing.assert_array_equal(got, payload)

    # strategy 3 (hybrid), both alignment modes
    for align in (False, True):
        res = oracle.embed_hybrid(local_planes, payload, 16, align_across_planes=align)
        stego = oracle.merge_planes(global_planes, res.stego_planes)
        planes = oracle.extract_local_planes(stego, s)
        got = oracle.extract_raster(planes, res.plan, res.plane_starts)
        np.testing.assert_array_equal(got, payload)

    # strategy 2 (block adaptive, intended semantics)
    res = oracle.embed_block_adaptive(local_planes, payload, block_size=8)
    stego = oracle.merge_planes(global_planes, res.stego_planes)
    planes = oracle.extract_local_planes(stego, s)
    got = oracle.extract_block_adaptive(planes, res.bitmaps, res.plan, block_size=8)
    np.testing.assert_array_equal(got, payload)


def test_reversibility_restores_original(torax_image, rng):
    """Original image = stego ^ shifted XOR maps — exact reversibility."""
    s, global_planes, local_planes = oracle.adaptive_decomposition(torax_image, beta=0.8)
    payload = rng.integers(0, 2, size=40_000).astype(np.uint8)
    res = oracle.embed_hybrid(local_planes, payload, 8)
    stego = oracle.merge_planes(global_planes, res.stego_planes)
    restored = oracle.restore_original(stego, res.bitmaps, s)
    np.testing.assert_array_equal(restored, torax_image)


def test_segment_plan_reference_quirks():
    """Pin the reference's distribution accidents (SURVEY §7 'hard parts'):
    max(1,.) floor, excess correction, tiny-payload negative sizes."""
    plan = oracle.distribute_segments(4, 304)
    assert sum(plan.sizes) == 304
    # quadratic weights 16:9:4:1 over 304 bits -> floors (162,91,40,10),
    # excess -1 credited to the largest bucket
    assert plan.sizes == (163, 91, 40, 10)
    assert plan.indices == (2, 1, 3, 0)  # Mersenne-Twister seed-42 shuffle
    assert sorted(plan.indices) == [0, 1, 2, 3]
    # effective lengths cover the whole message exactly once
    assert sum(plan.eff_lengths) == 304

    tiny = oracle.distribute_segments(4, 2)
    assert sum(tiny.sizes) == 2  # one corrected bucket may be negative
    assert min(tiny.sizes) < 1


def test_merge_split_involution(rng):
    img = rng.integers(0, 837, size=(64, 64)).astype(np.uint16)
    planes = oracle.split_planes(img, 16)
    merged = oracle.merge_planes(planes[5:], planes[:5])
    np.testing.assert_array_equal(merged, img)
    img8 = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    planes8 = oracle.split_planes(img8, 8)
    merged8 = oracle.merge_planes(planes8[3:], planes8[:3])
    np.testing.assert_array_equal(merged8, img8)


def test_block_ranking_matches_npvar(rng):
    """The exact-rational ranking must order blocks identically to float64
    np.var wherever np.var distinguishes them (non-tie cases)."""
    plane = (rng.integers(0, 2, size=(64, 64))).astype(np.uint16)
    ranking = oracle.block_variance_ranking(plane, 8)
    grid = oracle.block_grid(64, 64, 8)
    scores = [
        float(np.var(plane[y : y + bh, x : x + bw])) for (y, x, bh, bw) in grid
    ]
    # np.var descending with stable raster tie-break
    ref_order = sorted(range(len(grid)), key=lambda i: (-scores[i], i))
    assert ranking == ref_order


def test_best_block_offset_strict_first_max(torax_image):
    planes = oracle.split_planes(torax_image, 8)
    off = oracle.best_block_offset(planes[0], 16)
    # must agree with a float64 np.var scan using strict > (reference rule)
    grid = oracle.block_grid(*planes[0].shape, 16)
    best, best_off = -1.0, 0
    w = planes[0].shape[1]
    for (y, x, bh, bw) in grid:
        sc = float(np.var(planes[0][y : y + bh, x : x + bw]))
        if sc > best:
            best, best_off = sc, y * w + x
    assert off == best_off
