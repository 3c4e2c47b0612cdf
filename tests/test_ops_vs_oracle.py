"""Bit-exactness property tests: device kernels vs the NumPy oracle
(SURVEY §4 test strategy item 2 — TPU-vs-NumPy per kernel, uint8 & uint16,
random payloads/sizes including 0-bit and capacity edges)."""

import numpy as np
import pytest

from oracle import numpy_ref as oracle
from kernel_helpers import extract_full_device
from codec_tcc_tpu.ops import (
    bitplanes,
    blocks,
    decompose,
    embed as embed_ops,
    histogram as hist_ops,
    metrics as metric_ops,
    segments,
)


# ---------------------------------------------------------------------------
# bit planes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype,nbits", [(np.uint8, 8), (np.uint16, 16)])
def test_split_merge_device(rng, dtype, nbits):
    img = rng.integers(0, np.iinfo(dtype).max + 1, size=(64, 128)).astype(dtype)
    planes = np.asarray(bitplanes.split_planes(img, nbits))
    ref = np.stack(oracle.split_planes(img, nbits)).astype(np.uint8)
    np.testing.assert_array_equal(planes, ref)
    merged = np.asarray(bitplanes.merge_planes(planes, nbits))
    np.testing.assert_array_equal(merged, img)


def test_merge_local_global(rng):
    img = rng.integers(0, 837, size=(32, 32)).astype(np.uint16)
    s = 5
    new_locals = rng.integers(0, 2, size=(16, 32, 32)).astype(np.uint8)
    got = np.asarray(bitplanes.merge_local_global(img, new_locals, np.int32(s)))
    ref = oracle.merge_planes(
        oracle.split_planes(img, 16)[s:], [new_locals[i].astype(np.uint16) for i in range(s)]
    )
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# histogram / decomposition
# ---------------------------------------------------------------------------


def test_histogram_exact(rng):
    img = rng.integers(0, 837, size=(128, 128)).astype(np.uint16)
    h = np.asarray(hist_ops.value_histogram(img, 65536))
    ref = np.bincount(img.ravel(), minlength=65536)
    np.testing.assert_array_equal(h, ref)
    assert h.sum() == img.size


@pytest.mark.parametrize(
    "which,beta", [("pe", 0.4), ("pe", 0.8), ("torax", 0.4), ("torax", 0.8)]
)
def test_decompose_matches_oracle_bitexact(which, beta, pe_image, torax_image):
    img = pe_image if which == "pe" else torax_image
    res = decompose.decompose(img, beta=beta)
    s_ref, _, _ = oracle.adaptive_decomposition(img, beta=beta)
    assert res.s == s_ref
    # entropy must replay the reference float64 result exactly
    assert res.entropy == oracle.entropy(img)
    # per-plane MI must equal the reference formula exactly (same operands,
    # same summation order)
    planes = oracle.split_planes(img, res.nbits)
    for i in range(res.nbits):
        assert res.mi[i] == oracle.mutual_information(planes[i], img), i


def test_decompose_random_images(rng):
    for dtype, hi in [(np.uint8, 256), (np.uint16, 4096)]:
        for _ in range(3):
            img = rng.integers(0, hi, size=(32, 32)).astype(dtype)
            for beta in (0.3, 0.6, 0.9):
                res = decompose.decompose(img, beta=beta)
                s_ref, _, _ = oracle.adaptive_decomposition(img, beta=beta)
                assert res.s == s_ref


def test_decompose_lazy_scan_matches_full(rng, pe_image):
    """full_curve=False (the batch planners' early-exit MI scan, matching the
    reference's codec.py:580-593 loop) must agree with the full scan on
    s/entropy/target and on every MI entry up to the cut point, with entries
    past the stop left at 0."""
    cases = [pe_image] + [
        rng.integers(0, hi, size=(32, 32)).astype(dtype)
        for dtype, hi in [(np.uint8, 256), (np.uint16, 4096)]
    ]
    for img in cases:
        for beta in (0.3, 0.6, 0.9):
            full = decompose.decompose(img, beta=beta)
            lazy = decompose.decompose(img, beta=beta, full_curve=False)
            assert lazy.s == full.s
            assert lazy.entropy == full.entropy
            assert lazy.target == full.target
            np.testing.assert_array_equal(lazy.mi[: lazy.s], full.mi[: full.s])
            if full.cumulative[full.s - 1] >= full.target:
                # cut point found -> scan stopped there, rest untouched
                assert (lazy.mi[lazy.s :] == 0).all()
            else:
                # target never met (reference default s=1): both scans ran
                # the full curve
                np.testing.assert_array_equal(lazy.mi, full.mi)
            np.testing.assert_array_equal(
                lazy.cumulative[: lazy.s], full.cumulative[: full.s]
            )


def test_decompose_constant_image():
    img = np.full((16, 16), 7, dtype=np.uint8)
    res = decompose.decompose(img, beta=0.5)
    s_ref, _, _ = oracle.adaptive_decomposition(img, beta=0.5)
    assert res.s == s_ref == 1  # reference default s=1 when target never met...
    # (H==0 -> target 0.0 -> first plane reaches it immediately)


# ---------------------------------------------------------------------------
# segment plans
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s,total", [(4, 304), (7, 5000), (3, 1), (4, 2), (6, 0), (1, 100), (8, 65536)])
def test_segment_plan_matches_oracle(s, total):
    got = segments.distribute_segments(s, total)
    ref = oracle.distribute_segments(s, total)
    assert got.sizes == ref.sizes
    assert got.indices == ref.indices
    assert got.msg_offsets == ref.msg_offsets
    assert got.eff_lengths == ref.eff_lengths


# ---------------------------------------------------------------------------
# embed / extract — raster strategies
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype,nbits", [(np.uint8, 8), (np.uint16, 16)])
@pytest.mark.parametrize("payload_bits", [0, 1, 304, 5000])
def test_embed_multi_plane_matches_oracle(rng, dtype, nbits, payload_bits):
    img = rng.integers(0, np.iinfo(dtype).max + 1, size=(32, 64)).astype(dtype)
    s = 4
    payload = rng.integers(0, 2, size=payload_bits).astype(np.uint8)

    plan = segments.distribute_segments(s, payload_bits)
    pp = segments.raster_plane_plan(plan, img.size, nbits, 0, True)
    msg_pad = embed_ops.pad_message(payload, img.size, int(pp.offsets.max(initial=0)))
    stego = np.asarray(
        embed_ops.embed(img, msg_pad, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits)
    )

    local = oracle.split_planes(img, nbits)[:s]
    res = oracle.embed_multi_plane(local, payload)
    ref = oracle.merge_planes(oracle.split_planes(img, nbits)[s:], res.stego_planes)
    np.testing.assert_array_equal(stego, ref.astype(dtype))

    # extraction round-trip: bits beyond per-plane capacity are silently
    # dropped by the reference rule num_bits = min(len(segment), h*w)
    # (src/codec.py:294) — the oracle extractor is the contract
    out = np.asarray(
        extract_full_device(
            stego, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits,
            max(payload_bits, 1),
        )
    )[:payload_bits]
    expected = oracle.extract_raster(
        oracle.extract_local_planes(stego.astype(dtype), s), res.plan, res.plane_starts
    )
    np.testing.assert_array_equal(out, expected)
    if all(l <= img.size for l in plan.eff_lengths):
        np.testing.assert_array_equal(out, payload)


@pytest.mark.parametrize("align", [False, True])
def test_embed_hybrid_matches_oracle(rng, align, torax_image):
    img = torax_image
    nbits, s = 8, 3
    payload = rng.integers(0, 2, size=10_000).astype(np.uint8)

    local = oracle.split_planes(img, nbits)[:s]
    ref_res = oracle.embed_hybrid(local, payload, 16, align_across_planes=align)
    ref = oracle.merge_planes(oracle.split_planes(img, nbits)[s:], ref_res.stego_planes)

    # device path: block counts -> exact host offset -> plane plan -> kernel
    counts = np.asarray(blocks.block_bit_counts(img, 0, 16))
    start = blocks.best_offset_from_counts(counts, *img.shape, 16)
    assert start == ref_res.base_start_offset

    plan = segments.distribute_segments(s, payload.size)
    pp = segments.raster_plane_plan(plan, img.size, nbits, start, align)
    np.testing.assert_array_equal(pp.starts[:s], np.array(ref_res.plane_starts))
    msg_pad = embed_ops.pad_message(payload, img.size, int(pp.offsets.max(initial=0)))
    stego = np.asarray(
        embed_ops.embed(img, msg_pad, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits)
    )
    np.testing.assert_array_equal(stego, ref)

    out = np.asarray(
        extract_full_device(stego, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits, payload.size)
    )
    np.testing.assert_array_equal(out, payload)


def test_embed_capacity_edge(rng):
    """Payload filling every pixel of every local plane exactly."""
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    s, nbits = 3, 8
    payload = rng.integers(0, 2, size=s * img.size).astype(np.uint8)
    plan = segments.distribute_segments(s, payload.size)
    pp = segments.raster_plane_plan(plan, img.size, nbits, 0, True)
    msg_pad = embed_ops.pad_message(payload, img.size, int(pp.offsets.max(initial=0)))
    stego = np.asarray(
        embed_ops.embed(img, msg_pad, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits)
    )
    local = oracle.split_planes(img, nbits)[:s]
    res = oracle.embed_multi_plane(local, payload)
    ref = oracle.merge_planes(oracle.split_planes(img, nbits)[s:], res.stego_planes)
    np.testing.assert_array_equal(stego, ref)
    # NOTE: even at exact capacity s*H*W the quadratic distribution
    # oversubscribes plane 0 (share 9/14 > 1/3), so the reference's per-plane
    # clamp (src/codec.py:294) drops bits — extraction must match the oracle,
    # not the raw payload
    out = np.asarray(
        extract_full_device(stego, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits, payload.size)
    )
    expected = oracle.extract_raster(
        oracle.extract_local_planes(stego.astype(np.uint8), s), res.plan, res.plane_starts
    )
    np.testing.assert_array_equal(out, expected)


# ---------------------------------------------------------------------------
# embed / extract — block-adaptive strategy
# ---------------------------------------------------------------------------


def test_block_ranking_device_matches_oracle(rng):
    plane_img = rng.integers(0, 256, size=(48, 80)).astype(np.uint8)
    counts = np.asarray(blocks.block_bit_counts(plane_img, 0, 16))
    got = blocks.ranking_from_counts(counts, 48, 80, 16)
    ref = oracle.block_variance_ranking((plane_img & 1).astype(np.uint8), 16)
    assert got == ref


def test_embed_block_adaptive_matches_oracle(rng, torax_image):
    img = torax_image[:64, :64].copy()
    nbits, s, block = 8, 3, 8
    payload = rng.integers(0, 2, size=4000).astype(np.uint8)

    local = oracle.split_planes(img, nbits)[:s]
    ref_res = oracle.embed_block_adaptive(local, payload, block_size=block)
    ref = oracle.merge_planes(oracle.split_planes(img, nbits)[s:], ref_res.stego_planes)

    plan = segments.distribute_segments(s, payload.size)
    pp = segments.raster_plane_plan(plan, img.size, nbits, 0, True)
    ntiles = (-(-img.shape[0] // block)) * (-(-img.shape[1] // block))
    base = np.zeros((nbits, ntiles), dtype=np.int32)
    for p in range(s):
        counts = np.asarray(blocks.block_bit_counts(img, p, block))
        b, _ = blocks.block_base_offsets(counts, *img.shape, block)
        base[p] = b
    msg_pad = embed_ops.pad_message(payload, img.size, int(pp.offsets.max(initial=0)))
    stego = np.asarray(
        embed_ops.embed_block_adaptive(
            img, msg_pad, base, pp.lengths, pp.offsets, np.int32(s), nbits, block
        )
    )
    np.testing.assert_array_equal(stego, ref)

    aligned = embed_ops.extract_block_aligned(
        stego, base, pp.lengths, np.int32(s), nbits, block
    )
    out = embed_ops.assemble_message(aligned, pp.offsets, pp.lengths, payload.size)
    np.testing.assert_array_equal(out, payload)


# ---------------------------------------------------------------------------
# XOR maps / reversibility
# ---------------------------------------------------------------------------


def test_xor_maps_and_restore(rng):
    img = rng.integers(0, 837, size=(32, 32)).astype(np.uint16)
    s, nbits = 4, 16
    payload = rng.integers(0, 2, size=3000).astype(np.uint8)
    plan = segments.distribute_segments(s, payload.size)
    pp = segments.raster_plane_plan(plan, img.size, nbits, 100, False)
    msg_pad = embed_ops.pad_message(payload, img.size, int(pp.offsets.max(initial=0)))
    stego = np.asarray(
        embed_ops.embed(img, msg_pad, pp.starts, pp.lengths, pp.offsets, np.int32(s), nbits)
    )
    maps = np.asarray(embed_ops.xor_maps(img, stego))
    assert maps.shape == (16, 32, 32)
    assert maps[s:].sum() == 0  # only local planes may differ
    restored = np.asarray(embed_ops.restore_original(stego, maps, np.int32(s)))
    np.testing.assert_array_equal(restored, img)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_fused_metrics_match_oracle(pe_image, rng):
    """Range-normalized branch (max 836 vs 837 here) routes through exact
    float64 host math — must match the oracle formulas exactly."""
    from codec_tcc_tpu.pipeline import analyze_pair

    local_rng = np.random.default_rng(7)  # independent of the shared fixture
    stego = pe_image.copy()
    flip = local_rng.integers(0, 2, size=pe_image.shape).astype(np.uint16)
    stego ^= flip  # flip ~half the LSBs
    stego.ravel()[int(np.argmax(pe_image))] = pe_image.max() + 1  # force range split
    assert float(stego.max()) != float(pe_image.max())
    rep = analyze_pair(pe_image, stego)
    m_ref, max_range = oracle.mse(
        pe_image, stego, float(pe_image.max()), float(stego.max())
    )
    assert rep["mse"] == pytest.approx(m_ref, rel=1e-12)
    assert rep["psnr"] == pytest.approx(oracle.psnr(m_ref, max_range), rel=1e-12)
    ssim_ref = oracle.ssim_global(
        pe_image, stego, float(pe_image.max()), float(stego.max())
    )
    assert rep["ssim"] == pytest.approx(ssim_ref, rel=1e-12)
    assert rep["changed_pixels"] == float(np.sum(pe_image != stego))


def test_fused_metrics_equal_range_exact(pe_image, rng):
    """Equal-range pairs use the cancellation-free direct squared-diff sum."""
    stego = pe_image.copy()
    idx = rng.integers(0, pe_image.size, size=500)
    stego.ravel()[idx] ^= 1
    stego[0, 0] = pe_image.max()  # pin equal maxima
    rep = metric_ops.quality_report(metric_ops.pair_stats(pe_image, stego))
    m_ref, max_range = oracle.mse(
        pe_image, stego, float(pe_image.max()), float(stego.max())
    )
    assert rep["mse"] == pytest.approx(m_ref, rel=1e-6)
    assert rep["psnr"] == pytest.approx(oracle.psnr(m_ref, max_range), rel=1e-6)


def test_windowed_ssim_bounds(pe_image):
    v = float(metric_ops.ssim_windowed(pe_image, pe_image, 4095.0))
    assert v == pytest.approx(1.0, abs=1e-5)


def test_assemble_message_device_matches_host(rng):
    """Device assembly == host assembly over random plans, including the
    clamping edges the host loop guards (off + len > out_len, off >= out_len,
    zero-length planes)."""
    from codec_tcc_tpu.ops import embed as embed_ops

    p, n, out_len = 6, 512, 1024
    for trial in range(20):
        aligned = np.zeros((p, n), dtype=np.uint8)
        offs = np.zeros(p, dtype=np.int32)
        lens = np.zeros(p, dtype=np.int32)
        for i in range(p):
            ln = int(rng.integers(0, n + 1))
            lens[i] = ln
            aligned[i, :ln] = rng.integers(0, 2, size=ln)
            # plans are disjoint in practice; exercise the guards anyway by
            # spacing offsets widely, sometimes past out_len
            offs[i] = int(rng.integers(0, out_len + 200))
        if trial % 2 == 0:
            # disjoint windows (the real-plan case)
            order = np.argsort(offs)
            acc = 0
            for i in order:
                offs[i] = max(offs[i], acc)
                acc = offs[i] + lens[i]
        # odd trials keep raw (possibly OVERLAPPING) offsets: the reference's
        # negative-size plan accident aliases planes; later planes must win
        host = embed_ops.assemble_message(aligned, offs, lens, out_len)
        dev = np.asarray(
            embed_ops.assemble_message_device(aligned, offs, lens, out_len)
        )
        np.testing.assert_array_equal(dev, host, err_msg=f"trial {trial}")


def test_assemble_raster_device_matches_host(rng):
    """Raster-order device assembly == the host memcpy version (wrapping
    windows included)."""
    from codec_tcc_tpu.ops import embed as embed_ops
    from codec_tcc_tpu.ops import pallas_embed as pe

    p, n, out_len = 4, 768, 2048
    rows = np.zeros((p, n), dtype=np.uint8)
    starts = np.zeros(p, dtype=np.int32)
    offs = np.zeros(p, dtype=np.int32)
    lens = np.zeros(p, dtype=np.int32)
    acc = 0
    for i in range(p):
        ln = int(rng.integers(1, n + 1))
        st = int(rng.integers(0, n))
        idx = (st + np.arange(ln)) % n
        bits = rng.integers(0, 2, size=ln).astype(np.uint8)
        rows[i, idx] = bits
        starts[i], lens[i], offs[i] = st, ln, acc
        acc += ln
    host = pe.assemble_raster(rows, starts, lens, offs, out_len)
    dev = np.asarray(
        embed_ops.assemble_raster_device(rows, starts, offs, lens, out_len)
    )
    np.testing.assert_array_equal(dev, host)


def test_preplace_bits_device_matches_host(rng):
    from codec_tcc_tpu.ops import pallas_embed as pe

    b, npl, n, lpad = 3, 4, 1024, 2048
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    starts = rng.integers(0, n, size=(b, npl)).astype(np.int32)
    lens = rng.integers(0, n + 1, size=(b, npl)).astype(np.int32)
    offs = rng.integers(0, lpad - n, size=(b, npl)).astype(np.int32)
    host = pe.preplace_bits(msgs, starts, lens, offs, n)
    dev = np.asarray(
        pe.preplace_bits_device(msgs, starts, lens, offs, n, npl)
    )
    np.testing.assert_array_equal(dev, host)
