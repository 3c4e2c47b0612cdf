"""Quality analyzer (mse.py L6 parity) and embedder model facade tests."""

import json
import numpy as np
import pytest

from oracle import numpy_ref as oracle
from codec_tcc_tpu.analyze import QualityAnalyzer, load_image
from codec_tcc_tpu.models import get_embedder, HybridEmbedder, PeeEmbedder


# ---------------------------------------------------------------------------
# analyzer
# ---------------------------------------------------------------------------


def test_load_image_dicom_bits_stored():
    arr, max_v, bits = load_image("/root/reference/images/pe.dcm")
    assert arr.shape == (512, 512) and arr.dtype == np.uint16
    assert bits == 12 and max_v == 4095.0  # (1<<BitsStored)-1, mse.py:32-33


def test_load_image_png_16bit(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 65536, size=(32, 32)).astype(np.uint16)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    arr, max_v, bits = load_image(str(p))
    np.testing.assert_array_equal(arr, img)
    assert (max_v, bits) == (65535.0, 16)


def test_load_image_array_bits_from_dtype(rng):
    """round-3 VERDICT weak #4: a uint16 array with max <= 255 must report
    16-bit, not guess 8-bit from the data max; explicit bits override wins."""
    lowmax = rng.integers(0, 200, size=(16, 16)).astype(np.uint16)
    arr, max_v, bits = load_image(lowmax)
    assert bits == 16 and max_v == float(lowmax.max())
    arr, _, bits = load_image(lowmax.astype(np.uint8))
    assert bits == 8
    # explicit override (e.g. a 12-bit modality carried in uint16)
    _, _, bits = load_image(lowmax, bits=12)
    assert bits == 12
    # empty arrays don't crash on .max()
    _, max_v, bits = load_image(np.zeros((0,), np.uint16))
    assert (max_v, bits) == (0.0, 16)


def test_analyzer_pair_matches_oracle(pe_image, rng):
    stego = pe_image.copy()
    idx = rng.integers(0, pe_image.size, size=300)
    stego.ravel()[idx] ^= 1

    a = QualityAnalyzer()
    res = a.analyze_pair(pe_image, stego, "test")
    m_ref, max_range = oracle.mse(
        pe_image, stego, float(pe_image.max()), float(stego.max())
    )
    assert res.metrics["mse"] == pytest.approx(m_ref, rel=1e-9)
    assert res.metrics["psnr"] == pytest.approx(oracle.psnr(m_ref, max_range), rel=1e-9)
    assert res.verdict_quality.startswith("excellent")
    assert res.verdict_structure.startswith("structure very well")


def test_analyzer_file_pair_uses_bits_stored(tmp_path, pe_image):
    """File-path pairs use the BitsStored-derived range like the reference's
    DICOM branch (max 4095 for pe.dcm) rather than the data max."""
    from codec_tcc_tpu.io import dicom

    stego = pe_image.copy()
    stego[0, 0] ^= 1
    p = tmp_path / "stego.dcm"
    dicom.save_image(stego, str(p), bits_stored=12)
    a = QualityAnalyzer()
    res = a.analyze_pair("/root/reference/images/pe.dcm", str(p), "files")
    assert res.metrics["max_value"] == 4095.0
    expected_psnr = oracle.psnr(1.0 / pe_image.size, 4095.0)
    assert res.metrics["psnr"] == pytest.approx(expected_psnr, rel=1e-6)


def test_analyzer_batch_and_report(tmp_path, torax_image, rng):
    a = QualityAnalyzer(windowed_ssim=True)
    for i in range(3):
        stego = torax_image.copy()
        stego.ravel()[rng.integers(0, stego.size, size=50 * (i + 1))] ^= 1
        a.analyze_pair(torax_image, stego, f"pair{i}")
    s = a.summary()
    assert s["count"] == 3
    assert s["psnr_min"] <= s["psnr_mean"] <= s["psnr_max"]
    path = tmp_path / "report.json"
    rep = a.report(str(path))
    assert len(rep["pairs"]) == 3
    assert all("ssim_windowed" in p for p in rep["pairs"])
    on_disk = json.loads(path.read_text())
    assert on_disk["summary"]["count"] == 3


def test_analyzer_shape_mismatch(torax_image):
    with pytest.raises(ValueError, match="Shape"):
        QualityAnalyzer().analyze_pair(torax_image, torax_image[:100, :100])


def test_analyzer_missing_files_skipped(torax_image, tmp_path):
    a = QualityAnalyzer()
    out = a.analyze_pairs([("/nope/a.dcm", "/nope/b.dcm", "missing")])
    assert out == []


# ---------------------------------------------------------------------------
# embedder models
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("strategy", ["multi_plane", "block_adaptive", "hybrid", "pee"])
def test_model_roundtrip(strategy, torax_image):
    model = get_embedder(strategy, compute_metrics=False)
    res = model.encode(torax_image, "model facade payload", bits_stored=8)
    dec = model.decode(res.container)
    assert dec.message == "model facade payload"
    np.testing.assert_array_equal(dec.original, torax_image)


def test_model_capacity(pe_image):
    from codec_tcc_tpu.ops.segments import usable_capacity_bits

    cap = HybridEmbedder(beta=0.4).capacity_bits(pe_image, bits_stored=12)
    # the *usable* capacity at s=4 (BASELINE.md's s*H*W rule over-promises:
    # the quadratic distribution clamps plane 0 first)
    assert cap == usable_capacity_bits(4, pe_image.size)
    assert 0 < cap < 4 * pe_image.size
    pee_cap = PeeEmbedder().capacity_bits(pe_image, bits_stored=12)
    assert 0 < pee_cap < 2 * pe_image.size


def test_model_unknown_strategy():
    with pytest.raises(ValueError, match="Unknown strategy"):
        get_embedder("nope")


def test_profiler_stages(torax_image):
    from codec_tcc_tpu.profiling import get_profiler

    model = get_embedder("hybrid", compute_metrics=False)
    model.encode(torax_image, "profiled", bits_stored=8)
    rep = get_profiler().report()
    assert "embed" in rep and "decompose" in rep and "transport_codec" in rep
    assert rep["embed"]["calls"] >= 1
