"""Regression tests for the round-2 verdict contracts and advisor findings.

1. ``encode_volume`` rejects strategies it does not implement (verdict
   weakness #6) and implements 'hybrid' with per-slice variance offsets;
2. STGV v2 header records the volume strategy (verdict next-round #5);
3. ``CapacityError`` distinguishes capacity exhaustion from other
   ``ValueError``s; the volume PEE escalation loop no longer swallows
   unrelated validation failures (advisor round-2 #2);
4. ``PeeEmbedder.capacity_bits`` is achievable — it accounts for the
   pass-0/pass-1 interaction via the probe protocol (verdict weakness #5);
5. PEE batch delegation honors ``compute_metrics`` (advisor round-2 #1).
"""

import numpy as np
import pytest

from codec_tcc_tpu import CapacityError
from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.models import get_embedder
from codec_tcc_tpu.parallel import batch as batch_par
from codec_tcc_tpu.parallel import volume as volume_par


def _smooth_volume(rng, d=2, h=32, w=32, lo=100, hi=800):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (400 + 300 * np.sin(yy / 7.0) * np.cos(xx / 9.0)).astype(np.int64)
    vol = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(lo, hi)
        for _ in range(d)
    ])
    return vol.astype(np.uint16)


def test_encode_volume_rejects_unimplemented_strategy(rng):
    """The volume API guard (round-2 verdict weakness #6): an unknown
    strategy raises instead of silently getting other semantics. All four
    named strategies are implemented for volumes as of round 3
    (block_adaptive joined last), so only a bogus name can trip it now."""
    vol = rng.integers(0, 4096, size=(2, 32, 32)).astype(np.uint16)
    with pytest.raises(ValueError, match="rot13"):
        volume_par.encode_volume(
            vol, b"x", EncodeConfig(strategy="rot13")
        )


def test_encode_volume_hybrid_roundtrip(rng):
    """Hybrid volumes use real per-slice variance offsets and round-trip."""
    vol = rng.integers(0, 4096, size=(3, 32, 32)).astype(np.uint16)
    payload = rng.integers(0, 2, size=600).astype(np.uint8)
    cfg = EncodeConfig(strategy="hybrid", codec="deflate",
                       compute_metrics=False)
    res = volume_par.encode_volume(vol, payload, cfg)
    blob = volume_par.pack_volume(vol, res, cfg)
    bits, stego, original = volume_par.unpack_volume(blob)
    assert (bits == payload).all()
    assert (stego == res.stego).all()
    assert (original == vol).all()
    # the per-slice containers record the hybrid strategy and its offsets
    from codec_tcc_tpu.io import container as container_io

    off = 4 + 21 + 8 * 3  # magic + v2 header(IIQIB = 21 B) + 3 slice sizes
    c0 = container_io.parse(blob[off:])
    assert c0.meta.strategy == "hybrid"
    assert res.plan.base_offsets is not None


def test_stgv_v2_header_strategy_and_v1_compat(rng):
    import struct

    vol = rng.integers(0, 4096, size=(2, 32, 32)).astype(np.uint16)
    payload = rng.integers(0, 2, size=100).astype(np.uint8)
    cfg = EncodeConfig(strategy="multi_plane", codec="deflate",
                       compute_metrics=False)
    res = volume_par.encode_volume(vol, payload, cfg)
    blob = volume_par.pack_volume(vol, res, cfg)
    version, d, total_bits, s = struct.unpack_from(">IIQI", blob, 4)
    assert version == 2 and d == 2 and total_bits == 100
    (strat_id,) = struct.unpack_from(">B", blob, 4 + struct.calcsize(">IIQI"))
    from codec_tcc_tpu.io.container import STRATEGY_NAMES

    assert STRATEGY_NAMES[strat_id] == "multi_plane"

    # a v1-layout header (round-2 files) still parses
    hdr = volume_par.VOLUME_MAGIC + struct.pack(">IIQI", 1, d, total_bits, s)
    sizes_off = len(hdr)
    body = blob[4 + struct.calcsize(">IIQIB"):]
    v1_blob = hdr + body
    bits_v1, _, _ = volume_par.unpack_volume(v1_blob)
    assert (bits_v1 == payload).all()
    assert sizes_off > 0

    # unknown strategy id in a v2 header is rejected loudly
    bad = volume_par.VOLUME_MAGIC + struct.pack(
        ">IIQIB", 2, d, total_bits, s, 250
    ) + body
    with pytest.raises(ValueError, match="strategy id"):
        volume_par.unpack_volume(bad)


def test_capacity_error_type_and_propagation(rng):
    """Capacity exhaustion raises CapacityError (a ValueError subclass);
    non-capacity errors propagate out of the volume PEE loop immediately."""
    vol = _smooth_volume(rng)
    huge = np.ones(2 * 32 * 32 * 2, dtype=np.uint8)  # > 2 passes' capacity
    with pytest.raises(CapacityError):
        volume_par.encode_volume(
            vol, huge, EncodeConfig(strategy="pee", compute_metrics=False)
        )
    # a bad codec is a plain ValueError and must NOT be retried/swallowed
    with pytest.raises(ValueError, match="not supported") as ei:
        volume_par.encode_volume(
            vol, np.ones(50, np.uint8),
            EncodeConfig(strategy="pee", codec="nope", compute_metrics=False),
        )
    assert not isinstance(ei.value, CapacityError)


def test_pee_capacity_bits_achievable(rng):
    """The advertised capacity accounts for pass interaction: encoding a
    payload of exactly capacity_bits succeeds (round-2 verdict weakness #5
    showed the old pristine-image sum overestimates)."""
    img = _smooth_volume(rng, d=1)[0]
    emb = get_embedder("pee", pee_threshold=2, compute_metrics=False,
                       codec="deflate")
    cap = emb.capacity_bits(img)
    assert cap > 0
    payload = rng.integers(0, 2, size=cap).astype(np.uint8)
    res = emb.encode(img, payload)
    dec = emb.decode(res.container)
    assert (dec.payload_bits[:cap] == payload).all()
    assert (dec.original == img).all()


def test_pee_batch_metrics_delegation(rng):
    imgs = np.stack([_smooth_volume(rng, d=1)[0] for _ in range(2)])
    payloads = [rng.integers(0, 2, size=64).astype(np.uint8) for _ in range(2)]
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=True)
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    assert res.metrics is not None and len(res.metrics) == 2
    for m in res.metrics:
        assert "psnr" in m and "mse" in m


# 6. The serving paths' host-side bit-plane recombination runs through one
#    cached LUT gather per plane (utils.bits.packed_planes_to_diff) — the
#    unpackbits + shift/OR form it replaced was the single largest host
#    cost of the batch serving path (round-3 bench batch_unpack stage).


def test_packed_planes_to_diff_matches_unpackbits(rng):
    from codec_tcc_tpu.utils.bits import packed_planes_to_diff

    # every s exercises the round-4 pair-LUT split (two planes per gather
    # plus an odd single-plane tail) for both dtypes
    cases = [(np.uint8, s) for s in range(1, 9)]
    cases += [(np.uint16, s) for s in range(1, 17)]
    for dtype, s in cases:
        b, n = 3, 512
        packed = rng.integers(0, 256, size=(b, s, n // 8), dtype=np.uint8)
        got = packed_planes_to_diff(packed, dtype)
        maps = np.unpackbits(packed.reshape(b * s, n // 8), axis=1).reshape(
            b, s, n
        )
        want = np.zeros((b, n), dtype)
        for k in range(s):
            want |= maps[:, k].astype(dtype) << k
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got, want)
    # leading-dim-free form (single image) and plane-count guards
    packed1 = rng.integers(0, 256, size=(2, 8), dtype=np.uint8)
    assert packed_planes_to_diff(packed1, np.uint8).shape == (64,)
    with pytest.raises(ValueError):
        packed_planes_to_diff(
            rng.integers(0, 256, size=(9, 8), dtype=np.uint8), np.uint8
        )
    with pytest.raises(ValueError):
        packed_planes_to_diff(packed1.astype(np.int16), np.uint8)


def test_container_diff_matches_bitmaps(rng):
    """Container.diff == recombined Container.bitmaps for both blob forms."""
    from codec_tcc_tpu.io import container as container_io
    from codec_tcc_tpu.pipeline import encode_array, decode_container

    img = rng.integers(0, 4096, size=(32, 32), dtype=np.uint16)
    payload = rng.bytes(40)
    for version, codec in ((1, "png"), (2, "deflate")):
        cfg = EncodeConfig(
            strategy="multi_plane", codec=codec,
            container_version=version, compute_metrics=False,
        )
        blob = encode_array(img, payload, cfg).container
        cont = container_io.parse(blob)
        maps = cont.bitmaps()
        diff = cont.diff(img.dtype)
        want = np.zeros(img.shape, img.dtype)
        for k in range(cont.meta.s):
            want |= maps[k].astype(img.dtype) << k
        np.testing.assert_array_equal(diff, want)
        # and the restore contract end-to-end
        dec = decode_container(blob)
        np.testing.assert_array_equal(dec.original, img)
        assert dec.payload == payload


def test_pack_bits_batch_matches_np_packbits(rng):
    """Device packbits twin: bit-identical bytes to per-item np.packbits,
    including non-multiple-of-8 lengths (zero padding)."""
    from codec_tcc_tpu.ops.embed import pack_bits_batch

    for shape in ((3, 16, 16), (2, 5, 7), (4, 33)):
        bits = rng.integers(0, 2, size=shape).astype(np.uint8)
        got = np.asarray(pack_bits_batch(bits))
        want = np.stack([np.packbits(b) for b in bits])
        np.testing.assert_array_equal(got, want)


def test_expand_bits_matches_unpackbits(rng):
    from codec_tcc_tpu.utils.bits import expand_bits

    packed = rng.integers(0, 256, size=(5, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        expand_bits(packed), np.unpackbits(packed, axis=1)
    )
    with pytest.raises(ValueError):
        expand_bits(packed.astype(np.int32))


def test_packed_embed_jit_matches_separate_calls(rng):
    """The single-image fused dispatch (packed preplace + embed + bit-packed
    XOR maps in one program) is bit-identical to the three separate calls
    it replaces. The production gate only takes this route on real TPU, so
    the jit is exercised directly here on the CPU mesh."""
    import jax.numpy as jnp

    from codec_tcc_tpu.ops import embed as embed_ops
    from codec_tcc_tpu.parallel import batch as batch_par

    h, w, s, nbits = 24, 32, 2, 4
    n = h * w
    img = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)
    msg = rng.integers(0, 2, size=512, dtype=np.uint8)
    starts = np.array([[0, 100, 0, 0]], np.int32)
    lengths = np.array([[200, 150, 0, 0]], np.int32)
    offsets = np.array([[0, 200, 0, 0]], np.int32)
    plan = batch_par.BatchPlan(
        s=np.array([s], np.int32), starts=starts, lengths=lengths,
        offsets=offsets, msgs=msg[None],
        payload_bits=np.array([350], np.int64), nbits=nbits, lpad=msg.size,
    )
    stego_sep = np.asarray(
        batch_par.encode_batch(img[None], plan, backend="packed")
    )
    packed_sep = np.asarray(embed_ops.xor_maps_packed_batch(
        jnp.asarray(img[None]), jnp.asarray(stego_sep), s
    ))[0]

    n_buf = (n + 127) // 128 * 128
    stego_f, packed_f = batch_par._packed_embed_jit(
        jnp.asarray(img[None]), jnp.asarray(batch_par._msg_prefix(plan)),
        jnp.asarray(starts), jnp.asarray(lengths), jnp.asarray(offsets),
        n, nbits, n_buf, s,
    )
    np.testing.assert_array_equal(
        np.asarray(stego_f)[0].reshape(h, w), stego_sep[0]
    )
    np.testing.assert_array_equal(np.asarray(packed_f)[0], packed_sep)


def test_bench_outage_line_carries_last_healthy_run():
    """The bench's dead-tunnel artifact must carry provenance: the newest
    preserved healthy driver-style run from docs/artifacts/ (value,
    backend, artifact path), so a tunnel outage at driver time still
    yields a self-explaining BENCH_r{N}.json instead of a bare zero."""
    import importlib.util
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location("bench_mod", root / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    last = bench._last_healthy_artifact()
    assert last is not None
    assert last["value"] > 0
    assert last["unit"] == "MPix/s/chip"
    assert last["backend"] in ("packed", "preplaced", "windowed", "xla")
    assert (root / last["artifact"]).is_file()

    # both failure paths (dead tunnel; all workers died after a passing
    # probe) go through _print_outage_line. Round-5 contract: stdout gets
    # the SLIM line (driver 2,000-char tail cap) carrying the error and the
    # last healthy provenance, while the FULL object — worker_attempts,
    # cpu_backend_e2e, every stage dict — goes to the preserved
    # docs/artifacts/ file (stubbed here so the suite never writes one).
    import contextlib
    import io
    import json

    # stub the CPU-backend e2e measurement (a real subprocess worker takes
    # minutes); the contract here is that the outage line CARRIES the field
    bench._run_cpu_e2e = lambda timeout=900: {"stubbed": True}
    preserved = {}

    def _fake_preserve(obj, tag):
        preserved["obj"] = obj
        preserved["tag"] = tag
        return f"docs/artifacts/bench_stub_{tag}.json"

    bench._preserve_artifact = _fake_preserve
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._print_outage_line("synthetic error", ["packed: rc=1 boom"])
    line = buf.getvalue()
    assert len(line.strip()) <= 2000  # fits the driver tail COMPLETE
    slim = json.loads(line)
    assert slim["backend"] == "none" and slim["value"] == 0.0
    assert slim["extra"]["error"] == "synthetic error"
    assert slim["extra"]["artifact"] == "docs/artifacts/bench_stub_outage.json"
    assert slim["extra"]["last_healthy_run"] == last
    full = preserved["obj"]
    assert preserved["tag"] == "outage"
    assert full["extra"]["error"] == "synthetic error"
    assert full["extra"]["worker_attempts"] == ["packed: rc=1 boom"]
    assert full["extra"]["last_healthy_run"] == last
    assert full["extra"]["cpu_backend_e2e"] == {"stubbed": True}
