"""Pallas PEE kernels: bit-exactness vs the XLA ops.pee path (interpret mode
on CPU; the same kernels are validated and benchmarked on the real chip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codec_tcc_tpu.ops import pee as pee_ops
from codec_tcc_tpu.ops import pallas_pee as pp


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() == "tpu":
        yield
        return
    with pltpu.force_tpu_interpret_mode():
        yield


def _xla_two_pass(imgs, msgs, want, t, max_val):
    """Per-image XLA reference: embed both passes, then extract both."""
    b, h, w = imgs.shape
    out = []
    for i in range(b):
        s0, o0, u0, n0 = pee_ops.embed_pass(
            imgs[i], msgs[i], np.int32(0), np.int32(want[i]), 0, t, max_val
        )
        w1 = int(want[i]) - int(u0)
        s1, o1, u1, n1 = pee_ops.embed_pass(
            np.asarray(s0), msgs[i], jnp.int32(int(u0)), np.int32(w1), 1, t, max_val
        )
        out.append((np.asarray(s1), np.asarray(o0), np.asarray(o1),
                    int(u0), int(n0), int(u1), int(n1)))
    return out


@pytest.mark.parametrize("dtype,hi,max_val,t", [
    (np.uint16, 837, 4095, 2),
    (np.uint8, 256, 255, 4),
])
def test_pallas_pee_embed_matches_xla(rng, dtype, hi, max_val, t):
    b, h, w = 2, 512, 128
    n = h * w
    imgs = rng.integers(0, hi, size=(b, h, w)).astype(dtype)
    lpad = 8192
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    want = np.array([5000, 1200], dtype=np.int32)

    ref = _xla_two_pass(imgs, msgs, want, t, max_val)

    msg2d, l2 = pp.prep_messages(msgs, n)
    imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)
    s0, ov0, u0, np0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2,
    )
    s1, ov1, u1, np1 = pp.embed_pass_batch(
        s0, jnp.asarray(msg2d), u0, jnp.asarray(want) - u0,
        h, w, 1, t, max_val, l2,
    )
    stego = np.asarray(s1).reshape(b, h, w)
    ov0 = np.asarray(ov0).reshape(b, h, w)
    ov1 = np.asarray(ov1).reshape(b, h, w)

    for i in range(b):
        st_ref, o0_ref, o1_ref, u0_ref, n0_ref, u1_ref, n1_ref = ref[i]
        np.testing.assert_array_equal(stego[i], st_ref)
        np.testing.assert_array_equal(ov0[i].astype(bool), o0_ref)
        np.testing.assert_array_equal(ov1[i].astype(bool), o1_ref)
        assert int(u0[i]) == u0_ref and int(np0[i]) == n0_ref
        assert int(u1[i]) == u1_ref and int(np1[i]) == n1_ref


def test_pallas_pee_full_cycle_roundtrip(rng):
    """Embed + extract through the Pallas kernels recovers the exact payload
    and the exact original images (both passes, uint16)."""
    b, h, w = 2, 512, 512
    n = h * w
    t, max_val = 2, 4095
    # smooth carriers (real images are predictable; uniform noise has almost
    # no |e| < T pixels and cannot hold the payload)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (400 + 300 * np.sin(yy / 37.0) * np.cos(xx / 53.0)).astype(np.int64)
    imgs = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)
        for _ in range(b)
    ])
    lpad = 1 << 17
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    want = np.array([100_000, 40_000], dtype=np.int32)

    msg2d, l2 = pp.prep_messages(msgs, n)
    imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)
    s0, ov0, u0, np0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2,
    )
    s1, ov1, u1, np1 = pp.embed_pass_batch(
        s0, jnp.asarray(msg2d), u0, jnp.asarray(want) - u0,
        h, w, 1, t, max_val, l2,
    )
    assert (np.asarray(u0) + np.asarray(u1) == want).all()

    over = np.asarray(ov0) | np.asarray(ov1)
    r1, segs1, cnts1 = pp.extract_pass_batch(
        s1, jnp.asarray(over), np1, h, w, 1, t, max_val
    )
    r0, segs0, cnts0 = pp.extract_pass_batch(
        r1, jnp.asarray(over), np0, h, w, 0, t, max_val
    )
    np.testing.assert_array_equal(
        np.asarray(r0).reshape(b, h, w), imgs
    )
    bits1 = pp.collect_bits(segs1, cnts1, int(np.asarray(u1).max(initial=1)))
    bits0 = pp.collect_bits(segs0, cnts0, int(np.asarray(u0).max(initial=1)))
    for i in range(b):
        got = np.concatenate([
            bits0[i, : int(u0[i])], bits1[i, : int(u1[i])]
        ])
        np.testing.assert_array_equal(got, msgs[i, : want[i]])


def test_preferred_tile_px_contract():
    """Selection invariants that hold for ANY preference list: the choice
    must be usable — directly supported, or padded within the 2x overhead
    bound — and must prefer direct support over padding."""
    for h, w in [(512, 512), (2048, 2048), (640, 480), (500, 500), (64, 64)]:
        tp = pp.preferred_tile_px(h, w)
        assert tp in pp._TILE_CHOICES or tp == pp.TILE_PX
        if pp.supports(h, w, tp):
            continue
        hb, wb = pp.padded_geometry(h, w, tp)
        # padded fallback must respect routeable()'s overhead promise for
        # every geometry routeable() accepts
        if pp.routeable(h, w):
            assert hb * wb <= 2 * h * w, (h, w, tp)


@pytest.mark.parametrize("tile_px", [131072, 262144])
def test_pallas_pee_tile_px_bit_identical(rng, tile_px):
    """Larger grid tiles (round-3 per-step-floor amortization: tile_px is a
    static kernel parameter, default 65536) must produce bit-identical
    stego/restored/bits/counts to the default tile on both passes,
    including the capacity-saturated case."""
    b, h, w = 2, 1024, 512
    n = h * w
    t, max_val = 2, 4095
    yy, xx = np.mgrid[0:h, 0:w]
    base = (400 + 300 * np.sin(yy / 37.0) * np.cos(xx / 53.0)).astype(np.int64)
    imgs = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)
        for _ in range(b)
    ])
    msgs = rng.integers(0, 2, size=(b, 1 << 18)).astype(np.uint8)
    # second image saturates (want > two-pass capacity)
    want = jnp.asarray(np.array([150_000, 500_000], dtype=np.int32))
    zero = jnp.zeros(b, jnp.int32)
    imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)

    def cycle(tile):
        msg2d, l2 = pp.prep_messages(msgs, n, tile)
        m2 = jnp.asarray(msg2d)
        s0, o0, u0, n0 = pp.embed_pass_batch(
            imgs3, m2, zero, want, h, w, 0, t, max_val, l2, tile_px=tile)
        s1, o1, u1, n1 = pp.embed_pass_batch(
            s0, m2, u0, want - u0, h, w, 1, t, max_val, l2, tile_px=tile)
        over = o0 | o1
        r1, g1, c1 = pp.extract_pass_batch(
            s1, over, n1, h, w, 1, t, max_val, tile_px=tile)
        r0, g0, c0 = pp.extract_pass_batch(
            r1, over, n0, h, w, 0, t, max_val, tile_px=tile)
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(imgs3))
        return tuple(np.asarray(v) for v in (
            s1, u0, u1, n0, n1,
            pp.collect_bits(g0, c0, n), pp.collect_bits(g1, c1, n),
        ))

    ref = cycle(pp.TILE_PX)
    got = cycle(tile_px)
    for name, a, b_ in zip(
        ("stego", "u0", "u1", "n0", "n1", "bits0", "bits1"), ref, got
    ):
        np.testing.assert_array_equal(a, b_, err_msg=f"{name} @ {tile_px}")


def test_pallas_pee_capacity_saturated_matches_xla(rng):
    """want > capacity (the saturation convention: the whole in-set is
    processed, nproc = h*w, used = capacity) — Pallas and XLA must agree
    bit-for-bit and the saturated pass must still invert exactly."""
    b, h, w = 1, 512, 128
    n = h * w
    t, max_val = 2, 4095
    yy, xx = np.mgrid[0:h, 0:w]
    img = (400 + 60 * np.sin(yy / 11.0) * np.cos(xx / 7.0)).astype(np.uint16)
    img += rng.integers(0, 9, size=(h, w)).astype(np.uint16)  # thin the capacity
    imgs = img[None]
    cap = int(pee_ops.capacity(imgs[0], 0, t, max_val))
    lpad = 1 << max(3, (2 * cap - 1).bit_length())
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    want = np.array([cap + 1000], dtype=np.int32)  # saturate the pass

    s_ref, o_ref, u_ref, n_ref = pee_ops.embed_pass(
        imgs[0], msgs[0], np.int32(0), np.int32(int(want[0])), 0, t, max_val
    )
    assert int(u_ref) == cap and int(n_ref) == h * w

    msg2d, l2 = pp.prep_messages(msgs, n)
    imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)
    s0, ov0, u0, np0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2,
    )
    np.testing.assert_array_equal(
        np.asarray(s0).reshape(b, h, w)[0], np.asarray(s_ref)
    )
    np.testing.assert_array_equal(
        np.asarray(ov0).reshape(b, h, w)[0].astype(bool), np.asarray(o_ref)
    )
    assert int(u0[0]) == cap and int(np0[0]) == h * w

    # the saturated pass still inverts exactly through both extractors
    over3 = jnp.asarray(np.asarray(ov0))
    r, segs, cnts = pp.extract_pass_batch(s0, over3, np0, h, w, 0, t, max_val)
    np.testing.assert_array_equal(np.asarray(r).reshape(b, h, w), imgs)
    bits = pp.collect_bits(segs, cnts, max(cap, 1))
    np.testing.assert_array_equal(bits[0, :cap], msgs[0, :cap])


def test_batch_pee_backends_byte_identical(rng):
    """The XLA batch loop and the Pallas batch loop follow the same probe
    protocol (unclamped wants, used-based acceptance), so their containers
    must be byte-identical — including when pass 0 saturates."""
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.parallel import batch_pee as bp

    b, h, w = 2, 512, 128
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 60 * np.sin(yy / 19.0) * np.cos(xx / 13.0)).astype(np.int64)
    imgs = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(0, 255).astype(np.uint8)
        for _ in range(b)
    ])
    cfg = EncodeConfig(strategy="pee", pee_threshold=1, compute_metrics=False)
    max_val = 255
    cap0 = int(pee_ops.capacity(imgs[0], 0, 1, max_val))
    # first payload saturates pass 0 at T=1 (forcing the saturation
    # convention and possibly an escalation); second stays small
    payloads = [
        rng.integers(0, 2, size=cap0 + 500).astype(np.uint8),
        rng.integers(0, 2, size=200).astype(np.uint8),
    ]

    xla = bp.encode_pee_batch(imgs, payloads, cfg, backend="xla",
                              bits_stored=8)
    pal = bp.encode_pee_batch(imgs, payloads, cfg, backend="pallas",
                              bits_stored=8)

    np.testing.assert_array_equal(xla.thresholds, pal.thresholds)
    np.testing.assert_array_equal(xla.stego, pal.stego)
    assert xla.containers == pal.containers

    # and every container still round-trips exactly
    from codec_tcc_tpu import decode_container

    for i, cont in enumerate(xla.containers):
        dec = decode_container(cont)
        np.testing.assert_array_equal(dec.payload_bits, np.asarray(payloads[i]))
        np.testing.assert_array_equal(dec.original, imgs[i])


def test_pallas_pee_wide_image_2048(rng):
    """w=2048 (vertical-neighbor offset of 16 pixel-major rows — the full
    halo): embed matches XLA bit-for-bit and the cycle round-trips."""
    b, h, w = 1, 32, 2048
    n = h * w
    t, max_val = 2, 4095
    assert pp.supports(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = ((400 + 300 * np.sin(yy / 7.0) * np.cos(xx / 53.0)).astype(np.int64)
            + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)[None]
    msgs = rng.integers(0, 2, size=(b, 8192)).astype(np.uint8)
    want = np.array([4000], dtype=np.int32)

    s_ref, o_ref, u_ref, n_ref = pee_ops.embed_pass(
        imgs[0], msgs[0], np.int32(0), np.int32(4000), 0, t, max_val
    )
    msg2d, l2 = pp.prep_messages(msgs, n)
    imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)
    s0, ov0, u0, np0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2,
    )
    np.testing.assert_array_equal(
        np.asarray(s0).reshape(b, h, w)[0], np.asarray(s_ref)
    )
    assert int(u0[0]) == int(u_ref) and int(np0[0]) == int(n_ref)

    r, segs, cnts = pp.extract_pass_batch(
        s0, jnp.asarray(np.asarray(ov0)), np0, h, w, 0, t, max_val
    )
    np.testing.assert_array_equal(np.asarray(r).reshape(b, h, w), imgs)
    bits = pp.collect_bits(segs, cnts, int(u0[0]))
    np.testing.assert_array_equal(bits[0], msgs[0, : int(u0[0])])


def test_pallas_pee_extract_matches_xla(rng):
    """Pallas extraction agrees with ops.pee.extract_pass restored/bits."""
    b, h, w = 1, 512, 128
    n = h * w
    t, max_val = 2, 4095
    imgs = rng.integers(0, 837, size=(b, h, w)).astype(np.uint16)
    msgs = rng.integers(0, 2, size=(b, 4096)).astype(np.uint8)
    want = np.array([3000], dtype=np.int32)

    msg2d, l2 = pp.prep_messages(msgs, n)
    imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)
    s0, ov0, u0, np0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2,
    )
    stego = np.asarray(s0).reshape(b, h, w)
    over = np.asarray(ov0).reshape(b, h, w).astype(bool)

    r_ref, bits_ref, nb_ref = pee_ops.extract_pass(
        stego[0], over[0], np.int32(int(np0[0])), 0, t, max_val, 8192
    )
    r, segs, cnts = pp.extract_pass_batch(
        s0, jnp.asarray(over.astype(np.uint8)).reshape(b, n // 128, 128),
        np0, h, w, 0, t, max_val,
    )
    np.testing.assert_array_equal(
        np.asarray(r).reshape(b, h, w)[0], np.asarray(r_ref)
    )
    assert int(np.asarray(cnts).sum()) == int(nb_ref)
    bits = pp.collect_bits(segs, cnts, 8192)
    np.testing.assert_array_equal(bits[0], np.asarray(bits_ref))


@pytest.mark.parametrize("h,w", [(200, 200), (96, 500)])
def test_pallas_pee_padded_geometry_matches_xla(rng, h, w):
    """Odd geometries (w % 128 != 0, n % 65536 != 0) run the kernels on a
    zero-padded buffer with logical-dimension masks — bit-exact with the
    XLA oracle (round-2 verdict #4: no more 43 MPix/s cliff for real-world
    shapes like 640x480 / 500x500)."""
    assert not pp.supports(h, w)
    b, t, max_val = 2, 2, 4095
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w]
    base = (400 + 300 * np.sin(yy / 17.0) * np.cos(xx / 23.0)).astype(np.int64)
    imgs = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)
        for _ in range(b)
    ])
    lpad = 8192
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    want = np.array([4000, 900], dtype=np.int32)

    ref = _xla_two_pass(imgs, msgs, want, t, max_val)

    hb, wb = pp.padded_geometry(h, w)
    assert wb % 128 == 0 and (hb * wb) % pp.TILE_PX == 0

    msg2d, l2 = pp.prep_messages(msgs, n)
    imgs3 = pp.pad_batch(imgs, h, w)
    s0, ov0, u0, np0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2, buf_w=wb,
    )
    s1, ov1, u1, np1 = pp.embed_pass_batch(
        s0, jnp.asarray(msg2d), u0, jnp.asarray(want) - u0,
        h, w, 1, t, max_val, l2, buf_w=wb,
    )
    stego = np.asarray(pp.unpad_batch(s1, h, w))
    o0 = np.asarray(pp.unpad_batch(ov0, h, w))
    o1 = np.asarray(pp.unpad_batch(ov1, h, w))

    for i in range(b):
        st_ref, o0_ref, o1_ref, u0_ref, n0_ref, u1_ref, n1_ref = ref[i]
        np.testing.assert_array_equal(stego[i], st_ref)
        np.testing.assert_array_equal(o0[i].astype(bool), o0_ref)
        np.testing.assert_array_equal(o1[i].astype(bool), o1_ref)
        assert int(u0[i]) == u0_ref and int(np0[i]) == n0_ref
        assert int(u1[i]) == u1_ref and int(np1[i]) == n1_ref

    # inverse passes over the padded buffers recover payload and original
    over_pad = pp.pad_batch((o0 | o1), h, w)
    r1, segs1, cnts1 = pp.extract_pass_batch(
        s1, over_pad, np1, h, w, 1, t, max_val, buf_w=wb
    )
    r0, segs0, cnts0 = pp.extract_pass_batch(
        r1, over_pad, np0, h, w, 0, t, max_val, buf_w=wb
    )
    restored = np.asarray(pp.unpad_batch(r0, h, w))
    bits0 = pp.collect_bits(segs0, cnts0, lpad)
    bits1 = pp.collect_bits(segs1, cnts1, lpad)
    for i in range(b):
        np.testing.assert_array_equal(restored[i], imgs[i])
        got = np.concatenate(
            [bits0[i, : int(u0[i])], bits1[i, : int(u1[i])]]
        )
        np.testing.assert_array_equal(got, msgs[i, : int(want[i])])


def test_pee_batch_odd_geometry_end_to_end(rng):
    """encode_pee_batch/decode_pee_batch with forced pallas backend on an
    odd geometry (covers the pad-and-mask routing in parallel/batch_pee)."""
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.parallel import batch_pee as bp

    h, w = 96, 500
    yy, xx = np.mgrid[0:h, 0:w]
    base = (300 + 200 * np.sin(yy / 11.0) * np.cos(xx / 19.0)).astype(np.int64)
    imgs = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)
        for _ in range(2)
    ])
    payloads = [rng.integers(0, 2, size=k).astype(np.uint8) for k in (3000, 700)]
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)

    pal = bp.encode_pee_batch(imgs, payloads, cfg, backend="pallas")
    xla = bp.encode_pee_batch(imgs, payloads, cfg, backend="xla")
    np.testing.assert_array_equal(pal.stego, xla.stego)
    assert pal.containers == xla.containers

    from codec_tcc_tpu import decode_container

    for i, cont in enumerate(pal.containers):
        dec = decode_container(cont)
        np.testing.assert_array_equal(dec.payload_bits, payloads[i])
        np.testing.assert_array_equal(dec.original, imgs[i])


def test_batch_pee_mixed_thresholds_grouped(rng):
    """Per-image threshold selection (round-2 verdict #3): a batch holding
    one hard image (needs a larger T) and one easy image must NOT couple
    their thresholds — the easy image keeps its small T and distortion —
    and the mixed-T batch must round-trip through both the grouped fused
    decode path (forced pallas) and the per-item fallback."""
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.parallel import batch_pee as bp

    h, w = 512, 128
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = ((400 + 60 * np.sin(yy / 11.0) * np.cos(xx / 7.0)).astype(np.int64)
              + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)
    rough = ((400 + 60 * np.sin(yy / 11.0) * np.cos(xx / 7.0)).astype(np.int64)
             + rng.integers(-6, 7, size=(h, w))).clip(0, 836).astype(np.uint16)
    imgs = np.stack([smooth, rough])
    cap_rough_t1 = int(pee_ops.capacity(rough, 0, 1, 4095)) + int(
        pee_ops.capacity(rough, 1, 1, 4095))
    payloads = [
        rng.integers(0, 2, size=500).astype(np.uint8),          # easy
        rng.integers(0, 2, size=cap_rough_t1 + 1000).astype(np.uint8),  # hard
    ]
    cfg = EncodeConfig(strategy="pee", pee_threshold=1, compute_metrics=False)
    res = bp.encode_pee_batch(imgs, payloads, cfg, backend="pallas",
                              bits_stored=12)
    assert res.thresholds[0] < res.thresholds[1], res.thresholds
    assert res.thresholds[0] == 1

    # distortion decoupling: the easy image embeds at T=1 regardless of the
    # hard one (round 2 would have escalated BOTH to the larger T)
    solo = bp.encode_pee_batch(imgs[:1], payloads[:1], cfg, backend="pallas",
                               bits_stored=12)
    np.testing.assert_array_equal(res.stego[0], solo.stego[0])

    # per-item fallback decode (the CPU route of decode_pee_batch)
    outs = bp.decode_pee_batch(res.containers)
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out.payload_bits, np.asarray(payloads[i]))
        np.testing.assert_array_equal(out.original, imgs[i])

    # the fused group decoder itself (what decode_pee_batch runs per T group
    # on TPU), under interpret mode
    from codec_tcc_tpu.io import container as container_io
    from codec_tcc_tpu.models.pee import parse_pee_container_parts

    for i in range(2):
        cont = container_io.parse(res.containers[i])
        ext, over = parse_pee_container_parts(cont)
        (out,) = bp._decode_group_fused([cont], [ext], [over], True)
        np.testing.assert_array_equal(out.payload_bits, np.asarray(payloads[i]))
        np.testing.assert_array_equal(out.original, imgs[i])


def test_both_passes_composites_match_sequential(rng):
    """The round-3 fused composites (embed_both_passes_batch /
    extract_both_passes_batch — ONE dispatch on the production paths) are
    bit-identical to the sequential per-pass calls, on both the direct and
    the pad-and-mask (odd geometry) routes, including an image whose
    payload fits entirely in pass 0 (the old early-exit case)."""
    t, max_val = 2, 4095
    for h, w in ((512, 512), (160, 96)):
        n = h * w
        b = 2
        tp = pp.preferred_tile_px(h, w)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (400 + 300 * np.sin(yy / 31.0) * np.cos(xx / 41.0)).astype(np.int64)
        imgs = np.stack([
            (base + rng.integers(-1, 2, size=(h, w))).clip(0, 836)
            .astype(np.uint16)
            for _ in range(b)
        ])
        msgs = rng.integers(0, 2, size=(b, 1 << 17)).astype(np.uint8)
        # image 0: tiny payload (fits in pass 0); image 1: needs both passes
        want = jnp.asarray(np.array([64, min(100_000, n // 4)], np.int32))
        zero = jnp.zeros(b, jnp.int32)
        msg2d, l2 = pp.prep_messages(msgs, n, tp)
        m2 = jnp.asarray(msg2d)
        if pp.supports(h, w, tp):
            imgs3 = jnp.asarray(imgs).reshape(b, n // 128, 128)
            buf_w = None
        else:
            imgs3 = pp.pad_batch(jnp.asarray(imgs), h, w, tp)
            buf_w = pp.padded_geometry(h, w, tp)[1]

        s0, o0, u0, n0 = pp.embed_pass_batch(
            imgs3, m2, zero, want, h, w, 0, t, max_val, l2,
            buf_w=buf_w, tile_px=tp)
        s1, o1, u1, n1 = pp.embed_pass_batch(
            s0, m2, u0, want - u0, h, w, 1, t, max_val, l2,
            buf_w=buf_w, tile_px=tp)
        fs, fo, fu0, fn0, fu1, fn1 = pp.embed_both_passes_batch(
            imgs3, m2, want, h, w, t, max_val, l2, buf_w=buf_w, tile_px=tp)
        np.testing.assert_array_equal(np.asarray(fs), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(fo), np.asarray(o0 | o1))
        for a, bb in ((fu0, u0), (fu1, u1), (fn0, n0), (fn1, n1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

        r1, g1, c1 = pp.extract_pass_batch(
            s1, o0 | o1, n1, h, w, 1, t, max_val, buf_w=buf_w, tile_px=tp)
        r0, g0, c0 = pp.extract_pass_batch(
            r1, o0 | o1, n0, h, w, 0, t, max_val, buf_w=buf_w, tile_px=tp)
        fr0, fg1, fc1, fg0, fc0 = pp.extract_both_passes_batch(
            s1, o0 | o1, n0, n1, h, w, t, max_val, buf_w=buf_w, tile_px=tp)
        np.testing.assert_array_equal(np.asarray(fr0), np.asarray(r0))
        np.testing.assert_array_equal(np.asarray(fr0), np.asarray(imgs3))
        np.testing.assert_array_equal(
            pp.collect_bits(fg0, fc0, n), pp.collect_bits(g0, c0, n))
        np.testing.assert_array_equal(
            pp.collect_bits(fg1, fc1, n), pp.collect_bits(g1, c1, n))
