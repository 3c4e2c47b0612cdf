"""On-chip bit-exactness check for the padded (odd-geometry) kernel routes.

Interpret mode does not bounds-check DMAs (CLAUDE.md), so the pad-and-mask
routes must also be validated compiled on the real chip:

* PEE: padded-buffer embed/extract vs the XLA oracle on 640x480 + roundtrip;
* LSB: padded split-window preplaced embed/extract vs XLA on 50x100-style
  odd flat sizes (500x500 scaled down for oracle speed) + batch containers.

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/check_padded_onchip.py
"""

from __future__ import annotations

import numpy as np


def check_pee() -> None:
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.ops import pallas_pee as pp
    from codec_tcc_tpu.ops import pee as pee_ops

    h, w = 640, 480
    assert not pp.supports(h, w)
    b, t, max_val = 2, 2, 4095
    n = h * w
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (400 + 300 * np.sin(yy / 17.0) * np.cos(xx / 23.0)).astype(np.int64)
    imgs = np.stack([
        (base + rng.integers(-1, 2, size=(h, w))).clip(0, 836).astype(np.uint16)
        for _ in range(b)
    ])
    lpad = 1 << 16
    msgs = rng.integers(0, 2, size=(b, lpad)).astype(np.uint8)
    want = np.array([40_000, 9_000], dtype=np.int32)

    # XLA oracle
    ref = []
    for i in range(b):
        s0, o0, u0, n0 = pee_ops.embed_pass(
            imgs[i], msgs[i], np.int32(0), np.int32(want[i]), 0, t, max_val)
        w1 = int(want[i]) - int(u0)
        s1, o1, u1, n1 = pee_ops.embed_pass(
            np.asarray(s0), msgs[i], jnp.int32(int(u0)), np.int32(w1), 1, t,
            max_val)
        ref.append((np.asarray(s1), int(u0), int(n0), int(u1), int(n1)))

    # certify at the PRODUCTION tile size (preferred_tile_px), not the
    # module default — flipping _TILE_CHOICES must re-run this tool
    tp = pp.preferred_tile_px(h, w)
    wb = pp.padded_geometry(h, w, tp)[1]
    msg2d, l2 = pp.prep_messages(msgs, n, tp)
    imgs3 = jax.device_put(pp.pad_batch(imgs, h, w, tp))
    s0, o0, u0, n0 = pp.embed_pass_batch(
        imgs3, jnp.asarray(msg2d), jnp.zeros(b, jnp.int32), jnp.asarray(want),
        h, w, 0, t, max_val, l2, buf_w=wb, tile_px=tp)
    s1, o1, u1, n1 = pp.embed_pass_batch(
        s0, jnp.asarray(msg2d), u0, jnp.asarray(want) - u0,
        h, w, 1, t, max_val, l2, buf_w=wb, tile_px=tp)
    stego = np.asarray(pp.unpad_batch(s1, h, w, tp))
    for i in range(b):
        st_ref, u0_r, n0_r, u1_r, n1_r = ref[i]
        assert (stego[i] == st_ref).all(), f"pee stego mismatch img {i}"
        assert int(u0[i]) == u0_r and int(n0[i]) == n0_r
        assert int(u1[i]) == u1_r and int(n1[i]) == n1_r

    over = jnp.asarray(o0) | jnp.asarray(o1)
    r1, g1, c1 = pp.extract_pass_batch(s1, over, n1, h, w, 1, t, max_val,
                                       buf_w=wb, tile_px=tp)
    r0, g0, c0 = pp.extract_pass_batch(r1, over, n0, h, w, 0, t, max_val,
                                       buf_w=wb, tile_px=tp)
    restored = np.asarray(pp.unpad_batch(r0, h, w, tp))
    assert (restored == imgs).all(), "pee restore mismatch"
    bits0 = pp.collect_bits(g0, c0, lpad)
    bits1 = pp.collect_bits(g1, c1, lpad)
    for i in range(b):
        got = np.concatenate([bits0[i, : int(u0[i])], bits1[i, : int(u1[i])]])
        assert (got == msgs[i, : int(want[i])]).all(), f"pee bits mismatch {i}"
    print(f"PEE padded route OK on {jax.default_backend()}: 640x480 exact at tile_px={tp}")


def check_lsb() -> None:
    import jax

    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(12)
    b, h, w = 4, 500, 500
    imgs = rng.integers(0, 4096, size=(b, h, w)).astype(np.uint16)
    payloads = [rng.integers(0, 2, size=int(k)).astype(np.uint8)
                for k in rng.integers(1000, 60_000, size=b)]
    cfg = EncodeConfig(strategy="hybrid", codec="deflate",
                       compute_metrics=False)
    plan = batch_par.plan_batch(imgs, payloads, cfg)
    st_pal = np.asarray(batch_par.encode_batch(imgs, plan, backend="preplaced"))
    st_xla = np.asarray(batch_par.encode_batch(imgs, plan, backend="xla"))
    assert (st_pal == st_xla).all(), "lsb padded embed mismatch"
    bits = batch_par.extract_batch(st_pal, plan, backend="preplaced")
    for i in range(b):
        nb = int(plan.payload_bits[i])
        assert (bits[i, :nb] == payloads[i]).all(), f"lsb bits mismatch {i}"
    print(f"LSB padded route OK on {jax.default_backend()}: 500x500 exact")


if __name__ == "__main__":
    check_pee()
    check_lsb()
