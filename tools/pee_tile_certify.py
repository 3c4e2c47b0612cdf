"""Certify larger PEE grid tiles on the real chip (round-4 VERDICT #5).

The PEE kernels' measured bound is a ~5-6 us per-grid-step floor
(docs/KERNELS.md), so at the default tile_px=65536 a 512^2 x B=256 cycle
pays 4 passes x 4 steps x 256 images ~ 4096 grid steps ~ 22 ms — matching
the observed ~30 ms cycle. Interpret mode already proved 131072/262144
bit-identical; this tool proves them ON CHIP (stego bytes + restored
images + extracted counts all equal across sizes) and times the full fused
cycle per size. If a larger size certifies, flip
``pallas_pee._TILE_CHOICES`` so ``preferred_tile_px`` picks it everywhere.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pee_tile_certify.py [B]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main(B: int = 256, h: int = 512, w: int = 512) -> None:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        raise RuntimeError("run on the real chip")
    from bench import _pee_images_dev, _ship_bits
    from codec_tcc_tpu.ops import pallas_pee as pp

    n = h * w
    t, max_val = 2, 4095
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, size=(B, 1 << 17)).astype(np.uint8)
    want = jnp.full((B,), 100_000, jnp.int32)
    zero = jnp.zeros(B, jnp.int32)
    imgs3 = _pee_images_dev(B, h, w, 1, 400, 300, 37.0, 53.0, 836).reshape(
        B, n // 128, 128
    )
    msgs_dev = _ship_bits(msgs)

    ref_stego = None
    ref_restored = None
    ref_counts = None
    for tile_px in (65536, 131072, 262144):
        try:
            msg2d_d, l2 = pp.prep_messages_device(msgs_dev, n, tile_px)

            def cycle(im3, ms):
                s0, o0, u0, n0 = pp.embed_pass_batch(
                    im3, ms, zero, want, h, w, 0, t, max_val, l2,
                    tile_px=tile_px)
                s1, o1, u1, n1 = pp.embed_pass_batch(
                    s0, ms, u0, want - u0, h, w, 1, t, max_val, l2,
                    tile_px=tile_px)
                over = o0 | o1
                r1, g1, c1 = pp.extract_pass_batch(
                    s1, over, n1, h, w, 1, t, max_val, tile_px=tile_px)
                r0, g0, c0 = pp.extract_pass_batch(
                    r1, over, n0, h, w, 0, t, max_val, tile_px=tile_px)
                return s1, r0, jnp.sum(c0, dtype=jnp.int64) + jnp.sum(
                    c1, dtype=jnp.int64)

            cyc = jax.jit(cycle)
            t0 = time.perf_counter()
            stego, restored, counts = cyc(imgs3, msg2d_d)
            jax.block_until_ready((stego, restored, counts))
            compile_s = time.perf_counter() - t0

            # bit-exactness across tile sizes: stego bytes, restored
            # images, extracted counts
            ok_restore = bool(jnp.all(restored == imgs3))
            if ref_stego is None:
                ref_stego, ref_restored, ref_counts = stego, restored, counts
                ok_cross = True
            else:
                ok_cross = bool(
                    jnp.all(stego == ref_stego)
                    and jnp.all(restored == ref_restored)
                    and counts == ref_counts
                )

            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(3):
                    out = cyc(imgs3, msg2d_d)
                jax.block_until_ready(out)
                times.append((time.perf_counter() - t0) / 3)
            med = float(np.median(times))
            print(json.dumps({
                "tile_px": tile_px,
                "compile_s": round(compile_s, 1),
                "cycle_ms": round(med * 1e3, 2),
                "mpix_s": round(B * n / med / 1e6, 1),
                "restore_exact": ok_restore,
                "matches_65536": ok_cross,
            }), flush=True)
        except Exception as exc:
            print(json.dumps({
                "tile_px": tile_px,
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
