"""Sweep preplaced-kernel tile sizes for the LSB cycle (round-2 verdict #6:
2048^2 trailed the 512^2 headline ~10%; find the per-size sweet spot).

Run on the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_tiles.py

Prints one JSON line per (image size, tile) with the cycle MPix/s.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_case(h: int, w: int, B: int, tile: int) -> float:
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.ops import pallas_embed as pe
    from codec_tcc_tpu.parallel import batch as batch_par

    n = h * w
    assert n % tile == 0
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 4096, size=(B, h, w)).astype(np.uint16)
    payloads = [rng.integers(0, 2, size=max(1000, n // 4)).astype(np.uint8)
                for _ in range(B)]
    plan = batch_par.plan_batch(imgs, payloads, EncodeConfig(beta=0.4))
    bits4 = pe.preplace_bits(plan.msgs, plan.starts, plan.lengths,
                             plan.offsets, n)
    imgs_d = jax.device_put(jnp.asarray(imgs).reshape(B, n // 128, 128))
    bits_d = jax.device_put(jnp.asarray(bits4))
    st_d = jax.device_put(jnp.asarray(plan.starts))
    ln_d = jax.device_put(jnp.asarray(plan.lengths))

    @jax.jit
    def cycle(im, bt, st, ln):
        stego = pe.embed_batch_preplaced(im, bt, st, ln, plan.nbits, tile)
        rows = pe.extract_raster_batch(stego, st, ln, plan.nbits, tile)
        return stego, jnp.sum(rows, dtype=jnp.int32)

    out = cycle(imgs_d, bits_d, st_d, ln_d)
    jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            out = cycle(imgs_d, bits_d, st_d, ln_d)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / 2)
    return B * n / float(np.median(times)) / 1e6


def main() -> None:
    cases = [
        (512, 512, 128, [32768, 65536, 131072, 262144]),
        (2048, 2048, 8, [65536, 131072, 262144, 524288, 1048576]),
    ]
    results = {}
    for h, w, B, tiles in cases:
        for tile in tiles:
            if (h * w) % tile:
                continue
            try:
                v = bench_case(h, w, B, tile)
            except Exception as exc:
                print(json.dumps({"size": f"{h}x{w}", "tile": tile,
                                  "error": f"{type(exc).__name__}: {exc}"[:160]}))
                continue
            results[(h, w, tile)] = v
            print(json.dumps({"size": f"{h}x{w}", "tile": tile,
                              "mpix_s": round(v, 1)}), flush=True)


if __name__ == "__main__":
    main()
