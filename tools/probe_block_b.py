"""Production block_adaptive cycle vs batch size, with forced host sync.

`jax.block_until_ready` misreports over the dev tunnel (measured: a pure
XOR sweep "repped" both 26.9 ms and 0.0 ms on the same day) — CLAUDE.md's
recipe applies: every timed program ends in a device scalar that the
harness pulls with float(), and a sum-only baseline is measured for
subtraction.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_block_b.py 128 256
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(name, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = float(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(fn(*args))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"{name}: compile {compile_s:.1f}s, rep {med*1e3:.1f} ms "
          f"(all {[round(t*1e3,1) for t in times]})", flush=True)
    return med


def run(B):
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.parallel.batch import (
        _block_embed_batch, _block_extract_batch,
    )

    h = w = 512
    block = 16
    nh, nw = h // block, w // block
    ntiles, bs = nh * nw, block * block
    n = h * w
    nbits, s = 4, 4
    lpad = 1 << 17

    imgs = jax.random.randint(jax.random.PRNGKey(0), (B, h, w), 0, 837,
                              dtype=jnp.int32).astype(jnp.uint16)
    msgs = jax.random.randint(jax.random.PRNGKey(1), (B, lpad), 0, 2,
                              dtype=jnp.int32).astype(jnp.uint8)
    rng = np.random.default_rng(7)
    bases = jnp.asarray(np.stack([
        np.stack([rng.permutation(ntiles).astype(np.int32) * bs
                  for _ in range(nbits)])
        for _ in range(B)
    ]))
    lengths = jnp.asarray(np.tile(
        np.array([60000, 25000, 10000, 5000], np.int32), (B, 1)))
    offsets = jnp.asarray(np.tile(
        np.array([0, 60000, 85000, 95000], np.int32), (B, 1)))
    s_d = jnp.full((B,), s, jnp.int32)

    @jax.jit
    def sum_only(imgs_):
        return jnp.sum(imgs_, dtype=jnp.float32)

    @jax.jit
    def floor(imgs_):
        return jnp.sum(imgs_ ^ jnp.uint16(1), dtype=jnp.float32)

    @jax.jit
    def cyc(imgs_, msgs_):
        st = _block_embed_batch(
            imgs_, msgs_, bases, lengths, offsets, s_d, nbits, block)
        bits = _block_extract_batch(
            st, bases, lengths, offsets, s_d, nbits, block, lpad)
        return (jnp.sum(st, dtype=jnp.float32)
                + jnp.sum(bits, dtype=jnp.float32))

    ts = bench(f"sum_only_B{B}", sum_only, imgs)
    tf = bench(f"floor_B{B}", floor, imgs)
    tc = bench(f"cycle_B{B}", cyc, imgs, msgs)
    dev = max(tc - ts, 1e-4)
    print(f"B={B}: cycle {B*n/tc/1e6:.0f} MPix/s raw, "
          f"{B*n/dev/1e6:.0f} sum-subtracted "
          f"(sum {ts*1e3:.1f} ms, floor {tf*1e3:.1f}, cycle {tc*1e3:.1f})",
          flush=True)


if __name__ == "__main__":
    for b in [int(a) for a in sys.argv[1:]] or [128, 256]:
        run(b)
