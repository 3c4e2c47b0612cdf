"""Quick on-chip probe of the fused block_adaptive cycle (bench leg twin).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_block_cycle.py
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from codec_tcc_tpu.ops import segments as segment_ops
    from codec_tcc_tpu.parallel.batch import (
        _batch_block_bases, _block_embed_batch, _block_extract_batch,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h = w = 512
    n = h * w
    s, nbits, block = 4, 4, 16
    payload_bits = 100_000
    rng = np.random.default_rng(3)

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    imgs_dev = jax.random.randint(key, (B, h, w), 0, 837, dtype=jnp.int32).astype(jnp.uint16)
    plan = segment_ops.distribute_segments(s, payload_bits, 42)
    pp = segment_ops.raster_plane_plan(plan, n, nbits, 0, True)
    lengths = jnp.asarray(np.tile(pp.lengths, (B, 1)))
    offsets = jnp.asarray(np.tile(pp.offsets, (B, 1)))
    s_d = jnp.full((B,), s, jnp.int32)
    lpad = 1 << 17
    msgs_d = jax.random.randint(jax.random.PRNGKey(1), (B, lpad), 0, 2, dtype=jnp.int32).astype(jnp.uint8)

    t0 = time.perf_counter()
    jax.block_until_ready(imgs_dev)
    print(f"imgs built: {time.perf_counter()-t0:.2f}s", flush=True)

    from codec_tcc_tpu.ops import blocks as block_ops
    t0 = time.perf_counter()
    counts = jax.vmap(
        lambda im: block_ops.block_bit_counts_all(im, s, block)
    )(imgs_dev)
    jax.block_until_ready(counts)
    print(f"bases counts dispatch: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    bases = jnp.asarray(_batch_block_bases(
        imgs_dev, nbits, np.full(B, s, np.int32), block, h, w
    ))
    print(f"bases total (cached counts compile): {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    stego = _block_embed_batch(
        imgs_dev, msgs_d, bases, lengths, offsets, s_d, nbits, block
    )
    jax.block_until_ready(stego)
    print(f"embed compile+run: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    bits = _block_extract_batch(
        stego, bases, lengths, offsets, s_d, nbits, block, lpad
    )
    jax.block_until_ready(bits)
    print(f"extract compile+run: {time.perf_counter()-t0:.2f}s", flush=True)

    @jax.jit
    def cycle(imgs, msgs):
        stego = _block_embed_batch(
            imgs, msgs, bases, lengths, offsets, s_d, nbits, block
        )
        bits = _block_extract_batch(
            stego, bases, lengths, offsets, s_d, nbits, block, lpad
        )
        return stego, jnp.sum(bits, dtype=jnp.int32)

    t0 = time.perf_counter()
    out = cycle(imgs_dev, msgs_d)
    jax.block_until_ready(out)
    print(f"cycle compile+first run: {time.perf_counter()-t0:.2f}s", flush=True)

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = cycle(imgs_dev, msgs_d)
        # host sync via device scalar (CLAUDE.md: block_until_ready
        # under-reports over the tunnel)
        float(out[1])
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {i}: {dt*1e3:.2f} ms", flush=True)
    med = float(np.median(times))
    print(f"block_cycle_mpix_s: {B*n/med/1e6:.1f}", flush=True)


if __name__ == "__main__":
    main()
