"""Forced-sync stage attribution for the block_adaptive device cycle.

probe_block_variants4's block_until_ready timings all read ~= the dispatch
floor and were untrustworthy (see bench._sync); this re-measures with every
stage ending in a device scalar pulled to host, floor-subtracted.

Stages (production components, B=128 default, 512^2, nbits=4):
  floor        : jitted sum of the image batch (dispatch + RTT only)
  embed        : parallel.batch._block_embed_batch
  extract      : parallel.batch._block_extract_batch (incl. message assembly)
  extract_noasm: ops.embed.extract_block_aligned only (no assembly)
  onehot_mm    : one-hot build + batched matmul alone (both directions' core)
  cycle        : fused embed+extract (the bench leg)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_block_variants5.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(name, fn, *args, floor=0.0, px=0):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    extra = ""
    if px and med > floor:
        extra = f", {px/(med-floor)/1e6:.0f} MPix/s floor-subtracted"
    print(f"{name}: compile {compile_s:.1f}s, rep {med*1e3:.1f} ms "
          f"(dev ~{(med-floor)*1e3:.1f}){extra}", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.ops import embed as embed_ops
    from codec_tcc_tpu.parallel.batch import (
        _block_embed_batch, _block_extract_batch,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h = w = 512
    block = 16
    nh, nw = h // block, w // block
    ntiles, bs = nh * nw, block * block
    n = h * w
    nbits, s = 4, 4
    lpad = 1 << 17
    px = B * n

    print(f"backend={jax.default_backend()} B={B} nbits={nbits}", flush=True)
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
    karange = jnp.arange(ntiles, dtype=jnp.int32)
    ks = bases // bs                       # (B, nbits, ntiles)
    chunks = jax.random.randint(
        jax.random.PRNGKey(2), (B, nbits, ntiles, bs), 0, 2,
        dtype=jnp.int32).astype(jnp.bfloat16)

    @jax.jit
    def floor_fn(imgs_):
        return jnp.sum(imgs_, dtype=jnp.float32)

    @jax.jit
    def embed_fn(imgs_, msgs_):
        st = _block_embed_batch(
            imgs_, msgs_, bases, lengths, offsets, s_d, nbits, block)
        return jnp.sum(st, dtype=jnp.float32)

    st_d = _block_embed_batch(
        imgs, msgs, bases, lengths, offsets, s_d, nbits, block)

    @jax.jit
    def extract_fn(st_):
        bits = _block_extract_batch(
            st_, bases, lengths, offsets, s_d, nbits, block, lpad)
        return jnp.sum(bits, dtype=jnp.float32)

    @jax.jit
    def extract_noasm_fn(st_):
        rows = jax.vmap(lambda a, b, c, d: embed_ops.extract_block_aligned(
            a, b, c, d, nbits, block))(st_, bases, lengths, s_d)
        return jnp.sum(rows, dtype=jnp.float32)

    @jax.jit
    def onehot_mm_fn(ks_, ch_):
        oh_ = (ks_[..., :, None] == karange[None, None, None, :]
               ).astype(jnp.bfloat16)
        out = jnp.einsum("bpij,bpjc->bpic", oh_, ch_,
                         preferred_element_type=jnp.float32)
        return jnp.sum((out > 0.5).astype(jnp.float32))

    @jax.jit
    def cycle_fn(imgs_, msgs_):
        st = _block_embed_batch(
            imgs_, msgs_, bases, lengths, offsets, s_d, nbits, block)
        bits = _block_extract_batch(
            st, bases, lengths, offsets, s_d, nbits, block, lpad)
        return jnp.sum(st, dtype=jnp.float32) + jnp.sum(bits, jnp.float32)

    fl = bench("floor", floor_fn, imgs)
    bench("embed", embed_fn, imgs, msgs, floor=fl, px=px)
    bench("extract", extract_fn, st_d, floor=fl, px=px)
    bench("extract_noasm", extract_noasm_fn, st_d, floor=fl, px=px)
    bench("onehot_mm", onehot_mm_fn, ks, chunks, floor=fl, px=px)
    bench("cycle", cycle_fn, imgs, msgs, floor=fl, px=px)


if __name__ == "__main__":
    main()
