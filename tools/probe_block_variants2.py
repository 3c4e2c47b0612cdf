"""Stage-isolated on-chip timings for block_adaptive formulations.

Measures separately (B=128, 512^2 u16, block 16, nbits=8):
  embed_rowgather   : chunk row gather + layout
  embed_matmul      : one-hot bf16 MXU permutation of message chunks
  extract_matmul    : one-hot bf16 MXU permutation of tile rows
  cycle_matmul      : both directions fused in one jit
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(name, fn, *args):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"{name}: compile {compile_s:.1f}s, rep {med*1e3:.1f} ms", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h = w = 512
    block = 16
    nh, nw = h // block, w // block
    ntiles, bs = nh * nw, block * block
    n = h * w
    nbits = 8
    s = 4

    print(f"backend={jax.default_backend()} B={B}", flush=True)
    imgs = jax.random.randint(jax.random.PRNGKey(0), (B, h, w), 0, 837,
                              dtype=jnp.int32).astype(jnp.uint16)
    msgs = jax.random.randint(jax.random.PRNGKey(1), (B, 1 << 19), 0, 2,
                              dtype=jnp.int32).astype(jnp.uint8)
    rng = np.random.default_rng(7)
    bases_np = np.stack([
        np.stack([rng.permutation(ntiles).astype(np.int32) * bs
                  for _ in range(nbits)])
        for _ in range(B)
    ])
    bases = jnp.asarray(bases_np)
    lengths = jnp.asarray(
        np.array([60000, 25000, 10000, 5000, 0, 0, 0, 0], np.int32))
    offsets = jnp.asarray(
        np.array([0, 60000, 85000, 95000, 0, 0, 0, 0], np.int32))

    def tiles_of(plane2d):
        return plane2d.reshape(nh, block, nw, block).transpose(0, 2, 1, 3).reshape(ntiles, bs)

    def untile(tiles):
        return tiles.reshape(nh, nw, block, block).transpose(0, 2, 1, 3).reshape(h, w)

    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    r2d = (y % block) * block + (x % block)
    karange = jnp.arange(ntiles, dtype=jnp.int32)

    def embed_core(img, msg, base, permute):
        acc = img
        for p in range(nbits):
            seg = jax.lax.dynamic_slice(msg, (offsets[p],), (n,))
            chunks = seg.reshape(ntiles, bs)
            k = base[p] // bs
            tile_bits = permute(chunks, k)
            bits2d = untile(tile_bits)
            base2d = jnp.broadcast_to(
                base[p].reshape(nh, 1, nw, 1), (nh, block, nw, block)
            ).reshape(h, w)
            active = (base2d + r2d < lengths[p]) & (p < s)
            keep = jnp.array(0xFFFF ^ (1 << p), jnp.uint16)
            acc = jnp.where(active, (acc & keep) | (bits2d.astype(jnp.uint16) << p), acc)
        return acc

    def perm_gather(chunks, k):
        return jnp.take(chunks, k, axis=0, mode="clip")

    def perm_matmul(chunks, k):
        onehot = (k[:, None] == karange[None, :]).astype(jnp.bfloat16)
        out = jnp.dot(onehot, chunks.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return (out > 0.5).astype(jnp.uint8)

    def extract_matmul(st, base):
        rows = []
        iota = jnp.arange(n, dtype=jnp.int32)
        for p in range(nbits):
            plane = ((st >> p) & 1).astype(jnp.bfloat16)
            tiles = tiles_of(plane)
            k = base[p] // bs          # tile t holds fill chunk k[t]
            onehot = (k[None, :] == karange[:, None]).astype(jnp.bfloat16)
            fill = jnp.dot(onehot, tiles, preferred_element_type=jnp.float32)
            fill = (fill > 0.5).astype(jnp.uint8).reshape(n)
            valid = (iota < lengths[p]) & (p < s)
            rows.append(jnp.where(valid, fill, 0))
        return jnp.stack(rows)

    em_g = jax.jit(jax.vmap(lambda im, mg, ba: embed_core(im, mg, ba, perm_gather)))
    em_m = jax.jit(jax.vmap(lambda im, mg, ba: embed_core(im, mg, ba, perm_matmul)))
    ex_m = jax.jit(jax.vmap(extract_matmul))

    @jax.jit
    def cyc_m(imgs, msgs):
        st = jax.vmap(lambda im, mg, ba: embed_core(im, mg, ba, perm_matmul))(imgs, msgs, bases)
        rows = jax.vmap(extract_matmul)(st, bases)
        return st, jnp.sum(rows, dtype=jnp.int32)

    # bit-exactness: matmul embed == gather embed on one image
    a = em_g(imgs[:1], msgs[:1], bases[:1])
    b = em_m(imgs[:1], msgs[:1], bases[:1])
    print(f"embed gather==matmul: {bool(jnp.all(a == b))}", flush=True)

    tg = bench("embed_rowgather", em_g, imgs, msgs, bases)
    tm = bench("embed_matmul", em_m, imgs, msgs, bases)
    tx = bench("extract_matmul", ex_m, imgs, bases)
    tc = bench("cycle_matmul", cyc_m, imgs, msgs)
    print(f"cycle_matmul: {B*n/tc/1e6:.0f} MPix/s", flush=True)


if __name__ == "__main__":
    main()
