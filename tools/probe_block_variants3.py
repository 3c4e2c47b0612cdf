"""On-chip probe: combined-word block_adaptive vs the shipped per-plane route.

The shipped MXU route (ops/embed.py, round 4) does one one-hot permutation
matmul PER PLANE plus per-plane untile/mask/where chains. This probes folding
all planes into ONE matmul per direction:

  embed : out = oh_cat @ [bits_chunks | mask_chunks]
          oh_cat[t, p*ntiles + i] = 2^p if k_p[t] == i else 0
          -> out[:, :bs] is the combined bits word (sum_p 2^p * bit_p),
             out[:, bs:] the combined active-mask word; ONE untile each and
             ONE fused apply  acc = (acc & ~mask) | (bits & mask)
  extract: word = stego & (2^nbits - 1)  (one tiles_of relayout total);
          out = ohT_cat @ tiles_word, rows p*ntiles.. hold plane p's fill
          permutation; bit p peels off with (>> p) & 1.

Exactness: one-hot entries are 0 or 2^p <= 128 (bf16-exact), word values
<= 2^nbits - 1 <= 255 (bf16-exact operand, f32-exact accumulation), each
output element is a dot with exactly nbits nonzero terms of disjoint bits.
Gate: nbits <= 8.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_block_variants3.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(name, fn, *args, reps=5):
    """Forced host sync: every fn returns a tuple ending in a device scalar
    (block_until_ready ACKs on dispatch over the dev tunnel — bench._sync)."""
    t0 = time.perf_counter()
    out = fn(*args)
    float(out[-1] if isinstance(out, tuple) else out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[-1] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(f"{name}: compile {compile_s:.1f}s, rep {med*1e3:.1f} ms "
          f"(all {[round(t*1e3, 1) for t in times]})", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.parallel.batch import (
        _block_embed_batch, _block_extract_batch,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    h = w = 512
    block = 16
    nh, nw = h // block, w // block
    ntiles, bs = nh * nw, block * block
    n = h * w
    nbits = 4
    s = 4
    lpad = 1 << 17

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
    lengths1 = np.array([60000, 25000, 10000, 5000], np.int32)
    offsets1 = np.array([0, 60000, 85000, 95000], np.int32)
    lengths = jnp.asarray(np.tile(lengths1, (B, 1)))
    offsets = jnp.asarray(np.tile(offsets1, (B, 1)))
    s_d = jnp.full((B,), s, jnp.int32)

    karange = jnp.arange(ntiles, dtype=jnp.int32)
    iota_bs = jnp.arange(bs, dtype=jnp.int32)
    word_mask = jnp.uint16((1 << nbits) - 1)

    def tiles_of(plane2d):
        return (plane2d.reshape(nh, block, nw, block)
                .transpose(0, 2, 1, 3).reshape(ntiles, bs))

    def untile(tiles):
        return (tiles.reshape(nh, nw, block, block)
                .transpose(0, 2, 1, 3).reshape(h, w))

    def embed_word(img, msg, base, lens, offs):
        msg_ext = jnp.concatenate([msg, jnp.zeros(n, msg.dtype)])
        fillrank = karange[:, None] * bs + iota_bs[None, :]
        chunk_rows = []
        oh_rows = []
        for p in range(nbits):
            seg = jax.lax.dynamic_slice(msg_ext, (offs[p],), (n,))
            bitsc = seg.reshape(ntiles, bs)
            maskc = (fillrank < lens[p]).astype(jnp.uint8)
            chunk_rows.append(jnp.concatenate([bitsc, maskc], axis=1))
            k = base[p].astype(jnp.int32) // bs
            oh_rows.append(
                (k[:, None] == karange[None, :]).astype(jnp.bfloat16) * (1 << p)
            )
        rhs = jnp.concatenate(chunk_rows, axis=0).astype(jnp.bfloat16)
        oh_cat = jnp.concatenate(oh_rows, axis=1)
        out = jnp.dot(oh_cat, rhs, preferred_element_type=jnp.float32)
        bits_w = untile(out[:, :bs]).astype(jnp.uint16)
        mask_w = untile(out[:, bs:]).astype(jnp.uint16)
        return (img & ~mask_w) | (bits_w & mask_w)

    def extract_word(st, base, lens):
        word = (st & word_mask).astype(jnp.bfloat16)
        tiles = tiles_of(word)
        oh_rows = []
        for p in range(nbits):
            k = base[p].astype(jnp.int32) // bs
            oh_rows.append((k[None, :] == karange[:, None]).astype(jnp.bfloat16))
        ohT_cat = jnp.concatenate(oh_rows, axis=0)
        out = jnp.dot(ohT_cat, tiles,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
        iota = jnp.arange(n, dtype=jnp.int32)
        rows = []
        for p in range(nbits):
            fill = (out[p * ntiles:(p + 1) * ntiles].reshape(n) >> p) & 1
            rows.append(jnp.where(iota < lens[p], fill.astype(jnp.uint8), 0))
        return jnp.stack(rows)

    em_w = jax.jit(jax.vmap(embed_word))
    ex_w = jax.jit(jax.vmap(extract_word))

    @jax.jit
    def floor_fn(imgs_):
        return jnp.sum(imgs_, dtype=jnp.float32)

    @jax.jit
    def em_w_t(imgs_, msgs_):
        st = jax.vmap(embed_word)(imgs_, msgs_, bases, lengths, offsets)
        return st, jnp.sum(st, dtype=jnp.int32)

    @jax.jit
    def ex_w_t(st_):
        rows = jax.vmap(extract_word)(st_, bases, lengths)
        return rows, jnp.sum(rows, dtype=jnp.int32)

    @jax.jit
    def cyc_w(imgs_, msgs_):
        st = jax.vmap(embed_word)(imgs_, msgs_, bases, lengths, offsets)
        rows = jax.vmap(extract_word)(st, bases, lengths)
        return st, jnp.sum(rows, dtype=jnp.int32)

    @jax.jit
    def cyc_prod(imgs_, msgs_):
        st = _block_embed_batch(
            imgs_, msgs_, bases, lengths, offsets, s_d, nbits, block)
        bits = _block_extract_batch(
            st, bases, lengths, offsets, s_d, nbits, block, lpad)
        return st, jnp.sum(bits, dtype=jnp.int32)

    # bit-exactness vs the shipped route on a small slice
    st_prod = _block_embed_batch(
        imgs[:2], msgs[:2], bases[:2], lengths[:2], offsets[:2], s_d[:2],
        nbits, block)
    st_word = em_w(imgs[:2], msgs[:2], bases[:2], lengths[:2], offsets[:2])
    print(f"embed word==prod: {bool(jnp.all(st_prod == st_word))}", flush=True)
    from codec_tcc_tpu.ops.embed import extract_block_aligned
    al_prod = jax.vmap(lambda a, b, c, d: extract_block_aligned(
        a, b, c, d, nbits, block))(st_prod, bases[:2], lengths[:2], s_d[:2])
    al_word = ex_w(st_word, bases[:2], lengths[:2])
    print(f"extract word==prod: {bool(jnp.all(al_prod == al_word))}", flush=True)

    tf = bench("floor", floor_fn, imgs)
    bench("embed_word", em_w_t, imgs, msgs)
    bench("extract_word", ex_w_t, imgs.astype(jnp.uint16))
    tw = bench("cycle_word", cyc_w, imgs, msgs)
    print(f"cycle_word: {B*n/tw/1e6:.0f} MPix/s raw, device "
          f"{B*n/max(tw-tf, 1e-9)/1e6:.0f} MPix/s "
          f"({1e3*(tw-tf):.1f} ms)", flush=True)
    tp = bench("cycle_prod", cyc_prod, imgs, msgs)
    print(f"cycle_prod: {B*n/tp/1e6:.0f} MPix/s raw, device "
          f"{B*n/max(tp-tf, 1e-9)/1e6:.0f} MPix/s "
          f"({1e3*(tp-tf):.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
