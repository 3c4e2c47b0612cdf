"""Probe: which batched tile-popcount formulation compiles fast on chip?

The jitted (B=128, P=4, 512, 512) bit-expand + reshape-sum took 123-413 s
of remote compile. Candidates: reduce_window, uint8 reshape-sum, per-plane
scan. Prints compile + run time per variant.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402


def t(name, fn, *args):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    r = time.perf_counter() - t0
    print(f"{name}: compile+first {c:.1f}s, rep {r*1e3:.1f} ms", flush=True)
    return np.asarray(out)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    B, P, h, w, block = 128, 4, 512, 512, 16
    nh, nw = h // block, w // block
    imgs = jax.random.randint(jax.random.PRNGKey(0), (B, h, w), 0, 837,
                              dtype=jnp.int32).astype(jnp.uint16)
    print(f"backend={jax.default_backend()}", flush=True)

    @partial(jax.jit, static_argnames=("p", "blk"))
    def v_reshape_u8(im, p, blk):
        sh = jnp.arange(p, dtype=jnp.int32).reshape(1, p, 1, 1)
        bits = ((im[:, None].astype(jnp.int32) >> sh) & 1).astype(jnp.uint8)
        return bits.reshape(B, p, nh, blk, nw, blk).astype(jnp.int32).sum(
            axis=(3, 5))

    @partial(jax.jit, static_argnames=("p", "blk"))
    def v_reduce_window(im, p, blk):
        sh = jnp.arange(p, dtype=jnp.int32).reshape(1, p, 1, 1)
        bits = ((im[:, None].astype(jnp.int32) >> sh) & 1)
        return jax.lax.reduce_window(
            bits, 0, jax.lax.add,
            (1, 1, blk, blk), (1, 1, blk, blk), "VALID")

    @partial(jax.jit, static_argnames=("p", "blk"))
    def v_two_step(im, p, blk):
        sh = jnp.arange(p, dtype=jnp.int32).reshape(1, p, 1, 1)
        bits = ((im[:, None].astype(jnp.int32) >> sh) & 1)
        a = bits.reshape(B, p, nh, blk, w).sum(axis=3)      # rows first
        return a.reshape(B, p, nh, nw, blk).sum(axis=4)

    r1 = t("reshape_u8", v_reshape_u8, imgs, P, block)
    r2 = t("reduce_window", v_reduce_window, imgs, P, block)
    r3 = t("two_step", v_two_step, imgs, P, block)
    print("agree:", np.array_equal(r1, r2) and np.array_equal(r2, r3),
          flush=True)


if __name__ == "__main__":
    main()
