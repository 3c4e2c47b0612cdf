"""On-chip block_adaptive kernel stage profile: where do the cycle's
milliseconds go, and what bounds them?

The block tier's fused cycle (MXU one-hot permutation embed + extraction,
``parallel.batch._block_embed_batch`` / ``_block_extract_batch``) sits well
under the packed raster tier on identical pixels. This tool attributes the
gap on real hardware (the PEE treatment, VERDICT round-4 weak #2): each
stage in its own jit — compare DELTAS against the dispatch floor, not
absolutes — plus isolated microbenches of the cycle's three ingredient
families (one-hot builds, permutation matmuls, masked elementwise sweeps)
and an int8-vs-bf16 MXU A/B for the permutation route.

Also doubles as the forced-sync methodology reference: every stage returns
a device scalar consumed on host (`float(...)`) because block_until_ready
can resolve on dispatch ACK over the dev tunnel (a 128 MB XOR sweep once
"repped" 0.0 ms through it).

Run on the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/block_profile.py [B]

Prints one JSON line per stage with ms and effective GPix/s.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def _time(fn, args, reps=5, inner=2):
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def _sync(out) -> float:
    leaf = out[-1] if isinstance(out, (tuple, list)) else out
    return float(leaf)


def main(B: int = 256, h: int = 512, w: int = 512, block: int = 16) -> None:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        raise RuntimeError("run on the real chip")
    from bench import _pee_images_dev, _ship_bits
    from codec_tcc_tpu.ops import segments as segment_ops
    from codec_tcc_tpu.ops import pallas_embed as pe
    from codec_tcc_tpu.parallel.batch import (
        _batch_block_bases, _block_embed_batch, _block_extract_batch,
    )

    n = h * w
    s, nbits = 4, 4
    ntiles = (h // block) * (w // block)
    bs = block * block
    payload_bits = 100_000
    rng = np.random.default_rng(3)
    imgs_dev = _pee_images_dev(B, h, w, 2, 400, 300, 37.0, 53.0, 836)
    plan = segment_ops.distribute_segments(s, payload_bits, 42)
    ppl = segment_ops.raster_plane_plan(plan, n, nbits, 0, True)
    lengths = jnp.asarray(np.tile(ppl.lengths, (B, 1)))
    offsets = jnp.asarray(np.tile(ppl.offsets, (B, 1)))
    s_d = jnp.full((B,), s, jnp.int32)
    lpad = 1 << 17
    msgs_d = _ship_bits(rng.integers(0, 2, size=(B, lpad)).astype(np.uint8))
    bases = jnp.asarray(_batch_block_bases(
        imgs_dev, nbits, np.full(B, s, np.int32), block, h, w
    ))
    px = B * n

    # --- production routes ---------------------------------------------
    # round 5: host-pre-sliced message rows (static offsets here) + the
    # all-MXU extract assembly; the *_dynslice stages keep the replaced
    # dynamic formulations measurable for the A/B record
    ntiles_i = ntiles
    offs_np = [int(v) for v in ppl.offsets]

    @jax.jit
    def build_rows(msgs):
        def one(mg):
            ext = jnp.concatenate([mg, jnp.zeros(n, mg.dtype)])
            return jnp.stack([
                ext[offs_np[p] : offs_np[p] + n].reshape(ntiles_i, bs)
                for p in range(nbits)
            ])
        return jax.vmap(one)(msgs)

    mrows_d = build_rows(msgs_d)
    jax.block_until_ready(mrows_d)
    dummy_msgs = jnp.zeros((B, 8), jnp.uint8)

    # NOTE: mrows (268 MB at B=256) must ride as a jit ARGUMENT — a closure
    # capture bakes it into the program and the remote compiler 413s
    # (CLAUDE.md)
    @jax.jit
    def full_cycle(imgs, mrows):
        stego = _block_embed_batch(
            imgs, dummy_msgs, bases, lengths, offsets, s_d, nbits, block,
            mrows)
        bits = _block_extract_batch(
            stego, bases, lengths, offsets, s_d, nbits, block, lpad)
        return stego, jnp.sum(bits, dtype=jnp.int32)

    @jax.jit
    def full_cycle_dynslice(imgs, msgs):
        stego = _block_embed_batch(
            imgs, msgs, bases, lengths, offsets, s_d, nbits, block)
        bits = _block_extract_batch(
            stego, bases, lengths, offsets, s_d, nbits, block, lpad)
        return stego, jnp.sum(bits, dtype=jnp.int32)

    @jax.jit
    def embed_only(imgs, mrows):
        stego = _block_embed_batch(
            imgs, dummy_msgs, bases, lengths, offsets, s_d, nbits, block,
            mrows)
        return jnp.sum(stego, dtype=jnp.int32)

    stego_d = _block_embed_batch(
        imgs_dev, dummy_msgs, bases, lengths, offsets, s_d, nbits, block,
        mrows_d)
    jax.block_until_ready(stego_d)

    @jax.jit
    def extract_only(stego):
        bits = _block_extract_batch(
            stego, bases, lengths, offsets, s_d, nbits, block, lpad)
        return jnp.sum(bits, dtype=jnp.int32)

    # --- floors / rooflines ---------------------------------------------
    floor_fn = jax.jit(lambda im: jnp.sum(im, dtype=jnp.float32))

    # memory-bound reference at the same geometry: packed LSB cycle
    st1 = jnp.zeros((B, 1), jnp.int32)
    ln1 = jnp.full((B, 1), 1024, jnp.int32)
    of1 = jnp.zeros((B, 1), jnp.int32)
    clear3, value3 = pe.preplace_packed_device(
        msgs_d[:, :2048], st1, ln1, of1, n, 1)
    imgs3 = imgs_dev.reshape(B, n // 128, 128)

    @jax.jit
    def lsb_packed_cycle(im3, cl, vl):
        stego = pe.embed_batch_packed(im3, cl, vl)
        packed = pe.extract_packed_batch(stego, nbits)
        return jnp.sum(packed, dtype=jnp.int32)

    # --- ingredient microbenches ----------------------------------------
    k_idx = (bases // bs).astype(jnp.int32)          # (B, nbits, ntiles)
    karange = jnp.arange(ntiles, dtype=jnp.int32)
    rows_u8 = jnp.asarray(
        rng.integers(0, 2, size=(B, nbits, ntiles, bs)).astype(np.uint8))

    def _onehots(kk, dt):
        return (kk[..., :, None] == karange[None, None, None, :]).astype(dt)

    @jax.jit
    def onehot_only(kk):
        # materialize all 2*P one-hots per image (embed + transposed
        # extract direction) and reduce — isolates the compare+cast sweeps
        oh1 = _onehots(kk, jnp.int8)
        oh2 = jnp.swapaxes(oh1, -1, -2)
        return jnp.sum(oh1, dtype=jnp.int32) + jnp.sum(oh2, dtype=jnp.int32)

    def _permute_all(kk, rows, dt, acc_dt):
        oh = _onehots(kk, dt)
        fwd = jnp.einsum("bptu,bpuc->bptc", oh, rows.astype(dt),
                         preferred_element_type=acc_dt)
        bwd = jnp.einsum("bput,bpuc->bptc", oh, rows.astype(dt),
                         preferred_element_type=acc_dt)
        return jnp.sum(fwd, dtype=jnp.int32) + jnp.sum(bwd, dtype=jnp.int32)

    @jax.jit
    def matmul_int8(kk, rows):
        return _permute_all(kk, rows, jnp.int8, jnp.int32)

    @jax.jit
    def matmul_bf16(kk, rows):
        return _permute_all(kk, rows, jnp.bfloat16, jnp.float32)

    @jax.jit
    def msgslice_only(msgs):
        # the per-plane message window slice under vmap: per-image offsets
        # make lax.dynamic_slice a BATCHED GATHER of n elements per (image,
        # plane) — isolate it to see whether XLA serializes it the way it
        # serializes arbitrary-index row gathers
        def one(mg, of):
            msg_ext = jnp.concatenate([mg, jnp.zeros(n, mg.dtype)])
            acc = jnp.int32(0)
            for p in range(nbits):
                seg = jax.lax.dynamic_slice(msg_ext, (of[p],), (n,))
                acc = acc + jnp.sum(seg, dtype=jnp.int32)
            return acc

        return jnp.sum(jax.vmap(one)(msgs, offsets), dtype=jnp.int32)

    @jax.jit
    def elementwise_only(imgs, msgs):
        # the embed minus its matmuls: dynamic_slice + tile relayout + the
        # per-plane masked combines, with the permutation as identity
        from codec_tcc_tpu.ops.embed import (
            _dtype_keep_mask, _tiles_of, _untile)

        def one(im, mg, ln, of, ss):
            msg_ext = jnp.concatenate([mg, jnp.zeros(n, mg.dtype)])
            tacc = _tiles_of(im, block)
            r = jnp.arange(bs, dtype=jnp.int32)[None, :]
            base_col = jnp.arange(ntiles, dtype=jnp.int32)[:, None] * bs
            for p in range(nbits):
                seg = jax.lax.dynamic_slice(msg_ext, (of[p],), (n,))
                bits_t = seg.reshape(ntiles, bs)
                active = (base_col + r < ln[p]) & (p < ss)
                newv = (tacc & _dtype_keep_mask(im.dtype, p)) | (
                    bits_t.astype(im.dtype) << p)
                tacc = jnp.where(active, newv, tacc)
            return _untile(tacc, h, w, block)

        out = jax.vmap(one)(imgs, msgs, lengths, offsets, s_d)
        return jnp.sum(out, dtype=jnp.int32)

    stages = [
        ("sync_floor", floor_fn, (imgs_dev,)),
        ("lsb_packed_cycle_roofline", lsb_packed_cycle, (imgs3, clear3, value3)),
        ("full_cycle", full_cycle, (imgs_dev, mrows_d)),
        ("full_cycle_dynslice", full_cycle_dynslice, (imgs_dev, msgs_d)),
        ("embed_only", embed_only, (imgs_dev, mrows_d)),
        ("extract_only", extract_only, (stego_d,)),
        ("onehot_only", onehot_only, (k_idx,)),
        ("msgslice_only", msgslice_only, (msgs_d,)),
        ("matmul_int8", matmul_int8, (k_idx, rows_u8)),
        ("matmul_bf16", matmul_bf16, (k_idx, rows_u8)),
        ("elementwise_only", elementwise_only, (imgs_dev, msgs_d)),
    ]
    rows = {}
    for name, fn, args in stages:
        try:
            sec = _time(fn, args)
        except Exception as exc:
            print(json.dumps({"stage": name,
                              "error": f"{type(exc).__name__}: "
                                       f"{str(exc)[:200]}"}), flush=True)
            continue
        rows[name] = sec
        print(json.dumps({
            "stage": name, "ms": round(1e3 * sec, 2),
            "gpix_s": round(px / sec / 1e9, 2),
        }), flush=True)
    if "full_cycle" in rows and "sync_floor" in rows:
        fl = rows["sync_floor"]
        print(json.dumps({
            "summary_ms_minus_floor": {
                k: round(1e3 * (v - fl), 2)
                for k, v in rows.items() if k != "sync_floor"
            },
            "cycle_mpix_s": round(px / rows["full_cycle"] / 1e6, 1),
            "device_mpix_s": round(px / max(rows["full_cycle"] - fl, 1e-9) / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
