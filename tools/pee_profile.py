"""On-chip PEE kernel stage profile: where do the cycle's milliseconds go?

The round-3 bench puts the fused PEE cycle (2 embed + 2 extract passes, one
dispatch) at ~2.1 GPix/s for 512^2 x B=256 — ~24 ms of device time after
subtracting the tunnel's fixed dispatch cost, i.e. ~45 GB/s of effective
HBM traffic against the v5e's ~800 GB/s roofline. This tool times each
pass in isolation (its own jit, so each figure carries one dispatch cost —
compare DELTAS, not absolutes) plus a memory-bound reference (the packed
LSB embed, measured near-roofline) at the same geometry, to attribute the
gap before optimizing kernel internals.

Run on the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/pee_profile.py [B]

Prints one JSON line per stage with ms/med and effective GPix/s.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def _time(fn, args, reps=5, inner=2):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


def main(B: int = 256, h: int = 512, w: int = 512) -> None:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        raise RuntimeError("run on the real chip")
    from bench import _pee_images_dev, _ship_bits
    from codec_tcc_tpu.ops import pallas_pee as pp

    n = h * w
    t, max_val = 2, 4095
    rng = np.random.default_rng(11)
    msgs = rng.integers(0, 2, size=(B, 1 << 17)).astype(np.uint8)
    want = jnp.full((B,), 100_000, jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    imgs3 = _pee_images_dev(B, h, w, 5, 800, 700, 61.0, 97.0, max_val)
    imgs3 = imgs3.reshape(B, n // 128, 128)
    msg2d, l2 = pp.prep_messages_device(_ship_bits(msgs), n)

    @jax.jit
    def e0(im3, ms):
        return pp.embed_pass_batch(im3, ms, zero, want, h, w, 0, t, max_val, l2)

    s0, o0, u0, n0 = e0(imgs3, msg2d)

    @jax.jit
    def e1(s0_, ms, u0_):
        return pp.embed_pass_batch(
            s0_, ms, u0_, want - u0_, h, w, 1, t, max_val, l2
        )

    s1, o1, u1, n1 = e1(s0, msg2d, u0)
    over = o0 | o1

    @jax.jit
    def x1(s1_, over_, n1_):
        return pp.extract_pass_batch(s1_, over_, n1_, h, w, 1, t, max_val)

    r1, g1, c1 = x1(s1, over, n1)

    @jax.jit
    def x0(r1_, over_, n0_):
        return pp.extract_pass_batch(r1_, over_, n0_, h, w, 0, t, max_val)

    @jax.jit
    def full(im3, ms):
        a0, b0, uu0, nn0 = pp.embed_pass_batch(
            im3, ms, zero, want, h, w, 0, t, max_val, l2)
        a1, b1, uu1, nn1 = pp.embed_pass_batch(
            a0, ms, uu0, want - uu0, h, w, 1, t, max_val, l2)
        ov = b0 | b1
        rr1, gg1, cc1 = pp.extract_pass_batch(a1, ov, nn1, h, w, 1, t, max_val)
        rr0, gg0, cc0 = pp.extract_pass_batch(rr1, ov, nn0, h, w, 0, t, max_val)
        return rr0, jnp.sum(cc0) + jnp.sum(cc1)

    # memory-bound reference at the same geometry: packed LSB embed
    from codec_tcc_tpu.ops import pallas_embed as pe

    st = jnp.zeros((B, 1), jnp.int32)
    ln = jnp.full((B, 1), 1024, jnp.int32)
    of = jnp.zeros((B, 1), jnp.int32)
    clear3, value3 = pe.preplace_packed_device(
        jnp.asarray(msgs[:, :2048]), st, ln, of, n, 1,
    )
    roof = jax.jit(pe.embed_batch_packed)

    px = B * n
    stages = [
        ("embed_pass0", lambda: _time(e0, (imgs3, msg2d))),
        ("embed_pass1", lambda: _time(e1, (s0, msg2d, u0))),
        ("extract_pass1", lambda: _time(x1, (s1, over, n1))),
        ("extract_pass0", lambda: _time(x0, (r1, over, n0))),
        ("full_cycle", lambda: _time(full, (imgs3, msg2d))),
        ("lsb_packed_roofline", lambda: _time(roof, (imgs3, clear3, value3))),
    ]
    rows = {}
    for name, fn in stages:
        sec = fn()
        rows[name] = sec
        print(json.dumps({
            "stage": name, "ms": round(1e3 * sec, 2),
            "gpix_s": round(px / sec / 1e9, 2),
        }), flush=True)
    dispatch = rows["lsb_packed_roofline"]  # ~tunnel floor + one mem pass
    per_pass = {
        k: round(1e3 * (rows[k] - dispatch), 2)
        for k in ("embed_pass0", "embed_pass1", "extract_pass0", "extract_pass1")
    }
    print(json.dumps({"per_pass_ms_minus_roofline": per_pass,
                      "sum_passes_ms": round(1e3 * sum(
                          rows[k] for k in per_pass), 2),
                      "full_cycle_ms": round(1e3 * rows["full_cycle"], 2)}),
          flush=True)

    # tile-size sweep: the kernels' bound is the per-grid-step floor, so the
    # cycle should speed up almost linearly with tile_px until VMEM or the
    # remote compiler pushes back (it 500s on multi-MB blocks — a failed
    # size prints as unsupported rather than killing the sweep)
    for tile in (131072, 262144):
        if n % tile:
            continue
        try:
            m2, l2b = pp.prep_messages_device(_ship_bits(msgs), n, tile)

            @jax.jit
            def fullt(im3, ms, _tile=tile, _l2=l2b):
                a0, b0, uu0, nn0 = pp.embed_pass_batch(
                    im3, ms, zero, want, h, w, 0, t, max_val, _l2,
                    tile_px=_tile)
                a1, b1, uu1, nn1 = pp.embed_pass_batch(
                    a0, ms, uu0, want - uu0, h, w, 1, t, max_val, _l2,
                    tile_px=_tile)
                ov = b0 | b1
                rr1, gg1, cc1 = pp.extract_pass_batch(
                    a1, ov, nn1, h, w, 1, t, max_val, tile_px=_tile)
                rr0, gg0, cc0 = pp.extract_pass_batch(
                    rr1, ov, nn0, h, w, 0, t, max_val, tile_px=_tile)
                return rr0, jnp.sum(cc0) + jnp.sum(cc1)

            sec = _time(fullt, (imgs3, m2))
            ok = bool(jnp.all(fullt(imgs3, m2)[0] == imgs3))
            print(json.dumps({
                "stage": f"full_cycle_tile{tile}", "ms": round(1e3 * sec, 2),
                "gpix_s": round(px / sec / 1e9, 2), "restore_ok": ok,
            }), flush=True)
        except Exception as exc:  # remote-compile VMEM rejection etc.
            print(json.dumps({
                "stage": f"full_cycle_tile{tile}",
                "error": f"{type(exc).__name__}: {str(exc)[:200]}",
            }), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
