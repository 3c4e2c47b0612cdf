"""Benchmark: embed+extract throughput per chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's measured single-thread CPU embed+merge throughput of
~10.3 MPix/s on pe.dcm-like uint16 images (BASELINE.md, measured by executing
/root/reference/src/codec.py:412-487 this session; the reference publishes no
numbers of its own). North star: >= 1 GPix/s/chip (BASELINE.json).

Method: a batch of 512x512 uint16 images (pe.dcm replicated with varied
payloads) runs the full fused device cycle — multi-plane embed, XOR location
maps, extraction — with all inputs device-resident; pixels are counted once
per embed+extract cycle. Median of timed repeats after warmup.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def probe_contention() -> list:
    """Shared competing-python probe (utils/env.py; lazy import keeps the
    bench's startup free of the package->jax import chain)."""
    from codec_tcc_tpu.utils.env import probe_contention as _probe

    return _probe()


def _ship_bits(msgs: np.ndarray):
    """Upload message BITS 8x packed and unpack on device: the dev tunnel's
    relay degrades to single-digit MB/s at times, and a 0/1 uint8 tensor is
    87% dead weight on the wire. Returns a device (B, L) uint8 array equal
    to ``msgs``."""
    import jax
    import jax.numpy as jnp

    b, l = msgs.shape
    lp = (l + 7) // 8 * 8
    padded = msgs if lp == l else np.pad(msgs, ((0, 0), (0, lp - l)))
    pk = jax.device_put(jnp.asarray(np.packbits(padded, axis=1)))
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = ((pk[:, :, None] >> shifts) & 1).astype(jnp.uint8).reshape(b, lp)
    return bits[:, :l]


def _tile_plan(plan1, payloads, B: int):
    """Replicate a single-image BatchPlan across ``B`` images that share its
    pixel statistics, with per-image payload contents. plan rows are pure
    window geometry and msgs rows are raw payload bits (plan_batch), so the
    tiled plan is exactly what plan_batch(B images) would produce — without
    plan_batch's B-image histogram pass (a ~67 MB device round-trip for
    uint16 batches that a degraded tunnel turns into minutes)."""
    from codec_tcc_tpu.parallel.batch import BatchPlan

    pb = int(plan1.payload_bits[0])
    msgs = np.zeros((B, plan1.lpad), np.uint8)
    for i, p in enumerate(payloads):
        msgs[i, : p.size] = p
    return BatchPlan(
        s=np.repeat(plan1.s, B),
        starts=np.tile(plan1.starts, (B, 1)),
        lengths=np.tile(plan1.lengths, (B, 1)),
        offsets=np.tile(plan1.offsets, (B, 1)),
        msgs=msgs,
        payload_bits=np.full(B, pb, np.int64),
        nbits=plan1.nbits, lpad=plan1.lpad,
    )


def _sync(out) -> float:
    """Force TRUE device completion after a timed call.

    jax.block_until_ready can resolve on dispatch ACK over the dev tunnel
    rather than on device completion (measured on chip: a 128 MB XOR sweep
    "repped" 0.0 ms through it, and 26.9 ms minutes earlier for identical
    work — round-4 probe, methodology kept in tools/block_profile.py).
    Pulling one device SCALAR to host cannot
    complete before the compute that produced it, and the in-order stream
    means everything enqueued earlier finished too (CLAUDE.md's recipe).
    Every timed cycle in this file therefore returns a reduction scalar as
    its last element, and timing loops end here instead of block_until_ready.
    """
    leaf = out[-1] if isinstance(out, (tuple, list)) else out
    return float(leaf)


def main(backend: str = "auto") -> None:
    t_start = time.perf_counter()
    import sys as _sys

    hl_stage = {}
    _hl_t = [t_start]

    def _hl(name: str) -> None:
        """Headline-phase sub-stage wall clock (stderr + artifact): remote
        compiles over the dev tunnel can each eat minutes, and the round-3
        649 s headline phase was otherwise unattributable."""
        now = time.perf_counter()
        hl_stage[name] = round(now - _hl_t[0], 1)
        _hl_t[0] = now
        print(f"[bench] headline/{name}: {hl_stage[name]}s",
              file=_sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.io import dicom
    from codec_tcc_tpu.parallel import batch as batch_par

    _hl("imports")

    # B=256: the round-3 dispatch sweep (tools/sweep_dispatch.py) measured a
    # fixed ~6-8 ms per-dispatch cost on the dev tunnel that dominates small
    # batches — 512^2 LSB cycles measured 3.2 GPix/s at B=128, 5.5 at B=256,
    # 8.1 at B=512.  B=256 balances amortization against host prep time
    # (plan_batch + preplace_bits run on this box's single CPU core).
    B = 256
    image, _ = dicom.load_image("/root/reference/images/pe.dcm")
    h, w = image.shape
    rng = np.random.default_rng(0)
    # Plan on ONE LSB-noised image and tile: every batch image shares its
    # pixel statistics, so the tiled plan equals plan_batch(B images) while
    # moving ~500 KB over the link instead of the B-image histogram pass.
    img0 = image ^ rng.integers(0, 2, size=image.shape).astype(np.uint16)
    payloads = [rng.integers(0, 2, size=100_000).astype(np.uint8) for _ in range(B)]
    plan1 = batch_par.plan_batch(img0[None], payloads[:1], EncodeConfig(beta=0.4))
    plan = _tile_plan(plan1, payloads, B)
    _hl("plan")

    from codec_tcc_tpu.ops import embed as embed_ops
    from codec_tcc_tpu.ops import pallas_embed as pe

    nbits = plan.nbits
    n = h * w
    # batch images are BUILT ON DEVICE (base upload + per-image device-RNG
    # LSB noise so no degenerate constant-batch optimization applies): the
    # host-built batch was 134 MB of device_put, minutes on a degraded link
    base_d = jax.device_put(jnp.asarray(image))
    noise = jax.jit(
        lambda k: jax.random.bits(k, (B, h, w), dtype=jnp.uint16) & 1
    )(jax.random.PRNGKey(0))
    imgs_dev3 = jax.jit(
        lambda bs, nz: (bs[None] ^ nz).reshape(B, n // 128, 128)
    )(base_d, noise)
    jax.block_until_ready(imgs_dev3)
    _hl("batch_build")
    tile = pe.preferred_tile(n)
    use_packed = (
        backend in ("auto", "packed")
        and jax.default_backend() == "tpu" and n % 128 == 0
    )
    # each failed tier falls back one step in-process:
    # packed -> preplaced -> windowed -> XLA (~717)
    use_preplaced = (
        backend in ("auto", "packed", "preplaced")
        and jax.default_backend() == "tpu" and tile > 0
    )
    use_pallas = (
        backend in ("auto", "packed", "preplaced", "pallas")
        and jax.default_backend() == "tpu" and tile > 0
    )

    starts_d = jax.device_put(jnp.asarray(plan.starts))
    lengths_d = jax.device_put(jnp.asarray(plan.lengths))
    offsets_d = jax.device_put(jnp.asarray(plan.offsets))

    def build_packed():
        # fastest tier (round 3): all NP plane windows folded into per-pixel
        # clear/value words ON DEVICE (only the 8x-packed payload bits cross
        # the link), so embed is (img & ~clear) | value and extract is a
        # masked narrowing copy — XLA fuses both to single HBM-bound sweeps
        # (~94 GPix/s marginal rate on v5e: hardware speed-of-light; no
        # Mosaic kernel needed once the structure is preplaced)
        msgs_dev = _ship_bits(batch_par._msg_prefix(plan))
        cl_d, vl_d = pe.preplace_packed_device(
            msgs_dev, starts_d, lengths_d, offsets_d, n, nbits
        )

        @jax.jit
        def cycle(im, cl, vl, st, ln, of):
            stego = pe.embed_batch_packed(im, cl, vl)
            packed = pe.extract_packed_batch(stego, nbits)
            return stego, jnp.sum(packed, dtype=jnp.int32)

        args = (imgs_dev3, cl_d, vl_d, starts_d, lengths_d, offsets_d)
        return cycle, args

    def build_preplaced():
        # plane bits at raster positions (device relayout from the packed
        # payload upload), kernels are pure streaming arithmetic — no DMA
        # windows, no rotations
        msgs_dev = _ship_bits(batch_par._msg_prefix(plan))
        bits_d = pe.preplace_bits_device(
            msgs_dev, starts_d, lengths_d, offsets_d, n, nbits, n
        )

        def cycle(im, bt, st, ln, of):
            stego = pe.embed_batch_preplaced(im, bt, st, ln, nbits, tile)
            rows = pe.extract_raster_batch(stego, st, ln, nbits, tile)
            return stego, jnp.sum(rows, dtype=jnp.int32)

        args = (imgs_dev3, bits_d, starts_d, lengths_d, offsets_d)
        return cycle, args

    def build_pallas():
        # fused Pallas kernels over the relayout-free padded flat layout;
        # the strided message buffer is mostly zeros, so ship it 8x packed
        msg2d, l2 = pe.shift_messages_2d(plan.msgs, n)
        msgs_d = _ship_bits(msg2d.reshape(1, -1)).reshape(msg2d.shape)

        def cycle(im, ms, st, ln, of):
            padded = pe.embed_batch_padded(im, ms, st, ln, of, nbits, tile, l2)
            aligned = pe.extract_aligned_batch_padded(padded, st, ln, nbits, n, tile)
            # fold bits so extraction cannot be dead-code eliminated
            return padded, jnp.sum(aligned, dtype=jnp.int32)

        args = (imgs_dev3, msgs_d, starts_d, lengths_d, offsets_d)
        return cycle, args
    def build_xla():
        imgs_d = imgs_dev3.reshape(B, h, w)
        msgs_d = _ship_bits(plan.msgs)
        s_d = jax.device_put(jnp.asarray(plan.s))

        @jax.jit
        def cycle(im, ms, st, ln, of):
            stego = jax.vmap(
                embed_ops.embed, in_axes=(0, 0, 0, 0, 0, 0, None)
            )(im, ms, st, ln, of, s_d, nbits)
            aligned = jax.vmap(
                embed_ops.extract_aligned, in_axes=(0, 0, 0, 0, None)
            )(stego, st, ln, s_d, nbits)
            return stego, jnp.sum(aligned, dtype=jnp.int32)

        args = (imgs_d, msgs_d, starts_d, lengths_d, offsets_d)
        return cycle, args

    # warmup / compile; the experimental TPU tunnel sporadically ABORTS
    # Pallas launches — fall back to the XLA kernels so the bench always
    # reports a number. Which tier actually ran is RECORDED in the JSON
    # (`backend` field + `fallbacks` in extra): the round-2 verdict found the
    # silent stderr-only fallback made the headline number's provenance
    # invisible in the driver artifact.
    contention = probe_contention()
    fallbacks = []
    ran_backend = None
    cycle = None
    if use_packed:
        try:
            cycle, args = build_packed()
            stego, chk = cycle(*args)
            _sync(chk)
            ran_backend = "packed"
        except Exception as exc:
            fallbacks.append(f"packed: {type(exc).__name__}: {exc}"[:200])
            print(f"packed path failed ({type(exc).__name__}); "
                  f"falling back", file=_sys.stderr)
            cycle = None
    if cycle is None and use_preplaced:
        try:
            cycle, args = build_preplaced()
            stego, chk = cycle(*args)
            _sync(chk)
            ran_backend = "preplaced"
        except Exception as exc:
            fallbacks.append(f"preplaced: {type(exc).__name__}: {exc}"[:200])
            print(f"preplaced path failed ({type(exc).__name__}); "
                  f"falling back", file=_sys.stderr)
            cycle = None
    if cycle is None and use_pallas:
        try:
            cycle, args = build_pallas()
            stego, chk = cycle(*args)
            _sync(chk)
            ran_backend = "pallas"
        except Exception as exc:
            fallbacks.append(f"pallas: {type(exc).__name__}: {exc}"[:200])
            print(f"pallas path failed ({type(exc).__name__}); "
                  f"falling back to XLA kernels", file=_sys.stderr)
            cycle = None
    if cycle is None:
        cycle, args = build_xla()
        stego, chk = cycle(*args)
        _sync(chk)
        ran_backend = "xla"
    _hl("tier_warmup")

    # Tunnel sync floor THIS RUN: a jitted scalar reduction over the already
    # device-resident batch is pure dispatch + 4-byte result round-trip
    # (device work < 1 ms). Measured 7-28 ms across days for identical work
    # (tools/block_profile.py) — the artifact carries it so every cycle
    # number can be read against the run's tunnel health.
    floor_fn = jax.jit(lambda im: jnp.sum(im, dtype=jnp.float32))
    _sync(floor_fn(imgs_dev3))
    floor_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(floor_fn(imgs_dev3))
        floor_times.append(time.perf_counter() - t0)
    sync_floor_ms = round(1e3 * float(np.median(floor_times)), 2)
    _hl("sync_floor")

    times = []
    reps = 5
    inner = 4
    # inner=4 measures PIPELINED dispatch throughput (enqueues overlap the
    # previous call's device work — the serving daemon's steady state); the
    # final _sync pulls a scalar produced by the last call, which the
    # in-order device stream can only deliver after all four completed.
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            stego, chk = cycle(*args)
        _sync(chk)
        times.append((time.perf_counter() - t0) / inner)

    sec = float(np.median(times))
    mpix_per_s = (B * h * w) / sec / 1e6
    baseline = 10.3  # MPix/s, reference CPU embed+merge (BASELINE.md)
    extra = {
        "rep_times_ms": [round(1e3 * t, 2) for t in times],
        "sync_floor_ms": sync_floor_ms,
    }
    if fallbacks:
        extra["fallbacks"] = fallbacks
    if contention:
        extra["contention"] = contention
    # Per-stage wall clocks (compile + measure) land in the artifact AND on
    # stderr as each stage finishes: a worker that blows the orchestrator's
    # timeout leaves a trail naming the stage that ate the budget (remote
    # compiles over the dev tunnel are the usual suspect).
    _hl("measure")
    stage_wall = {"headline": round(time.perf_counter() - t_start, 1)}
    extra["headline_stage_s"] = hl_stage
    print(f"[bench] headline done at {stage_wall['headline']}s "
          f"(backend={ran_backend})", file=_sys.stderr, flush=True)

    def _stage(key: str, fn):
        t0 = time.perf_counter()
        try:
            val = fn()
        except Exception as exc:
            print(f"{key} bench failed: {type(exc).__name__}: {exc}",
                  file=_sys.stderr, flush=True)
            extra[f"{key}_error"] = f"{type(exc).__name__}: {exc}"[:200]
            val = None
        stage_wall[key] = round(time.perf_counter() - t0, 1)
        print(f"[bench] {key} took {stage_wall[key]}s",
              file=_sys.stderr, flush=True)
        return val

    v = _stage("lsb_cycle_2048", _bench_big)
    if v is not None:
        extra["lsb_cycle_2048_mpix_s"] = round(v, 1)
    v = _stage("pee_cycle", _bench_pee)
    if v is not None:
        extra["pee_cycle_mpix_s"] = round(v, 1)
    v = _stage("pee_cycle_2048", _bench_pee_big)
    if v is not None:
        extra["pee_cycle_2048_mpix_s"] = round(v, 1)
    v = _stage("pee_cycle_odd", _bench_pee_odd)
    if v is not None:
        extra["pee_cycle_odd_640x480_mpix_s"] = round(v, 1)
    v = _stage("block_cycle", _bench_block)
    if v is not None:
        extra["block_cycle_mpix_s"] = round(v[0], 1)
        extra["block_cycle_detail"] = v[1]
    v = _stage("volume_cycle", _bench_volume)
    if v is not None:
        extra["volume_cycle_mpix_s"] = round(v[0], 1)
        extra["volume_stage_s"] = v[1]
    v = _stage("e2e", lambda: _bench_e2e(image))
    if v is not None:
        extra["e2e_encode_decode_mpix_s"] = round(v[0], 2)
        extra["e2e_stage_ms_per_image"] = v[1]
    v = _stage("e2e_batch", lambda: _bench_e2e_batch(image))
    if v is not None:
        extra["e2e_batch_mpix_s"] = round(v[0], 1)
        extra["e2e_batch_stage_ms"] = v[1]
    # production route (device_policy=auto, round 5): raster embed as
    # O(payload) host window work — no transfers, the chip reserved for
    # PEE/block/volume/metrics; measured in the SAME process as the device
    # route above so the two are ambient-tax comparable
    v = _stage("e2e_batch_auto",
               lambda: _bench_e2e_batch(image, reps=5,
                                        device_policy="auto"))
    if v is not None:
        extra["e2e_batch_auto_mpix_s"] = round(v[0], 1)
        extra["e2e_batch_auto_stage_ms"] = v[1]
    v = _stage("serve", lambda: _bench_serve(image))
    if v is not None:
        extra["serve_ms"] = v
    extra["stage_wall_s"] = stage_wall
    # The worker prints the FULL artifact; the orchestrator preserves it to
    # docs/artifacts/ and prints the slim driver line (round-5: the driver
    # records only a 2,000-char stdout tail, and the fat line's tail lost
    # every throughput field before the headline — VERDICT weak #4).
    print(
        json.dumps(
            {
                "extra": extra,
                "metric": "embed+extract throughput (512x512 uint16, batch 256)",
                "backend": ran_backend,
                "unit": "MPix/s/chip",
                "vs_baseline": round(mpix_per_s / baseline, 2),
                "value": round(mpix_per_s, 1),
            }
        )
    )


def _bench_lsb(B: int = 256, tier: str = "packed", h: int = 512,
               w: int = 512, payload_bits: int = 100_000) -> float:
    """Parameterized LSB embed+extract cycle (the sweep tool's workhorse;
    main() keeps its own inline copy of the packed tier for the headline).
    ``tier``: 'packed' (clear/value words, fused XLA — HBM speed-of-light)
    or 'preplaced' (per-plane bit tensor, Mosaic kernels)."""
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.io import dicom
    from codec_tcc_tpu.ops import pallas_embed as pe
    from codec_tcc_tpu.parallel import batch as batch_par

    if jax.default_backend() != "tpu":
        raise RuntimeError("TPU only")
    n = h * w
    rng = np.random.default_rng(3)
    # pe.dcm content (tiled if needed): same pixel statistics as the
    # headline so the decomposition picks the same plane count (random
    # 12-bit noise gives s=5 -> an 8-plane unroll, apples-to-oranges)
    base, _ = dicom.load_image("/root/reference/images/pe.dcm")
    reps = (h + base.shape[0] - 1) // base.shape[0]
    big = np.tile(base, (reps, reps))[:h, :w]
    # plan once + tile, build the batch on device (see main(): a degraded
    # tunnel turns host-batch device_puts into minutes)
    img0 = big ^ rng.integers(0, 2, size=big.shape).astype(np.uint16)
    payloads = [rng.integers(0, 2, size=payload_bits).astype(np.uint8)
                for _ in range(B)]
    plan = _tile_plan(
        batch_par.plan_batch(img0[None], payloads[:1], EncodeConfig(beta=0.4)),
        payloads, B,
    )
    base_d = jax.device_put(jnp.asarray(big))
    noise = jax.jit(
        lambda k: jax.random.bits(k, (B, h, w), dtype=jnp.uint16) & 1
    )(jax.random.PRNGKey(3))
    imgs_d = jax.jit(
        lambda bs, nz: (bs[None] ^ nz).reshape(B, n // 128, 128)
    )(base_d, noise)

    if tier == "packed":
        msgs_dev = _ship_bits(batch_par._msg_prefix(plan))
        cl_d, vl_d = pe.preplace_packed_device(
            msgs_dev,
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            jnp.asarray(plan.offsets), n, plan.nbits,
        )

        # large buffers are EXPLICIT jit args, never closures: the axon
        # remote compile serializes captured buffers into the request and
        # 413s past ~hundreds of MB (the 2048^2 batch found the limit)
        @jax.jit
        def cycle(im, cl, vl):
            stego = pe.embed_batch_packed(im, cl, vl)
            packed = pe.extract_packed_batch(stego, plan.nbits)
            return stego, jnp.sum(packed, dtype=jnp.int32)

        args = (imgs_d, cl_d, vl_d)
    elif tier == "preplaced":
        tile = pe.preferred_tile(n)
        msgs_dev = _ship_bits(batch_par._msg_prefix(plan))
        bits_d = pe.preplace_bits_device(
            msgs_dev,
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            jnp.asarray(plan.offsets), n, plan.nbits, n,
        )
        st_d = jax.device_put(jnp.asarray(plan.starts))
        ln_d = jax.device_put(jnp.asarray(plan.lengths))

        @jax.jit
        def cycle(im, bt, st, ln):
            stego = pe.embed_batch_preplaced(im, bt, st, ln, plan.nbits, tile)
            rows = pe.extract_raster_batch(stego, st, ln, plan.nbits, tile)
            return stego, jnp.sum(rows, dtype=jnp.int32)

        args = (imgs_d, bits_d, st_d, ln_d)
    else:
        raise ValueError(f"unknown tier {tier!r}")

    out = cycle(*args)
    _sync(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            out = cycle(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / 2)
    return B * n / float(np.median(times)) / 1e6


def _bench_big(B: int = 32) -> float:
    """Large-image scaling check: the packed LSB cycle on 2048x2048 uint16
    images (16x the headline's pixel count per image; 1 Mbit payloads).
    B=32 = 134 MPix per dispatch, matching the headline's amortization."""
    return _bench_lsb(B, "packed", 2048, 2048, payload_bits=1_000_000)


def _bench_volume(D: int = 64):
    """BASELINE config[3]: the 64x512x512 uint16 volume. Runs the volume
    pipeline's own path — global cut point from summed per-slice histograms,
    capacity-aware per-slice plans, fused batch embed — once end-to-end with
    a bit-exact round-trip assert (including the STGV pack/unpack host
    shell), then isolates the repeated device cycle (packed-tier embed +
    extract over all 64 slices) like the other cycle legs. Device-built
    volume (CLAUDE.md: large bench inputs never ride the relay).

    Returns ``(cycle_mpix_s, breakdown)`` where breakdown carries one-shot
    stage walls: cut point, planning, device encode, STGV pack (transport
    codec + container, threaded host), unpack (codec + O(payload) host
    extraction)."""
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.io import dicom
    from codec_tcc_tpu.ops import pallas_embed as pe
    from codec_tcc_tpu.parallel import batch as batch_par
    from codec_tcc_tpu.parallel import volume as vol_par

    if jax.default_backend() != "tpu":
        raise RuntimeError("TPU only")
    h = w = 512
    n = h * w
    bd: dict = {}
    base, _ = dicom.load_image("/root/reference/images/pe.dcm")
    base_d = jax.device_put(jnp.asarray(base))
    noise = jax.jit(
        lambda k: jax.random.bits(k, (D, h, w), dtype=jnp.uint16) & 1
    )(jax.random.PRNGKey(11))
    vol_d = jax.jit(lambda b, nz: b[None] ^ nz)(base_d, noise)
    jax.block_until_ready(vol_d)

    cfg = EncodeConfig(strategy="multi_plane", codec="deflate",
                       compute_metrics=False, beta=0.4)
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 2, size=D * 100_000).astype(np.uint8)

    # full volume encode via the pipeline's own entry point (cut point +
    # plans + device embed + stego download), with round-trip asserts
    t0 = time.perf_counter()
    result = vol_par.encode_volume(vol_d, payload, cfg)
    bd["encode_volume_s"] = round(time.perf_counter() - t0, 2)
    bd["cut_point_s_value"] = int(result.s)

    t0 = time.perf_counter()
    got = vol_par.extract_volume(result.stego, result.plan)
    bd["extract_volume_s"] = round(time.perf_counter() - t0, 2)
    if not np.array_equal(got, payload):
        raise AssertionError("volume payload round-trip mismatch")

    vol_np = np.asarray(vol_d)
    t0 = time.perf_counter()
    blob = vol_par.pack_volume(vol_np, result, cfg)
    bd["pack_stgv_s"] = round(time.perf_counter() - t0, 2)
    bd["stgv_bytes"] = len(blob)
    t0 = time.perf_counter()
    bits2, stego2, orig2 = vol_par.unpack_volume(blob)
    bd["unpack_stgv_s"] = round(time.perf_counter() - t0, 2)
    if not (np.array_equal(bits2, payload)
            and np.array_equal(stego2, result.stego)
            and orig2 is not None and np.array_equal(orig2, vol_np)):
        raise AssertionError("STGV round-trip mismatch")

    # repeated device cycle at the volume's own plan (packed tier, same
    # methodology as the LSB legs: relayout outside, big buffers as args)
    plan = result.plan
    imgs3 = vol_d.reshape(D, n // 128, 128)
    msgs_dev = _ship_bits(batch_par._msg_prefix(plan))
    cl_d, vl_d = pe.preplace_packed_device(
        msgs_dev,
        jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
        jnp.asarray(plan.offsets), n, plan.nbits,
    )

    @jax.jit
    def cycle(im, cl, vl):
        stego = pe.embed_batch_packed(im, cl, vl)
        packed = pe.extract_packed_batch(stego, plan.nbits)
        return stego, jnp.sum(packed, dtype=jnp.int32)

    out = cycle(imgs3, cl_d, vl_d)
    _sync(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            out = cycle(imgs3, cl_d, vl_d)
        _sync(out)
        times.append((time.perf_counter() - t0) / 2)
    bd["cycle_rep_ms"] = [round(1e3 * t, 2) for t in times]

    # floor reference (round-5, VERDICT weak #3): one 16.8 MPix dispatch
    # runs ~13 ms against the tunnel's ~7-12 ms fixed dispatch cost, so the
    # raw cycle rate mostly measures dispatch amortization, not the kernels.
    floor_fn = jax.jit(lambda im: jnp.sum(im, dtype=jnp.float32))
    _sync(floor_fn(imgs3))
    ftimes = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(floor_fn(imgs3))
        ftimes.append(time.perf_counter() - t0)
    bd["floor_ms"] = round(1e3 * float(np.median(ftimes)), 2)

    # device rate by TWO-POINT CHAIN DIFFERENCE, not floor subtraction: the
    # first on-chip run of the floor-subtracted form reported 60.9 GPix/s —
    # the flaky tunnel's single-dispatch floor drifted ABOVE the chained
    # reps between measurements, so the subtraction amplified minute-scale
    # link weather into nonsense. Chaining C cycles inside ONE jit and
    # differencing two chain lengths measured with IDENTICAL sync structure
    # cancels the dispatch floor exactly: t(C2) - t(C1) = (C2-C1) device
    # cycles. Each iteration XORs a bit derived from the previous extract
    # into the image first — without that data feedback XLA's bitwise
    # algebra collapses the whole chain to one cycle
    # (((x&~c)|v &~c)|v = (x&~c)|v, then CSE), which the first run proved
    # by timing chain=10 identical to chain=2. The XOR fuses into the
    # embed's own elementwise sweep, so each chained cycle still costs one
    # real embed+extract. Interleaved min-of-reps so both chains share the
    # same link weather.
    # fori_loop, not an unrolled chain, and LONG chains: device work
    # shorter than the sync RTT hides entirely inside it (the in-order
    # stream starts on enqueue; the ~12 ms scalar-fetch round trip masks
    # ~2 ms of kernels completely — chain=10 timed identical to chain=2
    # even with the feedback), so the two points must straddle the RTT
    def chained(c):
        @jax.jit
        def fn(im, cl, vl):
            def body(_, carry):
                x, acc = carry
                x = pe.embed_batch_packed(
                    x ^ (acc & 1).astype(x.dtype), cl, vl
                )
                acc = acc + jnp.sum(
                    pe.extract_packed_batch(x, plan.nbits),
                    dtype=jnp.int32,
                )
                return x, acc
            return jax.lax.fori_loop(0, c, body, (im, jnp.int32(0)))
        return fn

    c1, c2 = 8, 64
    f1, f2 = chained(c1), chained(c2)
    _sync(f1(imgs3, cl_d, vl_d))
    _sync(f2(imgs3, cl_d, vl_d))
    inner = 2
    t1s, t2s = [], []
    for _ in range(6):
        for fn, acc_t in ((f1, t1s), (f2, t2s)):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = fn(imgs3, cl_d, vl_d)
            _sync(out)
            acc_t.append((time.perf_counter() - t0) / inner)
    bd["chain_lengths"] = [c1, c2]
    bd["chain_rep_ms"] = {
        str(c1): [round(1e3 * t, 2) for t in t1s],
        str(c2): [round(1e3 * t, 2) for t in t2s],
    }
    dev_cycle = (min(t2s) - min(t1s)) / (c2 - c1)
    if dev_cycle > 50e-6:  # >50 us of signal per cycle, else link noise won
        bd["device_mpix_s"] = round(D * n / dev_cycle / 1e6, 1)
    else:
        # the s=4 packed cycle is a few HBM sweeps over a 34 MB volume
        # (~0.1-0.2 ms) — real device work is INVISIBLE under the ~12-25 ms
        # sync RTT even 64-chained, and the min-diff drowns in link noise.
        # Report the defensible measured bound instead of a noise-born
        # point estimate: the chained call provably completed c2 full
        # cycles within its own wall, so rate >= c2*work/wall.
        bd["device_rate_floor_dominated"] = True
        bd["device_mpix_s_lower_bound"] = round(
            c2 * D * n / min(t2s) / 1e6, 1
        )
    return D * n / float(np.median(times)) / 1e6, bd


def _pee_images_dev(B: int, h: int, w: int, seed: int,
                    mean: float, amp: float, py: float, px: float, hi: int):
    """Smooth sin/cos base + per-pixel ±1 device-RNG noise, built entirely
    on device: the PEE benches' image batches (134-268 MB as host
    device_puts) must not ride a possibly-degraded tunnel."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        base = (mean + amp * jnp.sin(yy / py) * jnp.cos(xx / px)).astype(jnp.int32)
        noise = jax.random.randint(key, (B, h, w), -1, 2, dtype=jnp.int32)
        return jnp.clip(base[None] + noise, 0, hi).astype(jnp.uint16)

    return gen(jax.random.PRNGKey(seed))


def _bench_pee(B: int = 256) -> float:
    """Device PEE cycle (2-pass embed + 2-pass extract) MPix/s — the north
    star's named workload ('PEE ... fuse into Pallas kernels'). Uses the
    Pallas kernels on TPU, falling back to the XLA ops elsewhere. B=256
    amortizes the dev tunnel's per-dispatch latency (B=128 measured 1.79
    GPix/s, B=256 2.2 — tools/sweep_dispatch.py)."""
    import jax
    import jax.numpy as jnp

    h = w = 512
    n = h * w
    t, max_val = 2, 4095
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, size=(B, 1 << 17)).astype(np.uint8)
    want = jnp.full((B,), 100_000, jnp.int32)

    if jax.default_backend() == "tpu":
        from codec_tcc_tpu.ops import pallas_pee as pp

        imgs3 = _pee_images_dev(
            B, h, w, 1, 400, 300, 37.0, 53.0, 836
        ).reshape(B, n // 128, 128)
        tp = pp.preferred_tile_px(h, w)   # production tile size (round 4)
        msg2d_d, l2 = pp.prep_messages_device(_ship_bits(msgs), n, tp)
        zero = jnp.zeros(B, jnp.int32)

        def cycle(im3, ms):
            s0, o0, u0, n0 = pp.embed_pass_batch(
                im3, ms, zero, want, h, w, 0, t, max_val, l2, tile_px=tp)
            s1, o1, u1, n1 = pp.embed_pass_batch(
                s0, ms, u0, want - u0, h, w, 1, t, max_val, l2, tile_px=tp)
            over = o0 | o1
            r1, g1, c1 = pp.extract_pass_batch(
                s1, over, n1, h, w, 1, t, max_val, tile_px=tp)
            r0, g0, c0 = pp.extract_pass_batch(
                r1, over, n0, h, w, 0, t, max_val, tile_px=tp)
            return r0, jnp.sum(c0) + jnp.sum(c1)

        args = (imgs3, msg2d_d)
    else:
        from codec_tcc_tpu.ops import pee as pee_ops

        imgs_d = _pee_images_dev(B, h, w, 1, 400, 300, 37.0, 53.0, 836)
        msgs_d = jax.device_put(jnp.asarray(msgs))

        def one(im, ms, w0):
            s0, o0, u0, n0 = pee_ops.embed_pass(
                im, ms, jnp.int32(0), w0, 0, t, max_val)
            s1, o1, u1, n1 = pee_ops.embed_pass(s0, ms, u0, w0 - u0, 1, t, max_val)
            over = o0 | o1
            r1, b1, m1 = pee_ops.extract_pass(s1, over, n1, 1, t, max_val, 1 << 17)
            r0, b0, m0 = pee_ops.extract_pass(r1, over, n0, 0, t, max_val, 1 << 17)
            return r0, jnp.sum(b0, dtype=jnp.int32) + jnp.sum(b1, dtype=jnp.int32)

        def cycle(im):
            return jax.vmap(one)(im, msgs_d, want)

        args = (imgs_d,)

    cyc = jax.jit(cycle)
    out = cyc(*args)
    _sync(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            out = cyc(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / 3)
    return B * h * w / float(np.median(times)) / 1e6


def _bench_pee_big(B: int = 32) -> float:
    """PEE cycle on 2048x2048 uint16 images (width-sized halo: the vertical
    neighbor is 16 pixel-major rows here, vs 4 at 512 wide). B=32: the
    dispatch sweep measured 1.5-1.6 GPix/s at B=8, 2.4 at B=16, 3.2 at
    B=32 — per-dispatch tunnel latency, not the kernels, bounds small
    batches."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        raise RuntimeError("TPU only")
    from codec_tcc_tpu.ops import pallas_pee as pp

    h = w = 2048
    n = h * w
    t, max_val = 2, 4095
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, size=(B, 1 << 20)).astype(np.uint8)
    want = jnp.full((B,), 1_000_000, jnp.int32)

    imgs3 = _pee_images_dev(
        B, h, w, 5, 800, 700, 61.0, 97.0, 4095
    ).reshape(B, n // 128, 128)
    tp = pp.preferred_tile_px(h, w)       # production tile size (round 4)
    msg2d_d, l2 = pp.prep_messages_device(_ship_bits(msgs), n, tp)
    zero = jnp.zeros(B, jnp.int32)

    @jax.jit
    def cycle(im3, ms):
        s0, o0, u0, n0 = pp.embed_pass_batch(
            im3, ms, zero, want, h, w, 0, t, max_val, l2, tile_px=tp)
        s1, o1, u1, n1 = pp.embed_pass_batch(
            s0, ms, u0, want - u0, h, w, 1, t, max_val, l2, tile_px=tp)
        over = o0 | o1
        r1, g1, c1 = pp.extract_pass_batch(
            s1, over, n1, h, w, 1, t, max_val, tile_px=tp)
        r0, g0, c0 = pp.extract_pass_batch(
            r1, over, n0, h, w, 0, t, max_val, tile_px=tp)
        return r0, jnp.sum(c0) + jnp.sum(c1)

    out = cycle(imgs3, msg2d_d)
    _sync(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            out = cycle(imgs3, msg2d_d)
        _sync(out)
        times.append((time.perf_counter() - t0) / 2)
    return B * h * w / float(np.median(times)) / 1e6


def _bench_pee_odd(B: int = 256, h: int = 640, w: int = 480) -> float:
    """PEE cycle on an ODD geometry (w % 128 != 0, n % 65536 != 0) through
    the pad-and-mask kernel route — the round-2 verdict's ~40x cliff case
    (such shapes used to fall back to the 43 MPix/s XLA path). Pixels are
    counted LOGICAL (the padded tail is overhead, not work). B=256
    amortizes per-dispatch tunnel latency (B=64 measured 0.95-1.09 GPix/s,
    B=128 1.6, B=256 2.2)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        raise RuntimeError("TPU only")
    from codec_tcc_tpu.ops import pallas_pee as pp

    assert not pp.supports(h, w)
    n = h * w
    t, max_val = 2, 4095
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, 2, size=(B, 1 << 17)).astype(np.uint8)
    want = jnp.full((B,), 100_000, jnp.int32)

    tp = pp.preferred_tile_px(h, w)       # production tile size (round 4)
    wb = pp.padded_geometry(h, w, tp)[1]
    imgs3 = pp.pad_batch(
        _pee_images_dev(B, h, w, 7, 400, 300, 37.0, 53.0, 836), h, w, tp
    )
    msg2d_d, l2 = pp.prep_messages_device(_ship_bits(msgs), n, tp)
    zero = jnp.zeros(B, jnp.int32)

    @jax.jit
    def cycle(im3, ms):
        s0, o0, u0, n0 = pp.embed_pass_batch(
            im3, ms, zero, want, h, w, 0, t, max_val, l2, buf_w=wb,
            tile_px=tp)
        s1, o1, u1, n1 = pp.embed_pass_batch(
            s0, ms, u0, want - u0, h, w, 1, t, max_val, l2, buf_w=wb,
            tile_px=tp)
        over = o0 | o1
        r1, g1, c1 = pp.extract_pass_batch(
            s1, over, n1, h, w, 1, t, max_val, buf_w=wb, tile_px=tp)
        r0, g0, c0 = pp.extract_pass_batch(
            r1, over, n0, h, w, 0, t, max_val, buf_w=wb, tile_px=tp)
        return r0, jnp.sum(c0) + jnp.sum(c1)

    out = cycle(imgs3, msg2d_d)
    _sync(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            out = cycle(imgs3, msg2d_d)
        _sync(out)
        times.append((time.perf_counter() - t0) / 2)
    return B * n / float(np.median(times)) / 1e6


def _bench_block(B: int = 256):
    """Fused block_adaptive device cycle (MXU one-hot permutation embed +
    extraction, parallel.batch routes) MPix/s at 512^2 uint16. The plan and
    the exact integer-key tile ranking are host-side serving work (measured
    by the e2e legs); this isolates the fused device dispatch like the
    other cycle legs. Device-built inputs (CLAUDE.md: large bench inputs
    must not ride a degraded relay). B=256 matches the LSB tier — the
    forced-sync sweep (tools/block_profile.py) measured the cycle's DEVICE
    time B-linear at ~1.2 GPix/s (27.6 ms at B=128, 56.4 at B=256), so
    pixels-per-dispatch is what amortizes the tunnel's 7-28 ms sync floor."""
    import jax
    import jax.numpy as jnp

    from codec_tcc_tpu.ops import segments as segment_ops
    from codec_tcc_tpu.parallel.batch import (
        _batch_block_bases, _block_embed_batch, _block_extract_batch,
    )

    h = w = 512
    n = h * w
    # nbits=4: the production routes bucket the static plane unroll to the
    # smallest power of two >= s (pipeline._plane_bucket), so the leg
    # measures what serving actually dispatches (the round-3 leg unrolled 8
    # planes for an s=4 cut — half the matmul work masked off)
    s, nbits, block = 4, 4, 16
    payload_bits = 100_000
    rng = np.random.default_rng(3)
    imgs_dev = _pee_images_dev(B, h, w, 2, 400, 300, 37.0, 53.0, 836)
    plan = segment_ops.distribute_segments(s, payload_bits, 42)
    pp = segment_ops.raster_plane_plan(plan, n, nbits, 0, True)
    lengths = jnp.asarray(np.tile(pp.lengths, (B, 1)))
    offsets = jnp.asarray(np.tile(pp.offsets, (B, 1)))
    s_d = jnp.full((B,), s, jnp.int32)
    lpad = 1 << 17
    msgs_d = _ship_bits(rng.integers(0, 2, size=(B, lpad)).astype(np.uint8))
    bases = jnp.asarray(_batch_block_bases(
        imgs_dev, nbits, np.full(B, s, np.int32), block, h, w
    ))

    # host-pre-sliced message rows (round 5, ops.embed.block_msg_rows):
    # identical plan for every bench image, so the per-plane window slices
    # are STATIC here — built once on device, outside the timed cycle
    ntiles = (h // block) * (w // block)
    bsq = block * block
    offs_np = [int(v) for v in pp.offsets]

    @jax.jit
    def build_rows(msgs):
        def one(mg):
            ext = jnp.concatenate([mg, jnp.zeros(n, mg.dtype)])
            return jnp.stack([
                ext[offs_np[p] : offs_np[p] + n].reshape(ntiles, bsq)
                for p in range(nbits)
            ])
        return jax.vmap(one)(msgs)

    mrows_d = build_rows(msgs_d)
    jax.block_until_ready(mrows_d)
    dummy_msgs = jnp.zeros((B, 8), jnp.uint8)

    @jax.jit
    def cycle(imgs, mrows):
        stego = _block_embed_batch(
            imgs, dummy_msgs, bases, lengths, offsets, s_d, nbits, block,
            mrows,
        )
        bits = _block_extract_batch(
            stego, bases, lengths, offsets, s_d, nbits, block, lpad
        )
        return stego, jnp.sum(bits, dtype=jnp.int32)

    out = cycle(imgs_dev, mrows_d)
    _sync(out)
    # leg-local sync floor: the raw number carries a fixed dev-tunnel RTT
    # (7-28 ms across days for IDENTICAL device work) that a co-located
    # production host never pays; measuring it here lets the artifact carry
    # the floor-corrected DEVICE rate next to the raw wall number
    floor_fn = jax.jit(lambda im: jnp.sum(im, dtype=jnp.float32))
    _sync(floor_fn(imgs_dev))
    ftimes = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(floor_fn(imgs_dev))
        ftimes.append(time.perf_counter() - t0)
    floor = float(np.median(ftimes))
    inner = 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = cycle(imgs_dev, mrows_d)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    med = float(np.median(times))
    # inner pipelined calls amortize one RTT across `inner` dispatches
    dev = max(med - floor / inner, 1e-9)
    detail = {
        "rep_ms": [round(1e3 * t, 2) for t in times],
        "floor_ms": round(1e3 * floor, 2),
        "device_mpix_s": round(B * h * w / dev / 1e6, 1),
    }
    return B * h * w / med / 1e6, detail


def _bench_e2e(image: np.ndarray, reps: int = 3, batch: int = 4):
    """Full host-boundary-to-host-boundary throughput: decompose -> plan ->
    embed -> XOR maps -> transport codec -> container pack -> parse ->
    decode -> restore, per image, including every host shell stage the
    kernel-cycle metric hides (VERDICT round-1 weakness #4).

    Returns ``(mpix_per_s, breakdown)`` where breakdown holds per-image
    stage wall times (ms) from the pipeline's own profiler plus the
    encode/decode split — the round-2 verdict required the gap vs the
    reference's CPU figure to be attributable from the artifact."""
    from codec_tcc_tpu import profiling
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.pipeline import decode_container, encode_array

    rng = np.random.default_rng(2)
    payload = rng.bytes(8_000)
    # pinned to the device route: this leg attributes the CHIP serving
    # path per stage (the production auto route's numbers live in the
    # e2e_batch_auto and serve legs — since round 5 auto does raster
    # embeds host-side and would never touch the device here)
    cfg = EncodeConfig(strategy="hybrid", codec="deflate",
                       compute_metrics=False, device_policy="device")
    imgs = [image ^ rng.integers(0, 2, size=image.shape).astype(image.dtype)
            for _ in range(batch)]
    # warmup (compiles)
    dec = decode_container(encode_array(imgs[0], payload, cfg).container)
    assert dec.payload == payload

    prof = profiling.get_profiler()
    enc_t, dec_t = [], []
    per_item: dict = {}
    for _ in range(reps):
        for img in imgs:
            prof.reset()
            t0 = time.perf_counter()
            res = encode_array(img, payload, cfg)
            t1 = time.perf_counter()
            decode_container(res.container)
            enc_t.append(t1 - t0)
            dec_t.append(time.perf_counter() - t1)
            for name, row in prof.report().items():
                per_item.setdefault(name, []).append(row["wall_s"])
    # medians, not means: one stalled item (tunnel hiccup) must not smear
    # every stage (see _bench_e2e_batch)
    per_image = float(np.median(enc_t)) + float(np.median(dec_t))
    breakdown = {
        name: round(1e3 * float(np.median(vals)), 2)
        for name, vals in per_item.items()
    }
    breakdown["encode_total"] = round(1e3 * float(np.median(enc_t)), 2)
    breakdown["decode_total"] = round(1e3 * float(np.median(dec_t)), 2)
    breakdown["image_bytes"] = int(image.nbytes)
    # compression visibility: the container IS the product a serving user
    # stores/ships (split-plane deflate made it ~24% smaller in round 3)
    breakdown["container_bytes"] = len(res.container)
    return image.size / per_image / 1e6, breakdown


def _bench_e2e_batch(image: np.ndarray, B: int = 32, reps: int = 3,
                     device_policy: str = "device"):
    """Host-boundary batch throughput — the serving path: embed/extract
    with the codec / XOR-map / container host shell on a thread pool
    (parallel.batch.encode_batch_containers / decode_batch_containers).

    ``device_policy="device"`` pins the CHIP route (one fused device
    dispatch per batch + packed-map download) so the artifact keeps
    measuring and attributing the TPU serving path;
    ``"auto"`` measures what production actually runs since round 5 — the
    raster embed as O(payload) host window work with no transfers at all
    (config.EncodeConfig.device_policy).

    Returns ``(mpix_per_s, breakdown)`` with per-batch stage wall times (ms)
    from the batch pipeline's profiler stages."""
    from codec_tcc_tpu import profiling
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(4)
    h, w = image.shape
    imgs = np.broadcast_to(image, (B, h, w)).copy()
    imgs ^= rng.integers(0, 2, size=imgs.shape).astype(image.dtype)
    payloads = [rng.bytes(8_000) for _ in range(B)]
    cfg = EncodeConfig(strategy="hybrid", codec="deflate",
                       compute_metrics=False, device_policy=device_policy)

    # warmup / compile + correctness
    res = batch_par.encode_batch_containers(imgs, payloads, cfg)
    decs = batch_par.decode_batch_containers(res.containers)
    assert all(d.payload == p for d, p in zip(decs, payloads))

    prof = profiling.get_profiler()
    times = []
    per_rep: dict = {}
    for _ in range(reps):
        prof.reset()
        t0 = time.perf_counter()
        res = batch_par.encode_batch_containers(imgs, payloads, cfg)
        batch_par.decode_batch_containers(res.containers)
        times.append(time.perf_counter() - t0)
        for name, row in prof.report().items():
            per_rep.setdefault(name, []).append(row["wall_s"])
    # per-stage MEDIAN across reps: the round-3 artifact's mean-based stage
    # sums exceeded the median total whenever one rep stalled (host page
    # faults / tunnel hiccups), which made the breakdown unusable for
    # attribution
    breakdown = {
        name: round(1e3 * float(np.median(vals)), 2)
        for name, vals in per_rep.items()
    }
    breakdown["batch_total"] = round(1e3 * float(np.median(times)), 2)
    breakdown["batch_rep_totals_ms"] = [round(1e3 * t, 1) for t in times]
    # the auto route moves nothing over the link — recording the image
    # size as bytes_up there would invent a phantom upload in the artifact
    breakdown["batch_bytes_up"] = (
        int(imgs.nbytes) if device_policy == "device" else 0
    )

    if device_policy != "device":
        # the auto route moves no bytes and dispatches nothing — the
        # link/tax self-attribution below measures the DEVICE route's
        # context only
        return B * h * w / float(np.median(times)) / 1e6, breakdown

    # -- self-attribution refs (round-4): the artifact must prove, from one
    # run, how much of the TPU-route gap vs the CPU backend is (a) pure
    # link bytes and (b) the in-process host tax (identical numpy runs
    # ~2-2.5x slower next to the tunnel runtime on this 1-core host —
    # tools/probe_host_stages.py: bincount 23->60 ms, LUT unpack 76->150 ms
    # across device init, zero code difference). Both legs (TPU process and
    # the CPU-backend subprocess) share this function, so the same fields
    # are 1:1 comparable across extra.e2e_batch_stage_ms and
    # extra.cpu_backend_e2e.u16_batch_stage_ms.
    import jax
    import jax.numpy as jnp

    max_s = int(res.plan.s.max(initial=1)) if res.plan is not None else 4
    n = h * w
    # one compiled add builds each rep's fresh device array (k as a traced
    # arg): baking k into a jnp.full constant forced a fresh remote compile
    # per rep over the tunnel (advisor finding, round 4)
    pk_base = jnp.zeros((B, max_s, n // 8), dtype=jnp.uint8)
    pk_fresh = jax.jit(lambda base, kk: base + kk)
    up_ms, down_ms = [], []
    for k in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(imgs)           # h2d is never host-cached
        jax.block_until_ready(d)
        up_ms.append(1e3 * (time.perf_counter() - t0))
        # fresh device array per rep: np.asarray on a jax Array caches the
        # host copy, so re-downloading the same array would measure nothing
        pk = pk_fresh(pk_base, np.uint8(k))
        jax.block_until_ready(pk)
        t0 = time.perf_counter()
        np.asarray(pk)
        down_ms.append(1e3 * (time.perf_counter() - t0))
    breakdown["tunnel_ref_ms"] = {
        "upload_imgs": round(float(np.median(up_ms)), 1),
        "download_packed": round(float(np.median(down_ms)), 1),
        "bytes_up": int(imgs.nbytes),
        "bytes_down": int(B * max_s * (n // 8)),
    }

    from codec_tcc_tpu.utils import bits as bit_utils

    rng2 = np.random.default_rng(7)
    packed_ref = rng2.integers(
        0, 256, size=(B, max_s, n // 8), dtype=np.uint8
    )
    tax_unpack, tax_binc = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        st = np.empty_like(imgs)
        for i in range(B):
            st[i] = imgs[i] ^ bit_utils.packed_planes_to_diff(
                packed_ref[i], imgs.dtype
            ).reshape(h, w)
        tax_unpack.append(1e3 * (time.perf_counter() - t0))
        t0 = time.perf_counter()
        minlength = 256 if imgs.dtype.itemsize == 1 else 65536
        np.stack([
            np.bincount(im.reshape(-1), minlength=minlength) for im in imgs
        ])
        tax_binc.append(1e3 * (time.perf_counter() - t0))
    breakdown["host_tax_ms"] = {
        "unpack_fixture": round(float(np.median(tax_unpack)), 1),
        "bincount_fixture": round(float(np.median(tax_binc)), 1),
    }
    # decompose the total for the artifact: `tunnel` is pure link bytes a
    # co-located production host never pays; `host_shell` stages run the
    # IDENTICAL single-core numpy/zlib code on every backend (compare them
    # 1:1 against extra.cpu_backend_e2e.u16_batch_stage_ms); the residual is
    # device dispatch work + the per-dispatch sync floor recorded in
    # extra.sync_floor_ms. batch_upload is an async enqueue (its DMA
    # overlaps batch_plan's now-device-free host half, round 5) and
    # batch_upload_wait carries whatever transfer tail the host work didn't
    # cover — so the tunnel sum is honest link time again, cross-checked by
    # tunnel_ref_ms's unoverlapped measurement of the same byte volumes.
    tunnel = sum(breakdown.get(k, 0.0)
                 for k in ("batch_upload", "batch_upload_wait",
                           "batch_download"))
    host_shell = sum(breakdown.get(k, 0.0)
                     for k in ("batch_plan", "batch_unpack", "batch_pack",
                               "batch_codec_decode", "batch_extract",
                               "batch_restore"))
    breakdown["split_tunnel_ms"] = round(tunnel, 1)
    breakdown["split_host_shell_ms"] = round(host_shell, 1)
    breakdown["split_device_residual_ms"] = round(
        max(breakdown["batch_total"] - tunnel - host_shell, 0.0), 1
    )
    return B * h * w / float(np.median(times)) / 1e6, breakdown


def _bench_serve(image: np.ndarray, reps: int = 3):
    """Warm per-request latency of the serving daemon over its Unix socket —
    the production interface (VERDICT round-4 item 6: no artifact carried
    it). The daemon runs as a THREAD in this worker process: the chip
    serializes concurrent processes (CLAUDE.md), so the one process that
    owns the chip must also own the daemon; requests still cross the real
    socket + JSON protocol, so the figures include the full request path a
    client pays (connect, serialize, dispatch, respond).

    Returns per-op medians (ms): socket round-trip wall and the daemon's
    own server-side ``wall_ms``."""
    import tempfile
    import threading

    from codec_tcc_tpu import serve as serve_mod
    from codec_tcc_tpu.io import dicom

    tmp = tempfile.mkdtemp(prefix="bench_serve_")
    sock = os.path.join(tmp, "ct.sock")
    rng = np.random.default_rng(6)
    inputs = []
    for i in range(4):
        img = image ^ rng.integers(0, 2, size=image.shape).astype(image.dtype)
        path = os.path.join(tmp, f"in{i}.dcm")
        dicom.save_image(img, path)
        inputs.append(path)

    th = threading.Thread(
        target=serve_mod.serve, args=(sock,),
        kwargs={"idle_timeout": 120.0}, daemon=True,
    )
    th.start()
    deadline = time.perf_counter() + 60
    while not os.path.exists(sock):
        if time.perf_counter() > deadline:
            raise RuntimeError("serve daemon socket never appeared")
        time.sleep(0.05)

    enc_req = {
        "op": "encode", "input": inputs[0],
        "output": os.path.join(tmp, "out.stgc"),
        "message": "serve bench payload",
        "config": {"strategy": "hybrid", "codec": "deflate",
                   "compute_metrics": False},
    }
    dec_req = {"op": "decode", "input": enc_req["output"],
               "output_prefix": os.path.join(tmp, "dec")}
    encb_req = {
        "op": "encode_batch", "inputs": inputs,
        "output_dir": os.path.join(tmp, "batch"),
        "message": "serve bench payload",
        "config": {"strategy": "hybrid", "codec": "deflate",
                   "compute_metrics": False},
    }

    def _round(req):
        t0 = time.perf_counter()
        resp = serve_mod.request(sock, req)
        wall = 1e3 * (time.perf_counter() - t0)
        if not resp.get("ok"):
            raise RuntimeError(f"serve op failed: {resp.get('error')}")
        return wall, float(resp.get("wall_ms", 0.0))

    # warm every op once (first encode pays the jit compiles the daemon
    # would normally absorb via --warmup)
    _round(enc_req)
    _round(dec_req)
    _round(encb_req)
    decb_req = {
        "op": "decode_batch",
        "inputs": sorted(
            os.path.join(tmp, "batch", f) for f in
            os.listdir(os.path.join(tmp, "batch")) if f.endswith(".stgc")
        ),
        "output_dir": os.path.join(tmp, "decb"),
    }
    _round(decb_req)

    out = {}
    for name, req in (("ping", {"op": "ping"}), ("encode", enc_req),
                      ("decode", dec_req), ("encode_batch_4", encb_req),
                      ("decode_batch_4", decb_req)):
        socks, walls = [], []
        for _ in range(reps):
            a, b = _round(req)
            socks.append(a)
            walls.append(b)
        out[name + "_ms"] = round(float(np.median(socks)), 2)
        out[name + "_server_ms"] = round(float(np.median(walls)), 2)
    serve_mod.request(sock, {"op": "shutdown"})
    th.join(timeout=30)
    return out


def _cpu_e2e_main() -> None:
    """CPU-backend full-cycle e2e worker (run with JAX_PLATFORMS=cpu in a
    fresh subprocess): measures the complete encode+decode cycle — decompose,
    plan, embed, XOR maps, transport codec, container pack/parse, extract,
    restore — on this box's single CPU core for uint16 (pe.dcm content) and
    uint8, per-image and fused-batch. These are the figures BASELINE.md:54
    compares against the reference's 10.3 MPix/s embed+merge-only step on the
    same hardware class; measuring them inside the driver bench makes the
    claim reproducible from the artifact instead of docs-only. Prints one
    JSON object."""
    import sys

    # the axon sitecustomize registers the TPU plugin in every interpreter
    # (gated on PALLAS_AXON_POOL_IPS) — stripping the var in-process is too
    # late (CLAUDE.md), so re-exec once with a clean env; this makes the
    # worker safe to run standalone, not only via _run_cpu_e2e
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        os.execvpe(sys.executable, [sys.executable, *sys.argv], env)

    from codec_tcc_tpu.io import dicom

    u16, _ = dicom.load_image("/root/reference/images/pe.dcm")
    u16 = np.ascontiguousarray(u16.astype(np.uint16))
    u8 = (u16 >> 4).astype(np.uint8)
    out: dict = {"note": "full encode+decode cycle on the CPU backend "
                         "(1-core host); reference baseline 10.3 MPix/s "
                         "covers embed+merge only",
                 # competing processes on the single core (e.g. a tunnel
                 # probe's jax init) stall individual reps — record them so
                 # a deflated rep is attributable from the artifact
                 "contention": probe_contention()}
    for tag, img in (("u16", u16), ("u8", u8)):
        t0 = time.perf_counter()
        # per-leg error isolation (mirrors the TPU worker's _stage): one
        # failing leg must not discard the figures already measured — the
        # outage artifact exists to carry real numbers
        try:
            v, bd = _bench_e2e(img)
            out[f"{tag}_per_image_mpix_s"] = round(v, 2)
            if tag == "u16":
                out["u16_per_image_stage_ms"] = bd
        except Exception as exc:
            out[f"{tag}_per_image_error"] = \
                f"{type(exc).__name__}: {exc}"[:200]
        try:
            # 5 reps: the per-batch wall is ~1 s and a single stalled rep
            # out of 3 lands ON the median; 5 keeps the median clean
            vb, bdb = _bench_e2e_batch(img, reps=5)
            out[f"{tag}_batch_mpix_s"] = round(vb, 2)
            if tag == "u16":
                out["u16_batch_stage_ms"] = bdb
        except Exception as exc:
            out[f"{tag}_batch_error"] = f"{type(exc).__name__}: {exc}"[:200]
        try:
            # production route (device_policy=auto): O(payload) host embed
            va, bda = _bench_e2e_batch(img, reps=5, device_policy="auto")
            out[f"{tag}_batch_auto_mpix_s"] = round(va, 2)
            if tag == "u16":
                out["u16_batch_auto_stage_ms"] = bda
        except Exception as exc:
            out[f"{tag}_batch_auto_error"] = \
                f"{type(exc).__name__}: {exc}"[:200]
        out[f"{tag}_wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)
    sys.exit(0)


def _run_cpu_e2e(timeout: int = 900):
    """Run the CPU-backend e2e worker in a fresh subprocess (the axon
    sitecustomize registers the TPU plugin in every interpreter; the worker
    must not touch the chip, so the gate env var is stripped and the
    platform pinned to cpu). Returns the parsed dict or an error string."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--worker-cpu-e2e"],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return f"cpu-e2e worker timeout ({timeout}s)"
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                return json.loads(line)
            except Exception:
                break
    tail = (proc.stderr.strip().splitlines() or ["?"])[-1]
    return f"cpu-e2e worker failed rc={proc.returncode}: {tail[:160]}"


def _preserve_artifact(obj: dict, tag: str) -> "str | None":
    """Write the FULL artifact object (every stage dict, every breakdown)
    under docs/artifacts/ using the bench_<date>_<HHMM>UTC_<tag>.json naming
    convention (lexicographic == chronological; _last_healthy_artifact
    reads these). Returns the repo-relative path, or None on failure."""
    from datetime import datetime, timezone

    here = os.path.dirname(os.path.abspath(__file__))
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d_%H%M")
    rel = f"docs/artifacts/bench_{stamp}UTC_{tag}.json"
    try:
        os.makedirs(os.path.join(here, "docs/artifacts"), exist_ok=True)
        with open(os.path.join(here, rel), "w") as f:
            f.write(json.dumps(obj) + "\n")
        return rel
    except Exception:
        return None


def _slim_line(obj: dict, artifact_rel: "str | None") -> str:
    """The ONE driver-facing JSON line, guaranteed to fit the driver's
    2,000-char stdout tail COMPLETE: headline + every *_mpix_s + the e2e
    split + serve latencies + provenance, with the stage dictionaries left
    in the preserved docs/artifacts/ file referenced by ``artifact``
    (VERDICT round-4 weak #4: the fat line's tail truncated mid-dict and
    the official artifact lost most throughput numbers). value/vs_baseline
    sit LAST so even a pathological overflow truncates provenance, never
    the headline."""
    extra = obj.get("extra", {})
    slim: dict = {}
    if artifact_rel:
        slim["artifact"] = artifact_rel
    for k, val in extra.items():
        if k.endswith("_mpix_s"):
            slim[k] = val
    det = extra.get("block_cycle_detail") or {}
    if "device_mpix_s" in det:
        slim["block_device_mpix_s"] = det["device_mpix_s"]
    det = extra.get("volume_stage_s") or {}
    if "device_mpix_s" in det:
        slim["volume_device_mpix_s"] = det["device_mpix_s"]
    elif "device_mpix_s_lower_bound" in det:
        slim["volume_device_mpix_s_gte"] = det["device_mpix_s_lower_bound"]
    eb = extra.get("e2e_batch_stage_ms") or {}
    for k in ("batch_total", "split_tunnel_ms", "split_host_shell_ms",
              "split_device_residual_ms"):
        if k in eb:
            slim["e2e_" + k] = eb[k]
    cpu = extra.get("cpu_backend_e2e")
    if isinstance(cpu, dict):
        for k in ("u16_per_image_mpix_s", "u16_batch_mpix_s",
                  "u16_batch_auto_mpix_s", "u8_per_image_mpix_s",
                  "u8_batch_mpix_s", "u8_batch_auto_mpix_s"):
            if k in cpu:
                slim["cpu_" + k] = cpu[k]
    elif cpu is not None:
        slim["cpu_backend_e2e_error"] = str(cpu)[:120]
    for k, val in (extra.get("serve_ms") or {}).items():
        if not k.endswith("_server_ms"):
            slim["serve_" + k] = val
    if "sync_floor_ms" in extra:
        slim["sync_floor_ms"] = extra["sync_floor_ms"]
    if extra.get("last_healthy_run"):
        slim["last_healthy_run"] = extra["last_healthy_run"]
    if extra.get("error"):
        slim["error"] = str(extra["error"])[:160]
    if extra.get("fallbacks"):
        slim["fallbacks"] = [str(x)[:60] for x in extra["fallbacks"]]
    leg_errors = sorted(k for k in extra if k.endswith("_error"))
    if leg_errors:
        slim["leg_errors"] = leg_errors
    out = {
        "metric": obj.get("metric"),
        "backend": obj.get("backend"),
        "unit": obj.get("unit"),
        "extra": slim,
        "vs_baseline": obj.get("vs_baseline"),
        "value": obj.get("value"),
    }
    # hard cap with graceful degradation: drop the least-load-bearing keys
    # until the line provably fits
    drop_order = ["fallbacks", "leg_errors", "last_healthy_run",
                  "serve_ping_ms", "serve_decode_batch_4_ms",
                  "serve_encode_batch_4_ms", "sync_floor_ms"]
    line = json.dumps(out)
    while len(line) > 1900 and drop_order:
        slim.pop(drop_order.pop(0), None)
        line = json.dumps(out)
    return line


def _tunnel_up(attempts: list) -> bool:
    """Fail-fast gate: one tiny device op in a fresh subprocess, three tries
    (the tunnel wedges individual processes ~1 in 3 on bad days — CLAUDE.md —
    but also has multi-hour FULL outages; without this gate a dead tunnel
    burns 4 x 1800 s of worker timeouts and leaves no artifact at all)."""
    import subprocess
    import sys

    for i in range(3):
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((8,8),jnp.float32))))"],
                capture_output=True, text=True, timeout=300,
            )
            if p.returncode == 0 and "64.0" in p.stdout:
                return True
            tail = (p.stderr.strip().splitlines() or ["?"])[-1]
            attempts.append(f"probe{i}: rc={p.returncode} {tail[:120]}")
        except subprocess.TimeoutExpired:
            attempts.append(f"probe{i}: device init timeout (300s)")
    return False


def _last_healthy_artifact() -> dict | None:
    """Newest preserved driver-style run from docs/artifacts/ (raw bench JSON
    lines kept because the dev tunnel has multi-hour full outages). Lets an
    outage-time artifact still carry the last real measurement + provenance
    instead of only a zero."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    # the bench_<ISO-date>_<HHMM>UTC_* naming convention makes lexicographic
    # order chronological (mtimes are not git-stable after a checkout);
    # off-convention names are excluded rather than mis-ordered
    for path in sorted(glob.glob(
            os.path.join(here, "docs/artifacts/bench_*UTC_*.json"))):
        try:
            with open(path) as f:
                obj = json.loads(f.readline())
            if obj.get("value", 0) > 0:
                best = {
                    "value": obj["value"],
                    "unit": obj.get("unit"),
                    "backend": obj.get("backend"),
                    "artifact": os.path.relpath(path, here),
                }
        except Exception:
            continue
    return best


def _print_outage_line(error: str, attempts: list) -> None:
    """Print ONE parseable artifact line documenting a failed measurement
    instead of leaving the artifact empty; carry the newest preserved
    healthy-run number AND a freshly measured CPU-backend e2e (which needs
    no tunnel) so the artifact stays self-explaining. The full object goes
    to docs/artifacts/; stdout gets the slim line (driver tail cap)."""
    extra = {"error": error, "worker_attempts": attempts}
    last = _last_healthy_artifact()
    if last:
        extra["last_healthy_run"] = last
    extra["cpu_backend_e2e"] = _run_cpu_e2e()
    obj = {
        "metric": "embed+extract throughput (512x512 uint16, batch 256)",
        "value": 0.0, "unit": "MPix/s/chip", "vs_baseline": 0.0,
        "backend": "none",
        "extra": extra,
    }
    rel = _preserve_artifact(obj, "outage")
    print(_slim_line(obj, rel))


def _orchestrate() -> int:
    """Run the measurement in fresh subprocesses: a TPU-tunnel abort poisons
    the whole JAX runtime in-process (even device_put fails afterwards), so
    each attempt needs its own interpreter. Tries the preplaced kernels
    (which fall back in-process to the windowed kernels, then XLA), then the
    windowed kernels, then XLA directly."""
    import subprocess
    import sys

    attempts = []
    if not _tunnel_up(attempts):
        _print_outage_line(
            "TPU tunnel unreachable (device init failed 3x in fresh "
            "processes)", attempts)
        return 1
    for backend in ("packed", "packed", "preplaced", "xla"):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", backend],
                capture_output=True, text=True, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # the dev tunnel occasionally wedges a process at 0% CPU
            # (CLAUDE.md); a timed-out worker must fall through to the next
            # attempt, not sink the whole bench
            attempts.append(f"{backend}: worker timeout (1800s)")
            sys.stderr.write(f"bench worker ({backend}) timed out; retrying\n")
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                # surface dead-worker history and the CPU-backend e2e in the
                # artifact itself, not just stderr/docs (round-2 verdict:
                # provenance must be in the parsed JSON); a cpu-e2e failure
                # must never lose the TPU number. The full object is
                # preserved under docs/artifacts/; stdout gets the slim
                # line that provably fits the driver's 2,000-char tail.
                try:
                    obj = json.loads(line)
                    if attempts:
                        obj.setdefault("extra", {})["worker_attempts"] = attempts
                    obj.setdefault("extra", {})["cpu_backend_e2e"] = \
                        _run_cpu_e2e()
                    rel = _preserve_artifact(obj, "run")
                    line = _slim_line(obj, rel)
                except Exception:
                    pass
                print(line)
                return 0
        err_tail = (
            proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else "?"
        )
        attempts.append(f"{backend}: rc={proc.returncode} {err_tail[:160]}")
        sys.stderr.write(
            f"bench worker ({backend}) failed rc={proc.returncode}: {err_tail}\n"
        )
    # tunnel answered the probe but every worker died/timed out (e.g. the
    # tunnel degraded mid-run): still emit a self-describing artifact line
    _print_outage_line("all bench workers failed after a passing tunnel "
                       "probe", attempts)
    return 1


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        main(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1] == "--worker-cpu-e2e":
        _cpu_e2e_main()
    else:
        sys.exit(_orchestrate())
