"""Tile-sharded PEE: one large image's rows split across the mesh.

The PEE counterpart of :mod:`codec_tcc_tpu.parallel.tile` (SURVEY §5's
"long-context" disposition). Everything data-dependent that couples shards
reduces to three tiny collectives per pass inside ``shard_map``:

* **halo exchange** — the rhombus prediction needs one pixel row from each
  vertical neighbor shard: two ``ppermute``s of a single ``(1, W)`` row
  (global border shards replicate their own edge row, matching
  ``ops.pee.rhombus_predict``'s ``mode="edge"`` padding);
* **rank prefix** — the bit-to-pixel mapping is the global raster rank among
  eligible pixels; per-shard totals ``all_gather`` (K scalars) and each shard
  adds the exclusive prefix of the shards before it;
* **processed boundary** — the used-th eligible pixel exists on exactly one
  shard; its closed-form global set-rank ``pmin``s across the mesh.

Pixels never move between shards. Set-ranks (the ``n_proc`` counting) come
from the same closed form the Pallas kernels use (``pallas_pee._geometry``,
asserted against ``ops.pee._set_rank``), with the shard's global row offset
folded in. Containers are byte-identical to the single-device PEE encoder's
(:mod:`codec_tcc_tpu.models.pee`) — asserted in ``tests/test_tile.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncodeConfig
from ..io import container as container_io
from ..ops import metrics as metric_ops
from ..ops.pee import _raster_cumsum
from ..utils.logging import get_logger

logger = get_logger("parallel.tile_pee")

__all__ = [
    "embed_pass_tiled",
    "extract_pass_tiled",
    "encode_array_tiled_pee",
    "decode_container_tiled_pee",
    "pallas_supported",
]

_BIG = jnp.int32(2**31 - 1)


def _halo_rows(blk, axis: str, n_shards: int):
    """(top, bottom) ``(1, W)`` halo rows from the vertical neighbor shards;
    global border shards replicate their own edge row (= the single-device
    ``mode="edge"`` padding)."""
    k = jax.lax.axis_index(axis)
    top = jax.lax.ppermute(
        blk[-1:], axis, [(i, i + 1) for i in range(n_shards - 1)]
    )
    bot = jax.lax.ppermute(
        blk[:1], axis, [(i + 1, i) for i in range(n_shards - 1)]
    )
    top = jnp.where(k == 0, blk[:1], top)
    bot = jnp.where(k == n_shards - 1, blk[-1:], bot)
    return top, bot


def _predict_block(blk, top, bot):
    """Rhombus prediction for one shard's rows given its halo rows (int32)."""
    xp = jnp.concatenate([top, blk, bot], axis=0).astype(jnp.int32)
    xp = jnp.pad(xp, ((0, 0), (1, 1)), mode="edge")
    s = xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:]
    return s // 4


def _global_geometry(lh: int, h: int, w: int, r0, parity: int):
    """(in_set, set_rank) for a shard's rows with global row offset ``r0`` —
    the closed form of ``pallas_pee._geometry`` shifted by the offset."""
    y = r0 + jax.lax.broadcasted_iota(jnp.int32, (lh, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (lh, w), 1)
    interior = (y >= 1) & (y <= h - 2) & (x >= 1) & (x <= w - 2)
    in_set = (((y + x) & 1) == parity) & interior
    m = jnp.clip(y - 1, 0, h - 2)
    if parity % 2 == 0:
        n_q1 = (m + 1) // 2
    else:
        n_q1 = m // 2
    row_excl = n_q1 * ((w - 1) // 2) + (m - n_q1) * ((w - 2) // 2)
    q = (parity + y) & 1
    in_row = jnp.where(q == 1, (x + 1) // 2, x // 2)
    return in_set, row_excl + in_row


def _rank_prefix(local_total, axis: str, n_shards: int):
    """(exclusive_prefix, global_total) of per-shard scalar counts."""
    gat = jax.lax.all_gather(local_total, axis)          # (K,)
    k = jax.lax.axis_index(axis)
    prefix = jnp.sum(jnp.where(jnp.arange(n_shards) < k, gat, 0))
    return prefix, jnp.sum(gat)


@partial(jax.jit, static_argnames=("parity", "t", "max_val", "h", "w",
                                   "mesh", "axis"))
def _embed_pass_tiled_jit(
    img, msg_pad, msg_base, want,
    *, parity: int, t: int, max_val: int, h: int, w: int,
    mesh: Mesh, axis: str,
):
    n_shards = mesh.shape[axis]

    def f(blk, msg, base, wnt):
        # rows per shard come from the (possibly row-padded) block itself;
        # the geometry is evaluated against the REAL static h, so pad rows
        # are never in_set/eligible/processed — they ride along unmodified
        # and the caller slices them away (pad-and-mask)
        lh = blk.shape[0]
        k = jax.lax.axis_index(axis)
        r0 = k * lh
        top, bot = _halo_rows(blk, axis, n_shards)
        x, pred, e, in_set, set_rank, expandable, overflow, eligible = (
            _shard_classify(blk, top, bot, r0, h, w, parity, t, max_val)
        )

        cum_local = _raster_cumsum(eligible)
        prefix, total_cap = _rank_prefix(
            cum_local[-1, -1], axis, n_shards
        )
        elig_cum = prefix + cum_local                 # global inclusive rank
        used = jnp.minimum(wnt, total_cap)

        hit = eligible & (elig_cum == used)
        nproc_local = jnp.min(jnp.where(hit, set_rank, _BIG))
        n_proc = jax.lax.pmin(nproc_local, axis)
        n_proc = jnp.where(
            wnt > total_cap, jnp.int32(h * w),
            jnp.where(used > 0, n_proc, 0),
        )
        processed = in_set & (set_rank <= n_proc)

        embeds = eligible & processed
        rank = elig_cum - 1
        lpad = msg.shape[0]
        midx = jnp.clip(base + rank, 0, lpad - 1)
        b = jnp.take(msg, midx, mode="clip").astype(jnp.int32)

        e_new = jnp.where(
            expandable, 2 * e + jnp.where(embeds, b, 0),
            e + jnp.where(e >= t, t, -t),
        )
        modify = processed & ~overflow & (embeds | ~expandable)
        out = jnp.where(modify, pred + e_new, x).astype(blk.dtype)
        # used/n_proc are equal on every shard (pure functions of the
        # collectives) but the static replication checker cannot prove it;
        # emit them per-shard and let the host read element 0
        return out, overflow & processed, used[None], n_proc[None]

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
    )(img, msg_pad, msg_base, want)


def embed_pass_tiled(
    image, msg_pad, msg_base, want, parity: int, t: int, max_val: int,
    mesh: Mesh, axis: str = "tile", h: Optional[int] = None,
):
    """One PEE pass over a row-sharded image. Returns
    ``(stego, overflow_bool, used, n_proc)`` — stego/overflow stay sharded
    (row-PADDED when ``h`` does not divide the axis: the geometry masks pad
    rows out of every set/rank/collective, and processed pixels sit at
    ``y <= h-2`` so their rhombus neighbors never read a pad row — callers
    slice results back to ``h`` rows). Pass the REAL ``h`` explicitly when
    chaining a second pass over an already-padded sharded stego."""
    ph, w = np.shape(image)
    n_shards = mesh.shape[axis]
    h = min(int(h), ph) if h else ph
    h_pad = -(-h // n_shards) * n_shards
    img = jnp.asarray(image)
    if ph != h_pad:
        img = jnp.pad(img[:h], ((0, h_pad - h), (0, 0)))
    img_d = jax.device_put(img, NamedSharding(mesh, P(axis, None)))
    msg_d = jax.device_put(jnp.asarray(msg_pad), NamedSharding(mesh, P()))
    stego, over, used, n_proc = _embed_pass_tiled_jit(
        img_d, msg_d, jnp.int32(msg_base), jnp.int32(want),
        parity=parity, t=t, max_val=max_val, h=h, w=w, mesh=mesh, axis=axis,
    )
    return stego, over, used[0], n_proc[0]


@partial(jax.jit, static_argnames=("parity", "t", "max_val", "h", "w",
                                   "out_len", "mesh", "axis"))
def _extract_pass_tiled_jit(
    stego, over, n_proc,
    *, parity: int, t: int, max_val: int, h: int, w: int, out_len: int,
    mesh: Mesh, axis: str,
):
    n_shards = mesh.shape[axis]

    def f(blk, ov, npv):
        lh = blk.shape[0]       # padded rows per shard (see embed pass)
        k = jax.lax.axis_index(axis)
        r0 = k * lh
        top, bot = _halo_rows(blk, axis, n_shards)
        x2 = blk.astype(jnp.int32)
        pred = _predict_block(blk, top, bot)
        e2 = x2 - pred
        in_set, set_rank = _global_geometry(lh, h, w, r0, parity)
        processed = in_set & (set_rank <= npv) & ~ov

        expanded = processed & (e2 >= -2 * t) & (e2 < 2 * t)
        b = e2 & 1
        e = jnp.where(
            expanded, (e2 - b) >> 1, e2 + jnp.where(e2 >= 2 * t, -t, t)
        )
        restored = jnp.where(processed, pred + e, x2).astype(blk.dtype)

        # local-rank sort gives this shard's bits in message order; the
        # cross-shard placement is the exclusive prefix of expanded counts
        rank = _raster_cumsum(expanded) - 1
        n_local = jnp.sum(expanded.astype(jnp.int32))
        prefix, _ = _rank_prefix(n_local, axis, n_shards)
        comp = jnp.where(expanded, 2 * rank + b, _BIG).reshape(-1)
        if out_len > comp.size:
            comp = jnp.concatenate(
                [comp, jnp.full((out_len - comp.size,), _BIG, jnp.int32)]
            )
        comp = jax.lax.sort(comp)[:out_len]
        valid = jnp.arange(out_len, dtype=jnp.int32) < n_local
        bits = jnp.where(valid, (comp & 1).astype(jnp.uint8), 0)
        return restored, bits[None], n_local[None], prefix[None]

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(axis, None), P(axis), P(axis), P(axis)),
    )(stego, over, n_proc)


def extract_pass_tiled(
    stego, overflow, n_proc, parity: int, t: int, max_val: int, out_len: int,
    mesh: Mesh, axis: str = "tile", h: Optional[int] = None,
):
    """Invert one PEE pass over a row-sharded stego image. Returns
    ``(restored_sharded, bits (out_len,), n_bits)`` — bits assembled on host
    from per-shard runs placed at their global rank prefix. ``h`` is the
    REAL image height (defaults to the input's); inputs taller than it are
    already row-padded (a sharded stego straight off
    :func:`embed_pass_tiled`), shorter-than-pad inputs are padded here (see
    the embed pass for why pad rows are inert)."""
    ph, w = np.shape(stego)
    n_shards = mesh.shape[axis]
    h = min(int(h), ph) if h else ph
    h_pad = -(-h // n_shards) * n_shards
    stego_j, over_j = jnp.asarray(stego), jnp.asarray(overflow)
    if ph != h_pad:
        stego_j = jnp.pad(stego_j[:h], ((0, h_pad - h), (0, 0)))
        over_j = jnp.pad(over_j[:h], ((0, h_pad - h), (0, 0)))
    stego_d = jax.device_put(stego_j, NamedSharding(mesh, P(axis, None)))
    over_d = jax.device_put(over_j, NamedSharding(mesh, P(axis, None)))
    restored, bits_k, counts, prefixes = _extract_pass_tiled_jit(
        stego_d, over_d, jnp.int32(n_proc),
        parity=parity, t=t, max_val=max_val, h=h, w=w, out_len=out_len,
        mesh=mesh, axis=axis,
    )
    bits_k = np.asarray(bits_k)
    counts = np.asarray(counts)
    prefixes = np.asarray(prefixes)
    out = np.zeros(out_len, dtype=np.uint8)
    for k in range(bits_k.shape[0]):
        c = int(counts[k])
        if c <= 0:
            continue
        off = int(prefixes[k])
        take = min(c, out_len - off)
        if take > 0:
            out[off : off + take] = bits_k[k, :take]
    return restored, out, int(counts.sum())


# ---------------------------------------------------------------------------
# Pallas per-shard compute: the same fused kernels the single-chip path uses,
# parameterized with the shard's global position/rank bases (ops.pallas_pee
# `shard=` mode). Protocol per pass: one XLA count sweep (exact kernel
# classification) -> all_gather rank prefix -> Pallas kernel per shard with
# neighbor halo rows spliced into its padded buffer. The XLA shard_map path
# above remains the portable fallback; both are bit-identical.
# ---------------------------------------------------------------------------


def _shard_pad_buffer(blk, top, bot, w: int):
    """Kernel-layout padded buffer for one shard: the _halo(w)-row padding
    carries the TRUE neighbor rows in the ``w // 128`` buffer rows adjacent
    to the block (exactly the rows the in-kernel rhombus prediction reads
    for boundary pixels); the rest is garbage-tolerated."""
    from ..ops.pallas_pee import _halo

    lh, _ = blk.shape
    hl = _halo(w)
    wr = w // 128
    blk3 = blk.reshape(lh * w // 128, 128)
    zpad = jnp.zeros((hl - wr, 128), blk.dtype)
    return jnp.concatenate([
        zpad, top.reshape(wr, 128), blk3, bot.reshape(wr, 128), zpad
    ])[None]


def _shard_classify(blk, top, bot, r0, h, w, parity, t, max_val):
    """Shared per-shard classification (MUST stay bit-identical to
    ``pallas_pee._classify`` — both shard_map routes and the kernels rely on
    agreeing on eligibility). Returns (x, pred, e, in_set, set_rank,
    expandable, overflow, eligible)."""
    x = blk.astype(jnp.int32)
    pred = _predict_block(blk, top, bot)
    e = x - pred
    lh = blk.shape[0]
    in_set, set_rank = _global_geometry(lh, h, w, r0, parity)
    expandable = (e >= -t) & (e < t)
    exp_over = (pred + 2 * e + 1 > max_val) | (pred + 2 * e < 0)
    shift_over = jnp.where(e >= t, x + t > max_val, x - t < 0)
    overflow = in_set & jnp.where(expandable, exp_over, shift_over)
    eligible = in_set & expandable & ~overflow
    return x, pred, e, in_set, set_rank, expandable, overflow, eligible


def _shard_classify_count(blk, top, bot, r0, h, w, parity, t, max_val):
    """Eligible-pixel count of one shard (kernel-exact classification)."""
    eligible = _shard_classify(blk, top, bot, r0, h, w, parity, t, max_val)[-1]
    return jnp.sum(eligible.astype(jnp.int32))


def pallas_supported(h: int, w: int, n_shards: int) -> bool:
    """Whether the per-shard Pallas route handles this sharded geometry."""
    from ..ops.pallas_pee import TILE_PX

    return (
        w % 128 == 0 and w >= 128
        and h % n_shards == 0
        and (h // n_shards) * w % TILE_PX == 0
    )


@partial(jax.jit, static_argnames=(
    "parity", "t", "max_val", "h", "w", "l2", "mesh", "axis", "interpret"))
def _embed_pass_pallas_jit(
    img, msg2d, msg_base, want,
    *, parity: int, t: int, max_val: int, h: int, w: int, l2: int,
    mesh: Mesh, axis: str, interpret: bool,
):
    from ..ops import pallas_pee as pp

    n_shards = mesh.shape[axis]
    lh = h // n_shards

    def f(blk, msg, base, wnt):
        k = jax.lax.axis_index(axis)
        r0 = k * lh
        top, bot = _halo_rows(blk, axis, n_shards)
        cnt = _shard_classify_count(blk, top, bot, r0, h, w, parity, t, max_val)
        prefix, total_cap = _rank_prefix(cnt, axis, n_shards)

        imgs_pad = _shard_pad_buffer(blk, top, bot, w)
        stego3, over3, _, nproc_sh = pp.embed_pass_batch(
            None, msg, base.reshape(1), wnt.reshape(1),
            h, w, parity, t, max_val, l2, interpret=interpret,
            shard=(imgs_pad, (r0 * w).reshape(1), prefix.reshape(1)),
        )
        used = jnp.minimum(wnt, total_cap)
        n_proc = jax.lax.pmax(nproc_sh[0], axis)
        n_proc = jnp.where(
            wnt > total_cap, jnp.int32(h * w),
            jnp.where(used > 0, n_proc, 0),
        )
        stego = stego3[0].reshape(lh, w)
        over = over3[0].reshape(lh, w).astype(jnp.bool_)
        return stego, over, used[None], n_proc[None]

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
        check_vma=False,    # pallas_call out_shapes carry no vma annotation
    )(img, msg2d, msg_base, want)


@partial(jax.jit, static_argnames=(
    "parity", "t", "max_val", "h", "w", "mesh", "axis", "interpret"))
def _extract_pass_pallas_jit(
    stego, over, n_proc,
    *, parity: int, t: int, max_val: int, h: int, w: int,
    mesh: Mesh, axis: str, interpret: bool,
):
    from ..ops import pallas_pee as pp

    n_shards = mesh.shape[axis]
    lh = h // n_shards

    def f(blk, ov, npv):
        k = jax.lax.axis_index(axis)
        r0 = k * lh
        top, bot = _halo_rows(blk, axis, n_shards)
        stego_pad = _shard_pad_buffer(blk, top, bot, w)
        over3 = ov.reshape(1, lh * w // 128, 128).astype(jnp.uint8)
        r3, segs, cnts = pp.extract_pass_batch(
            None, over3, npv.reshape(1), h, w, parity, t, max_val,
            interpret=interpret, shard=(stego_pad, (r0 * w).reshape(1)),
        )
        return r3[0].reshape(lh, w), segs[0][None], cnts[0][None]

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None, None, None), P(axis, None)),
        check_vma=False,    # pallas_call out_shapes carry no vma annotation
    )(stego, over, n_proc)


def encode_array_tiled_pee(
    image: np.ndarray,
    payload,
    config: EncodeConfig = EncodeConfig(),
    mesh: Optional[Mesh] = None,
    axis: str = "tile",
    *,
    bits_stored: Optional[int] = None,
    backend: str = "auto",
    interpret: bool = False,
):
    """Tile-sharded PEE encode of one large image — byte-identical container
    to :func:`codec_tcc_tpu.models.pee.encode_pee_array` (same escalation
    protocol, same ext/overflow-map layout).

    ``backend``: ``auto`` uses the per-shard Pallas kernels on TPU when the
    sharded geometry supports them, the XLA shard_map path otherwise;
    ``pallas``/``xla`` force a route (``pallas`` + ``interpret=True`` runs
    the kernels interpreted — the CPU-mesh test configuration)."""
    import zlib

    from ..models.pee import _MAX_T, select_threshold
    from ..ops import pee as pee_ops
    from ..pipeline import EncodeResult, _as_payload_bits

    if mesh is None:
        raise ValueError("encode_array_tiled_pee requires a mesh")
    image = np.asarray(image)
    h, w = image.shape
    n_shards = mesh.shape[axis]
    dtype_bits = image.dtype.itemsize * 8
    eff_bits = bits_stored if (config.use_bits_stored and bits_stored) else dtype_bits
    max_val = (1 << eff_bits) - 1
    if int(image.max()) > max_val:
        max_val = (1 << dtype_bits) - 1

    msg_bits = _as_payload_bits(payload)
    total_bits = int(msg_bits.size)
    lpad = 1 << max(3, (max(total_bits, 1) - 1).bit_length())
    msg_pad = np.zeros(lpad, dtype=np.uint8)
    msg_pad[:total_bits] = msg_bits

    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r} (auto/pallas/xla)")
    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pallas_supported(h, w, n_shards)
            else "xla"
        )
    if backend == "pallas":
        from ..ops import pallas_pee as pp

        if not pallas_supported(h, w, n_shards):
            raise ValueError(
                f"per-shard Pallas route unsupported for {h}x{w} over "
                f"{n_shards} shards"
            )
        msg2d, l2 = pp.prep_messages(msg_pad[None], h * w)
        msg2d_d = jax.device_put(
            jnp.asarray(msg2d), NamedSharding(mesh, P())
        )

        def run_pass(img, base, wnt, parity, t):
            stego, over, used_k, nproc_k = _embed_pass_pallas_jit(
                img, msg2d_d, jnp.int32(base), jnp.int32(wnt),
                parity=parity, t=t, max_val=max_val, h=h, w=w, l2=l2,
                mesh=mesh, axis=axis, interpret=interpret,
            )
            return stego, over, used_k[0], nproc_k[0]
    else:
        def run_pass(img, base, wnt, parity, t):
            # real h threaded explicitly: pass 2 receives pass 1's sharded
            # (possibly row-padded) stego, whose shape no longer tells it
            return embed_pass_tiled(
                img, msg_pad, base, wnt, parity, t, max_val, mesh, axis, h=h
            )

    img0 = (
        jax.device_put(jnp.asarray(image), NamedSharding(mesh, P(axis, None)))
        if backend == "pallas" else image
    )
    # histogram-driven threshold selection — identical rule to
    # models.pee.encode_pee_array, so the container stays byte-identical to
    # the single-device encoder's (round-2 verdict #3). The histogram is a
    # planning-only pass over the unsharded image.
    cap0 = pee_ops.capacities_by_threshold(
        pee_ops.capacity_histogram(image, 0, _MAX_T, max_val)
    )
    cap1 = pee_ops.capacities_by_threshold(
        pee_ops.capacity_histogram(image, 1, _MAX_T, max_val)
    )
    t = select_threshold(cap0, cap1, total_bits, config.pee_threshold)
    if t is None:
        t = _MAX_T  # one exact attempt (the histogram only schedules)
    result = None
    while t <= _MAX_T:
        s0, o0, u0, n0 = run_pass(img0, 0, total_bits, 0, t)
        used0 = int(u0)
        want1 = total_bits - used0
        if want1 <= 0:
            result = (t, s0, o0, used0, int(n0), None, 0, 0, 1)
            break
        # s0 is already sharded P(axis, None); device_put inside is a no-op,
        # so the intermediate image never visits the host
        s1, o1, u1, n1 = run_pass(s0, used0, want1, 1, t)
        if int(u1) < want1:
            t += 1  # pass-interaction shortfall of the estimate; escalate
            continue
        result = (t, s1, o0, used0, int(n0), o1, int(u1), int(n1), 2)
        break
    if result is None:
        from ..errors import CapacityError

        raise CapacityError(
            f"payload of {total_bits} bits exceeds PEE capacity even at "
            f"T={_MAX_T}"
        )
    t, stego_d, over0, used0, nproc0, over1, used1, nproc1, passes = result
    stego_np = np.asarray(stego_d)[:h]   # drop pad-and-mask rows
    # pack the overflow map ON DEVICE (8x less traffic off the mesh, no
    # single-core np.packbits; same blob bytes as before)
    from ..ops import embed as embed_ops

    over_d = jnp.asarray(over0) if over1 is None else (
        jnp.asarray(over0) | jnp.asarray(over1)
    )
    # drop pad-and-mask rows BEFORE packing: the blob must be byte-identical
    # to the single-device encoder's h*w-bit map
    map_blob = zlib.compress(
        np.asarray(embed_ops.pack_bits_batch(over_d[:h][None]))[0].tobytes()
    )

    metrics = None
    if config.compute_metrics:
        from .tile import pair_stats_tiled

        metrics = metric_ops.quality_report(
            pair_stats_tiled(image, stego_np, mesh, axis)
        )

    from ..io.codecs import get as get_codec

    stego_blob = get_codec(config.codec).encode(stego_np)
    ext = container_io.pack_pee_ext(t, passes, nproc0, nproc1, used0, used1)
    meta = container_io.ContainerMeta(
        version=2, codec=config.codec, strategy="pee", s=0,
        nbits=eff_bits, bits_stored=eff_bits, dtype=image.dtype,
        width=w, height=h, start_offset=0, seed=config.seed,
        payload_bits=total_bits, align_across_planes=False,
        has_bitmaps=True, sizes=(), indices=(), eff_lengths=(),
        plane_starts=(), ext=ext,
    )
    blob = container_io.pack(meta, map_blob, stego_blob)
    logger.info(
        "tiled pee encode: %dx%d over %d shards, T=%d, %d bits",
        h, w, mesh.shape[axis], t, total_bits,
    )
    from ..ops.decompose import DecompositionResult

    dec = DecompositionResult(
        s=0, nbits=eff_bits, entropy=0.0, target=0.0,
        mi=np.zeros(0), cumulative=np.zeros(0),
    )
    return EncodeResult(
        container=blob, stego=stego_np, meta=meta, decomposition=dec,
        metrics=metrics,
    )


def _collect_shard_bits(segs, cnts, out_len: int) -> np.ndarray:
    """Host assembly for the sharded-Pallas extract: per-shard tile runs
    (local order, exact counts) placed at the shard's global count prefix."""
    from ..ops.pallas_pee import collect_bits

    cnts = np.asarray(cnts)
    per_shard = collect_bits(segs, cnts, out_len)       # (K, out_len)
    totals = cnts.sum(axis=1)
    out = np.zeros(out_len, dtype=np.uint8)
    off = 0
    for k in range(per_shard.shape[0]):
        take = min(int(totals[k]), out_len - off)
        if take > 0:
            out[off : off + take] = per_shard[k, :take]
        off += int(totals[k])
    return out


def decode_container_tiled_pee(
    data: Union[bytes, container_io.Container],
    mesh: Mesh,
    axis: str = "tile",
    *,
    restore_original: bool = True,
    backend: str = "auto",
    interpret: bool = False,
):
    """Tile-sharded PEE decode: stego rows stay sharded through both inverse
    passes; per-shard bit runs assemble at their global rank prefixes.
    ``backend``/``interpret`` as in :func:`encode_array_tiled_pee`."""
    from ..models.pee import parse_pee_container_parts
    from ..pipeline import DecodeResult
    from ..io.codecs import get as get_codec

    cont = (
        container_io.parse(data) if isinstance(data, (bytes, bytearray))
        else data
    )
    meta = cont.meta
    if meta.strategy != "pee":
        raise ValueError(f"not a PEE container (strategy={meta.strategy})")
    (t, passes, nproc0, nproc1, bits0, bits1), overflow = (
        parse_pee_container_parts(cont)
    )
    stego = get_codec(meta.codec).decode(cont.stego_blob)
    if stego.dtype != meta.dtype:
        stego = stego.astype(meta.dtype)
    h, w = meta.height, meta.width
    max_val = (1 << meta.bits_stored) - 1
    if int(stego.max()) > max_val:
        max_val = (1 << (stego.dtype.itemsize * 8)) - 1
    out_len = 1 << max(3, (max(int(meta.payload_bits), 1) - 1).bit_length())

    n_shards = mesh.shape[axis]
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r} (auto/pallas/xla)")
    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu"
            and pallas_supported(h, w, n_shards)
            else "xla"
        )

    # shard the stego/overflow once; the inter-pass image stays on device.
    # Odd row counts are zero-padded per shard (pad-and-mask — the geometry
    # masks pad rows out of every pass; see embed_pass_tiled)
    sharding = NamedSharding(mesh, P(axis, None))
    h_pad = -(-h // n_shards) * n_shards
    stego_j = jnp.asarray(stego)
    overflow_j = jnp.asarray(overflow)
    if h_pad != h:
        stego_j = jnp.pad(stego_j, ((0, h_pad - h), (0, 0)))
        overflow_j = jnp.pad(overflow_j, ((0, h_pad - h), (0, 0)))
    img = jax.device_put(stego_j, sharding)
    bits1_arr = np.zeros(0, dtype=np.uint8)
    if backend == "pallas":
        if not pallas_supported(h, w, n_shards):
            raise ValueError(
                f"per-shard Pallas route unsupported for {h}x{w} over "
                f"{n_shards} shards"
            )
        over_u8 = jax.device_put(
            jnp.asarray(overflow).astype(jnp.uint8), sharding
        )
        if passes == 2:
            img, segs1, cnts1 = _extract_pass_pallas_jit(
                img, over_u8, jnp.int32(nproc1),
                parity=1, t=t, max_val=max_val, h=h, w=w,
                mesh=mesh, axis=axis, interpret=interpret,
            )
            bits1_arr = _collect_shard_bits(segs1, cnts1, out_len)
            bits1_arr = bits1_arr[: int(np.asarray(cnts1).sum())]
        img, segs0, cnts0 = _extract_pass_pallas_jit(
            img, over_u8, jnp.int32(nproc0),
            parity=0, t=t, max_val=max_val, h=h, w=w,
            mesh=mesh, axis=axis, interpret=interpret,
        )
        bits0_arr = _collect_shard_bits(segs0, cnts0, out_len)
        bits0_arr = bits0_arr[: int(np.asarray(cnts0).sum())]
    else:
        over_d = jax.device_put(overflow_j, sharding)
        if passes == 2:
            img, b1, n1 = extract_pass_tiled(
                img, over_d, nproc1, 1, t, max_val, out_len, mesh, axis, h=h
            )
            bits1_arr = b1[:n1]
        img, b0, n0 = extract_pass_tiled(
            img, over_d, nproc0, 0, t, max_val, out_len, mesh, axis, h=h
        )
        bits0_arr = b0[:n0]

    payload_bits = np.concatenate([bits0_arr, bits1_arr])[: meta.payload_bits]
    original = np.asarray(img)[:h] if restore_original else None
    return DecodeResult(
        payload_bits=payload_bits.astype(np.uint8),
        stego=stego,
        meta=meta,
        original=original,
    )
