"""Spatial (``tile``) sharding: one large image split across the mesh.

SURVEY §5's "long-context" disposition: the honest TPU analog of scaling a
long axis here is tiling a single large image's rows over devices, "with
embedding positions computed from global raster offsets so each shard writes
only its own tile (the ``(start + arange) % (h*w)`` pattern of
``/root/reference/src/codec.py:465`` becomes a per-shard index-window
predicate) and histogram/entropy reductions psum'ed across shards."

Design (zero pixel movement between shards):

* A plane's active region is a ring interval ``[start, start+len) mod n`` in
  global raster order. Its intersection with one shard's contiguous index
  range is at most **two** linear windows, so the whole embedding plan
  resolves host-side into per-shard ``(plane, local_start, len, msg_offset)``
  window tables (:func:`shard_windows`) — the device kernel inside
  ``shard_map`` is the same dense roll-and-mask program as
  :func:`codec_tcc_tpu.ops.embed.embed`, parameterized per shard.
* The payload bit array is replicated (1-D, tiny next to the image); each
  shard ``dynamic_slice``s only the windows it embeds.
* The only collective in the pipeline is one ``psum`` of the per-shard value
  histograms for the decomposition cut point. Embed/extract compile with **no
  collectives at all** (asserted in ``tests/test_tile.py`` on the compiled
  HLO).
* Extraction mirrors embedding: each shard emits its windows' bits rotated to
  message order (aligned rows); placement at message offsets is host memcpy
  work (:func:`assemble_tiled`), exactly like the batch pipeline's
  ``assemble_message``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncodeConfig
from ..io import container as container_io
from ..ops import decompose as decompose_ops
from ..ops import embed as embed_ops
from ..ops import metrics as metric_ops
from ..ops import segments as segment_ops
from ..utils.logging import get_logger

logger = get_logger("parallel.tile")

__all__ = [
    "TileParams",
    "shard_windows",
    "embed_tiled",
    "extract_tiled_aligned",
    "assemble_tiled",
    "histogram_tiled",
    "pair_stats_tiled",
    "encode_array_tiled",
    "decode_container_tiled",
]


@dataclass(frozen=True)
class TileParams:
    """Per-shard window tables: arrays are ``(n_shards, nwin) int32``."""

    n_shards: int
    nwin: int
    local_n: int                # flat pixels per shard
    plane_id: np.ndarray
    starts: np.ndarray          # local raster start within the shard
    lens: np.ndarray
    moffs: np.ndarray           # message bit offset of the window's first bit


def shard_windows(
    pp: segment_ops.PlanePlan, n: int, n_shards: int,
    local_n: Optional[int] = None,
) -> TileParams:
    """Resolve a :class:`PlanePlan` into per-shard windows.

    A plane's ring interval ``[start, start+len) mod n`` splits into at most
    two linear intervals; each intersects a shard's contiguous range in at
    most one window — so ``nwin = 2 * s`` bounds the table width (padded to
    ``2 * nbits`` for shape stability across cut points).

    ``local_n`` is the flat size each shard actually holds. When the
    geometry does not divide the mesh, callers row-pad the image
    (:func:`_tile_sharded`) and pass the padded per-shard size here; the
    ring arithmetic stays mod the REAL ``n``, so the pad tail simply
    receives no windows.
    """
    if local_n is None:
        if n % n_shards:
            raise ValueError(
                f"flat size {n} not divisible by {n_shards} shards "
                f"(pass the padded local_n)"
            )
        local_n = n // n_shards
    nwin = 2 * pp.nbits
    k_shape = (n_shards, nwin)
    plane_id = np.zeros(k_shape, np.int32)
    starts = np.zeros(k_shape, np.int32)
    lens = np.zeros(k_shape, np.int32)
    moffs = np.zeros(k_shape, np.int32)
    for k in range(n_shards):
        base, top = k * local_n, (k + 1) * local_n
        j = 0
        for p in range(pp.s):
            st = int(pp.starts[p]) % n
            ln = min(int(pp.lengths[p]), n)
            mo = int(pp.offsets[p])
            if ln <= 0:
                continue
            # (global_start, global_end, bits consumed before this interval)
            if st + ln <= n:
                intervals = ((st, st + ln, 0),)
            else:
                intervals = ((st, n, 0), (0, st + ln - n, n - st))
            for a, b, consumed in intervals:
                lo, hi = max(a, base), min(b, top)
                if lo >= hi:
                    continue
                plane_id[k, j] = p
                starts[k, j] = lo - base
                lens[k, j] = hi - lo
                moffs[k, j] = mo + consumed + (lo - a)
                j += 1
    return TileParams(n_shards, nwin, local_n, plane_id, starts, lens, moffs)


def _embed_block(block, msg, plane_id, starts, lens, moffs):
    """Dense window embed on one shard's (local_h, W) block — the same
    roll-and-mask program as :func:`ops.embed.embed` but with runtime plane
    ids (a shard may hold two windows of the same plane)."""
    hh, ww = block.shape
    n_loc = hh * ww
    x = block.reshape(n_loc).astype(jnp.int32)
    iota = jnp.arange(n_loc, dtype=jnp.int32)
    nwin = plane_id.shape[0]
    for j in range(nwin):
        p = plane_id[j]
        seg = jax.lax.dynamic_slice(msg, (moffs[j],), (n_loc,)).astype(jnp.int32)
        bits = jnp.roll(jnp.where(iota < lens[j], seg, 0), starts[j])
        rel = iota - starts[j]
        rel = jnp.where(rel < 0, rel + n_loc, rel)
        active = rel < lens[j]
        newv = (x & ~(1 << p)) | (bits << p)
        x = jnp.where(active, newv, x)
    return x.reshape(hh, ww).astype(block.dtype)


def _extract_block(block, plane_id, starts, lens):
    """Mirror of :func:`_embed_block`: (nwin, local_n) aligned bit rows."""
    hh, ww = block.shape
    n_loc = hh * ww
    flat = block.reshape(n_loc).astype(jnp.int32)
    iota = jnp.arange(n_loc, dtype=jnp.int32)
    rows = []
    nwin = plane_id.shape[0]
    for j in range(nwin):
        plane = ((flat >> plane_id[j]) & 1).astype(jnp.uint8)
        aligned = jnp.roll(plane, -starts[j])
        rows.append(jnp.where(iota < lens[j], aligned, 0))
    return jnp.stack(rows)


def shard_rows(h: int, n_shards: int) -> int:
    """Rows per shard after ceil-padding to an even row split."""
    return -(-h // n_shards)


def _tile_sharded(image, mesh: Mesh, axis: str):
    """Row-shard a 2-D array, zero-padding the bottom rows when the height
    does not divide the axis. The tile layer's window tables and rank
    formulas only ever address the real ``[0, h*w)`` raster range, so pad
    rows are dead weight the callers slice away — no kernel needs a mask
    (round-3 VERDICT missing #3: any HxW image must tile over any mesh)."""
    h = image.shape[0]
    n_shards = mesh.shape[axis]
    h_pad = shard_rows(h, n_shards) * n_shards
    if h_pad != h:
        image = jnp.pad(
            image, ((0, h_pad - h),) + ((0, 0),) * (image.ndim - 1)
        )
    return jax.device_put(image, NamedSharding(mesh, P(axis, None)))


def _block_embed_band(band, msg, bases, seg_len, moffs, s, row0, nbits, block):
    """Variance-ranked block embed on one shard's row band: the same dense
    per-pixel rank compare as :func:`ops.embed.embed_block_adaptive`, with
    the rank formula evaluated at GLOBAL row coordinates (``row0`` = the
    shard's first global row). ``bases`` (per-plane tile base offsets) and
    ``msg`` are replicated — the rank of a band pixel depends only on its
    own tile's base, so no cross-shard communication is compiled in (same
    claim as the raster tile kernels)."""
    from ..ops.embed import _dtype_keep_mask

    hh, ww = band.shape
    lpad = msg.shape[0]
    y = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0) + row0
    x = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    nw = -(-ww // block)
    ty = y // block
    tx = x // block
    tile_id = ty * nw + tx
    x0 = tx * block
    bw_real = jnp.minimum(block, ww - x0)
    r = (y - ty * block) * bw_real + (x - x0)
    acc = band
    for p in range(nbits):
        rank = bases[p][tile_id] + r
        active = (rank < seg_len[p]) & (p < s)
        midx = jnp.clip(moffs[p] + rank, 0, lpad - 1)
        bits = jnp.take(msg, midx, mode="clip")
        newv = (acc & _dtype_keep_mask(band.dtype, p)) | (
            bits.astype(band.dtype) << p
        )
        acc = jnp.where(active, newv, acc)
    return acc


@partial(jax.jit, static_argnames=("nbits", "block", "mesh", "axis"))
def _block_embed_tiled_jit(image, msg, bases, seg_len, moffs, s, *,
                           nbits, block, mesh, axis):
    def f(band, msg_, ba, sl, mo, ss):
        hh = band.shape[0]
        row0 = jax.lax.axis_index(axis) * hh
        return _block_embed_band(
            band, msg_, ba, sl, mo, ss, row0, nbits, block
        )

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P(), P()),
        out_specs=P(axis, None),
    )(image, msg, bases, seg_len, moffs, s)


def _host_block_geometry(h: int, w: int, block: int):
    """Plane-invariant half of ``ops.embed._block_fill_rank`` on host:
    ``(tile_id, r)`` flat arrays — per plane, ``rank = base[tile_id] + r``.
    Computed once per decode (the geometry does not depend on the plane),
    so the per-plane cost is one gather + one O(n) inverse permutation."""
    yy, xx = np.mgrid[0:h, 0:w]
    nw = -(-w // block)
    ty, tx = yy // block, xx // block
    x0 = tx * block
    bw = np.minimum(block, w - x0)
    r = (yy - ty * block) * bw + (xx - x0)
    return (ty * nw + tx).reshape(h * w), r.reshape(h * w)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _embed_tiled_jit(image, msg, plane_id, starts, lens, moffs, *, mesh, axis):
    def f(blk, msg_, pid, st, ln, mo):
        return _embed_block(blk, msg_, pid[0], st[0], ln[0], mo[0])

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )(image, msg, plane_id, starts, lens, moffs)


def embed_tiled(
    image, msg_pad: np.ndarray, tp: TileParams, mesh: Mesh, axis: str = "tile"
):
    """Embed into a row-sharded image. Returns the stego image, still sharded
    ``P(axis, None)``; no cross-shard communication is compiled in."""
    img_d = _tile_sharded(jnp.asarray(image), mesh, axis)
    msg_d = jax.device_put(jnp.asarray(msg_pad), NamedSharding(mesh, P()))
    return _embed_tiled_jit(
        img_d, msg_d, jnp.asarray(tp.plane_id), jnp.asarray(tp.starts),
        jnp.asarray(tp.lens), jnp.asarray(tp.moffs), mesh=mesh, axis=axis,
    )


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _extract_tiled_jit(stego, plane_id, starts, lens, *, mesh, axis):
    def f(blk, pid, st, ln):
        return _extract_block(blk, pid[0], st[0], ln[0])[None]

    return jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None, None),
    )(stego, plane_id, starts, lens)


def extract_tiled_aligned(stego, tp: TileParams, mesh: Mesh, axis: str = "tile"):
    """Per-shard aligned bit rows ``(n_shards, nwin, local_n)``."""
    stego_d = _tile_sharded(jnp.asarray(stego), mesh, axis)
    return _extract_tiled_jit(
        stego_d, jnp.asarray(tp.plane_id), jnp.asarray(tp.starts),
        jnp.asarray(tp.lens), mesh=mesh, axis=axis,
    )


def assemble_tiled(aligned, tp: TileParams, out_len: int) -> np.ndarray:
    """Host back half of tiled extraction: place each shard window's bits at
    its message offset (disjoint ranges — plain memcpys)."""
    aligned = np.asarray(aligned)
    out = np.zeros(out_len, dtype=np.uint8)
    for k in range(tp.n_shards):
        for j in range(tp.nwin):
            ln = int(tp.lens[k, j])
            mo = int(tp.moffs[k, j])
            if ln <= 0 or mo >= out_len:
                continue
            ln = min(ln, out_len - mo)
            out[mo : mo + ln] = aligned[k, j, :ln]
    return out


@partial(jax.jit, static_argnames=("nbins", "mesh", "axis"))
def _hist_tiled_jit(image, *, nbins, mesh, axis):
    def f(blk):
        flat = jnp.sort(blk.reshape(-1).astype(jnp.int32))
        edges = jnp.arange(nbins + 1, dtype=jnp.int32)
        idx = jnp.searchsorted(flat, edges, side="left")
        return jax.lax.psum(jnp.diff(idx).astype(jnp.int32), axis)

    return jax.shard_map(
        f, mesh=mesh, in_specs=(P(axis, None),), out_specs=P()
    )(image)


def histogram_tiled(image, nbins: int, mesh: Mesh, axis: str = "tile") -> np.ndarray:
    """Exact value histogram of a row-sharded image: per-shard sort +
    searchsorted, one ``psum`` across the ``tile`` axis — the decomposition's
    only collective. Row padding from :func:`_tile_sharded` lands entirely
    in bin 0 (the pad is zeros), so the exact correction is one subtraction."""
    h, w = np.shape(image)
    n_shards = mesh.shape[axis]
    img_d = _tile_sharded(jnp.asarray(image), mesh, axis)
    counts = np.asarray(_hist_tiled_jit(img_d, nbins=nbins, mesh=mesh, axis=axis))
    pad = (shard_rows(h, n_shards) * n_shards - h) * w
    if pad:
        counts = counts.copy()
        counts[0] -= pad
    return counts


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _stats_tiled_jit(a, b, *, mesh, axis):
    def f(blk_a, blk_b):
        st = metric_ops.pair_stats(blk_a, blk_b)
        return {
            k: jax.lax.psum(v, axis)
            if k not in ("max_absdiff", "max_a", "max_b")
            else jax.lax.pmax(v, axis)
            for k, v in st.items()
        }

    return jax.shard_map(
        f, mesh=mesh, in_specs=(P(axis, None), P(axis, None)), out_specs=P()
    )(a, b)


def pair_stats_tiled(a, b, mesh: Mesh, axis: str = "tile"):
    """Fused pair statistics over two row-sharded images (psum/pmax-combined
    per-shard moments) — feed to :func:`ops.metrics.quality_report`.

    Zero pad rows contribute nothing to any sum/max/changed moment (the
    pixel values are unsigned), so the only padding correction is pinning
    ``n`` to the REAL pixel count."""
    h = min(int(np.shape(a)[0]), int(np.shape(b)[0]))
    w = int(np.shape(a)[1])
    # one input may arrive pre-padded (a stego straight off embed_tiled):
    # slice both to the real height, then let _tile_sharded re-pad equally
    a_d = _tile_sharded(jnp.asarray(a)[:h], mesh, axis)
    b_d = _tile_sharded(jnp.asarray(b)[:h], mesh, axis)
    stats = dict(_stats_tiled_jit(a_d, b_d, mesh=mesh, axis=axis))
    stats["n"] = np.float32(h * w)
    return stats


# ---------------------------------------------------------------------------
# pipeline entry points (single large image across the mesh)
# ---------------------------------------------------------------------------


def encode_array_tiled(
    image: np.ndarray,
    payload: Union[bytes, str, np.ndarray],
    config: EncodeConfig = EncodeConfig(),
    mesh: Optional[Mesh] = None,
    axis: str = "tile",
    *,
    bits_stored: Optional[int] = None,
):
    """Tile-sharded counterpart of :func:`codec_tcc_tpu.pipeline.encode_array`
    (strategies ``multi_plane`` / ``hybrid`` / ``block_adaptive``) producing
    a bit-identical container: same plan math, same container bytes — only
    the embed runs sharded. Any geometry tiles over any mesh: rows that do
    not divide the axis are zero-padded per shard and sliced away
    (pad-and-mask, round-3 VERDICT missing #3)."""
    from ..pipeline import EncodeResult, _as_payload_bits, _plane_bucket

    config = config.validate()
    if config.strategy not in ("multi_plane", "hybrid", "block_adaptive"):
        raise ValueError(
            f"tiled encoding supports multi_plane/hybrid/block_adaptive, "
            f"not {config.strategy}"
        )
    if mesh is None:
        raise ValueError("encode_array_tiled requires a mesh with a tile axis")
    image = np.asarray(image)
    h, w = image.shape
    n = h * w
    n_shards = mesh.shape[axis]
    dtype_bits = image.dtype.itemsize * 8

    nbits = config.nbits
    if nbits is None:
        nbits = bits_stored if (config.use_bits_stored and bits_stored) else dtype_bits
    nbits = min(nbits, dtype_bits)

    msg_bits = _as_payload_bits(payload)
    total_bits = int(msg_bits.size)

    # decomposition: psum'd per-shard histograms + exact host cut-point math
    max_val = 255 if image.dtype.itemsize == 1 else 65535
    counts = histogram_tiled(image, max_val + 1, mesh, axis)
    dec = decompose_ops.decompose(
        image, beta=config.beta, nbits=nbits, histogram_counts=counts
    )
    s = dec.s

    plan = segment_ops.distribute_segments(s, total_bits, config.seed)
    dropped = total_bits - sum(min(e, n) for e in plan.eff_lengths)
    if dropped > 0 and not config.allow_capacity_overflow:
        raise ValueError(
            f"payload of {total_bits} bits exceeds the usable capacity at s={s}"
        )

    kernel_bits = _plane_bucket(s, dtype_bits)
    if config.strategy == "hybrid":
        from ..ops import blocks as block_ops

        counts0 = np.asarray(
            block_ops.block_bit_counts(image, 0, config.search_block_size)
        )
        start = block_ops.best_offset_from_counts(
            counts0, h, w, config.search_block_size
        )
        pp = segment_ops.raster_plane_plan(
            plan, n, kernel_bits, start, config.align_across_planes
        )
    else:
        pp = segment_ops.raster_plane_plan(plan, n, kernel_bits, 0, True)

    if config.strategy == "block_adaptive":
        # variance-ranked placement: bases from one unsharded popcount pass
        # (plan-time host work, same as the hybrid start search above), then
        # the sharded band rank-compare embed — still zero collectives
        from ..pipeline import _block_bases

        bases = _block_bases(
            jnp.asarray(image), kernel_bits, s, config.block_size, h, w
        )
        msg_pad = embed_ops.pad_message(
            msg_bits, n, int(pp.offsets.max(initial=0))
        )
        img_d = _tile_sharded(jnp.asarray(image), mesh, axis)
        msg_d = jax.device_put(jnp.asarray(msg_pad), NamedSharding(mesh, P()))
        stego_d = _block_embed_tiled_jit(
            img_d, msg_d, jnp.asarray(bases), jnp.asarray(pp.lengths),
            jnp.asarray(pp.offsets), jnp.int32(s),
            nbits=kernel_bits, block=config.block_size, mesh=mesh, axis=axis,
        )
    else:
        tp = shard_windows(pp, n, n_shards, shard_rows(h, n_shards) * w)
        msg_pad = embed_ops.pad_message(
            msg_bits, tp.local_n, int(tp.moffs.max(initial=0))
        )
        stego_d = embed_tiled(image, msg_pad, tp, mesh, axis)

    metrics = None
    if config.compute_metrics:
        stats = pair_stats_tiled(image, stego_d, mesh, axis)
        metrics = metric_ops.quality_report(stats)
    stego = np.asarray(stego_d)[:h]   # drop any pad rows

    from ..pipeline import _host_xor_maps

    maps = _host_xor_maps(image, stego, s)
    from ..io.codecs import get as get_codec

    stego_blob = get_codec(config.codec).encode(stego)
    bitmaps_packed = config.store_bitmaps and n % 8 == 0
    if not config.store_bitmaps:
        bitmaps_blob = b""
    elif bitmaps_packed:
        bitmaps_blob = container_io.compress_bitmaps_packed(maps)
    else:
        bitmaps_blob = container_io.compress_bitmaps(maps)
    meta = container_io.ContainerMeta(
        version=2,
        codec=config.codec,
        strategy=config.strategy,
        s=s,
        nbits=nbits,
        bits_stored=bits_stored or nbits,
        dtype=image.dtype,
        width=w,
        height=h,
        start_offset=pp.base_start_offset,
        seed=config.seed,
        payload_bits=total_bits,
        align_across_planes=pp.align_across_planes,
        has_bitmaps=config.store_bitmaps,
        bitmaps_packed=bitmaps_packed,
        sizes=plan.sizes,
        indices=plan.indices,
        eff_lengths=tuple(int(v) for v in pp.lengths[:s]),
        plane_starts=tuple(int(v) for v in pp.starts[:s]),
        ext=(container_io.pack_block_ext(config.block_size)
             if config.strategy == "block_adaptive" else b""),
    )
    blob = container_io.pack(meta, bitmaps_blob, stego_blob)
    logger.info(
        "tiled encode: %dx%d over %d shards, s=%d, %d bits",
        h, w, n_shards, s, total_bits,
    )
    return EncodeResult(
        container=blob, stego=stego, meta=meta, decomposition=dec, metrics=metrics
    )


def decode_container_tiled(
    data: Union[bytes, container_io.Container],
    mesh: Mesh,
    axis: str = "tile",
    *,
    restore_original: bool = True,
):
    """Tile-sharded decode for raster-strategy containers: the stego image is
    row-sharded, each shard extracts only its windows, assembly is host work."""
    from ..pipeline import DecodeResult, _plane_bucket, _plane_plan_from_meta
    from ..io.codecs import get as get_codec

    cont = container_io.parse(data) if isinstance(data, (bytes, bytearray)) else data
    meta = cont.meta
    if meta.strategy not in ("multi_plane", "hybrid", "block_adaptive",
                             "unknown"):
        raise ValueError(f"tiled decode does not support {meta.strategy}")
    stego = get_codec(meta.codec).decode(cont.stego_blob)
    if meta.version == 1:
        meta.dtype = stego.dtype   # v1 records no dtype; trust the payload
    elif stego.dtype != meta.dtype:
        stego = stego.astype(meta.dtype)
    if stego.shape != (meta.height, meta.width):
        # same format-error contract as pipeline.decode_container and the
        # batch group decoder: a tampered/corrupt blob must not surface as
        # a raw numpy broadcast error (or silently truncated payload bits)
        raise ValueError(
            f"Invalid file: decoded stego shape {stego.shape} != header "
            f"{(meta.height, meta.width)}"
        )
    h, w = meta.height, meta.width
    n = h * w
    kernel_bits = _plane_bucket(meta.s, stego.dtype.itemsize * 8)
    starts, lengths, offsets = _plane_plan_from_meta(meta, n, kernel_bits)

    if meta.strategy == "block_adaptive":
        return _decode_block_tiled(
            cont, stego, lengths, offsets, kernel_bits, mesh, axis,
            restore_original,
        )
    pp = segment_ops.PlanePlan(
        nbits=kernel_bits, s=meta.s, total_bits=meta.payload_bits,
        starts=starts, lengths=lengths, offsets=offsets,
        base_start_offset=meta.start_offset,
        align_across_planes=meta.align_across_planes,
        segment=None,  # type: ignore[arg-type]
    )
    n_shards = mesh.shape[axis]
    tp = shard_windows(pp, n, n_shards, shard_rows(h, n_shards) * w)
    aligned = extract_tiled_aligned(stego, tp, mesh, axis)
    bits = assemble_tiled(aligned, tp, max(int(meta.payload_bits), 1))[
        : meta.payload_bits
    ]

    original = None
    if restore_original and meta.has_bitmaps:
        diff = cont.diff(stego.dtype)
        if diff is not None:
            original = stego ^ diff
    return DecodeResult(bits, stego, meta, original)


def _decode_block_tiled(
    cont, stego: np.ndarray, lengths: np.ndarray, offsets: np.ndarray,
    kernel_bits: int, mesh: Mesh, axis: str, restore_original: bool,
):
    """Tiled decode of a block_adaptive container: each shard returns its
    band's raw plane bits (the same dense extraction kernel as the raster
    path, with full-band windows), and the host places them at message
    positions via the rank permutation — ranks are a pure function of the
    restored original's tile bases, so nothing but plane bits crosses the
    link and no device argsort/scatter is compiled."""
    from ..pipeline import DecodeResult, _block_bases

    meta = cont.meta
    h, w = meta.height, meta.width
    n = h * w
    diff = cont.diff(stego.dtype)
    if diff is None:
        raise ValueError(
            "block_adaptive extraction requires the XOR location maps"
        )
    original = stego ^ diff
    block = container_io.parse_block_ext(meta.ext)

    # bases from the restored original — the SAME helper the encoder and
    # single-image decoder use, so the ranking can never drift
    bases = _block_bases(
        jnp.asarray(original), kernel_bits, meta.s, block, h, w
    )

    # full-band "windows": plane p over the whole local range — reuses the
    # raster extraction kernel with trivial windows, so the sharded device
    # pass is identical machinery. Pad rows (bottom of the last shard) emit
    # garbage bits past index n, dropped by the slice below.
    n_shards = mesh.shape[axis]
    local_n = shard_rows(h, n_shards) * w
    nplanes = min(meta.s, kernel_bits)  # only embedded planes cross the link
    plane_id = np.tile(np.arange(nplanes, dtype=np.int32), (n_shards, 1))
    zeros = np.zeros((n_shards, nplanes), dtype=np.int32)
    full = np.full((n_shards, nplanes), local_n, dtype=np.int32)
    stego_d = _tile_sharded(jnp.asarray(stego), mesh, axis)
    aligned = np.asarray(_extract_tiled_jit(
        stego_d, jnp.asarray(plane_id), jnp.asarray(zeros),
        jnp.asarray(full), mesh=mesh, axis=axis,
    ))  # (n_shards, nplanes, local_n): raw plane bits, band order
    planes = aligned.transpose(1, 0, 2).reshape(nplanes, -1)[:, :n]

    out = np.zeros(max(int(meta.payload_bits), 1), dtype=np.uint8)
    tile_id, r = _host_block_geometry(h, w, block)
    order = np.empty(n, dtype=np.intp)
    for p in range(nplanes):
        ln = int(lengths[p])
        if ln <= 0:
            continue
        rank = bases[p][tile_id] + r
        # rank is a bijection onto 0..n-1, so its inverse is an O(n)
        # assignment, not an argsort (the tile layer exists for images
        # where n log n host sorts are seconds on the serving core)
        order[rank] = np.arange(n, dtype=np.intp)
        mo = int(offsets[p])
        take = min(ln, out.size - mo)
        if take > 0:
            out[mo : mo + take] = planes[p][order[:take]]
    bits = out[: meta.payload_bits]
    return DecodeResult(
        bits, stego, meta, original if restore_original else None
    )
