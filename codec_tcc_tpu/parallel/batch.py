"""Batched (data-parallel) encode/extract over a device mesh.

The reference processes one image per process, serially
(``/root/reference/src/mse.py:265-295`` even loops pairs in Python). Here a
batch of images is a ``(B, H, W)`` tensor sharded over the mesh's ``dp`` axis
with ``NamedSharding``; the per-image kernels from :mod:`codec_tcc_tpu.ops`
are ``vmap``-ped, and XLA inserts the collectives (per the scaling-book
recipe: pick a mesh, annotate shardings, let the compiler place ``psum``).

Per-image *plans* (cut point, segment windows) stay host work: each image's
histogram comes back from one vmapped device pass, the exact float64 cut-point
replay runs per image on host (microseconds), and the resulting plane-plan
arrays ship back as ``(B, nbits) int32`` tensors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncodeConfig
from ..errors import CapacityError
from ..ops import decompose as decompose_ops
from ..ops import embed as embed_ops
from ..ops import histogram as hist_ops
from ..ops import segments as segment_ops
from ..utils import bits as bit_utils

__all__ = [
    "BatchPlan", "plan_batch", "encode_batch", "extract_batch",
    "batched_histograms", "BatchEncodeResult", "encode_batch_containers",
    "decode_batch_containers",
]


@partial(jax.jit, static_argnames=("nbins",))
def batched_histograms(images: jax.Array, nbins: int) -> jax.Array:
    """(B, H, W) -> (B, nbins) exact histograms (vmapped sort-based)."""
    return jax.vmap(lambda im: hist_ops.value_histogram(im, nbins))(images)


_embed_batch = jax.jit(
    jax.vmap(embed_ops.embed, in_axes=(0, 0, 0, 0, 0, 0, None)),
    static_argnames=("nbits",),
)

_extract_aligned_batch = jax.jit(
    jax.vmap(embed_ops.extract_aligned, in_axes=(0, 0, 0, 0, None)),
    static_argnames=("nbits",),
)


@dataclass
class BatchPlan:
    s: np.ndarray            # (B,) per-image cut points
    starts: np.ndarray       # (B, nbits)
    lengths: np.ndarray      # (B, nbits)
    offsets: np.ndarray      # (B, nbits)
    msgs: np.ndarray         # (B, Lpad) padded message bits
    payload_bits: np.ndarray # (B,)
    nbits: int
    lpad: int
    # container-packing extras (filled by plan_batch; explicit-plan builders
    # like parallel.volume may leave the defaults)
    base_offsets: Optional[np.ndarray] = None   # (B,) hybrid start offsets
    align: bool = True
    seed: int = 42


def plan_batch(
    images: np.ndarray,
    payloads: Sequence[Union[bytes, str, np.ndarray]],
    config: EncodeConfig = EncodeConfig(),
    *,
    histograms: Optional[np.ndarray] = None,
    nbits: Optional[int] = None,
    base_offsets: Optional[Sequence[int]] = None,
) -> BatchPlan:
    """Host-side planning for a batch: per-image decomposition (from one
    vmapped histogram pass) + segment plans, padded to a common ``Lpad``.

    ``config.strategy`` selects ``multi_plane`` (every plane starts at
    raster 0), ``hybrid`` (per-image variance-chosen start offset from one
    vmapped tile-popcount pass, SURVEY hybrid semantics with defect B4
    fixed), or ``block_adaptive`` (multi_plane-shaped plan; the
    variance-ranked tile placement is per-image embed state, not plan
    state). PEE goes through :mod:`parallel.batch_pee`.

    ``nbits`` caps the decomposition's plane search exactly like the
    single-image pipeline's bits_stored-derived cap (defect B6 fixed);
    leaving it None decomposes over the full dtype width.

    ``base_offsets`` (hybrid only) supplies precomputed per-image start
    offsets so planning never touches the device: the serving path computes
    them from the host-resident batch (:func:`hybrid_base_offsets_host`),
    which keeps the whole plan stage off the upload DMA's critical path
    (round-5; the device scan's ``np.asarray`` used to absorb the entire
    image-upload tail into the plan stage)."""
    b, h, w = images.shape
    n = h * w
    itemsize = np.dtype(images.dtype).itemsize
    dtype_bits = itemsize * 8
    max_val = 255 if itemsize == 1 else 65535
    if nbits is not None and nbits < 1:
        raise ValueError(f"nbits must be >= 1, got {nbits}")
    dec_nbits = dtype_bits if nbits is None else min(nbits, dtype_bits)

    if histograms is None:
        histograms = np.asarray(batched_histograms(images, max_val + 1))

    bit_arrays: List[np.ndarray] = []
    for p in payloads:
        if isinstance(p, str):
            bit_arrays.append(bit_utils.message_to_bits(p))
        elif isinstance(p, (bytes, bytearray)):
            bit_arrays.append(bit_utils.bytes_to_bits(bytes(p)))
        else:
            bit_arrays.append(np.asarray(p, dtype=np.uint8))

    s_arr = np.zeros(b, dtype=np.int32)
    payload_bits = np.array([int(x.size) for x in bit_arrays], dtype=np.int64)
    plans = []
    # decompose only reads dtype/size once histogram_counts is supplied —
    # hand it a zero-alloc host proxy instead of images[i]: indexing a
    # device-resident batch dispatches one gather per image (32 stray
    # device round-trips inside the plan stage when the caller passed
    # imgs_dev, as the serving path does)
    img_proxy = np.broadcast_to(np.zeros((), dtype=images.dtype), (h, w))
    for i in range(b):
        dec = decompose_ops.decompose(
            img_proxy, beta=config.beta, nbits=dec_nbits,
            histogram_counts=histograms[i], full_curve=False,
        )
        s_arr[i] = dec.s
        plans.append(
            segment_ops.distribute_segments(dec.s, int(payload_bits[i]), config.seed)
        )

    # bucket the static kernel unroll to the batch's largest cut point
    from ..pipeline import _plane_bucket

    nbits = _plane_bucket(int(s_arr.max(initial=1)), dtype_bits)

    if config.strategy == "hybrid":
        if base_offsets is None:
            base_offsets = hybrid_base_offsets(
                images, h, w, config.search_block_size
            )
        align = config.align_across_planes
    elif config.strategy in ("multi_plane", "block_adaptive"):
        # block_adaptive shares the multi_plane raster plan (start 0,
        # aligned segments — pipeline.encode_array uses the same
        # raster_plane_plan call); its variance-ranked placement happens in
        # the embed kernel via per-image tile bases, not in the plan
        base_offsets = [0] * b
        align = True
    else:
        raise ValueError(
            f"batch planning supports raster strategies only, not "
            f"'{config.strategy}' (use the single-image pipeline)"
        )

    starts = np.zeros((b, nbits), dtype=np.int32)
    lengths = np.zeros((b, nbits), dtype=np.int32)
    offsets = np.zeros((b, nbits), dtype=np.int32)
    max_need = 0
    for i in range(b):
        pp = segment_ops.raster_plane_plan(plans[i], n, nbits, base_offsets[i], align)
        starts[i] = pp.starts
        lengths[i] = pp.lengths
        offsets[i] = pp.offsets
        max_need = max(max_need, int(pp.offsets.max(initial=0)) + n, int(payload_bits[i]))

    lpad = 1 << max(3, (max_need - 1).bit_length())
    msgs = np.zeros((b, lpad), dtype=np.uint8)
    for i, bits in enumerate(bit_arrays):
        msgs[i, : bits.size] = bits

    return BatchPlan(
        s=s_arr, starts=starts, lengths=lengths, offsets=offsets,
        msgs=msgs, payload_bits=payload_bits, nbits=nbits, lpad=lpad,
        base_offsets=np.asarray(base_offsets, dtype=np.int64), align=align,
        seed=config.seed,
    )


@partial(jax.jit, static_argnames=("nplanes", "block"))
def _batch_block_counts_jit(imgs, nplanes: int, block: int):
    """Module-level jit of the vmapped tile popcounts: a fresh eager
    ``jax.vmap(lambda ...)`` per call re-traces every time and executes the
    batch op-by-op (each op a separate dispatch over the dev link — the
    round-4 probes measured this stage in the hundreds of seconds); one
    compiled program runs it in under a second."""
    from ..ops import blocks as block_ops

    return jax.vmap(
        lambda im: block_ops.block_bit_counts_all(im, nplanes, block)
    )(imgs)


def _batch_block_bases(
    imgs_dev, nbits: int, s_arr: np.ndarray, block: int, h: int, w: int
) -> np.ndarray:
    """Per-image, per-plane variance-ranked tile base offsets for the fused
    block_adaptive batch: one vmapped popcount dispatch for every (image,
    plane), then the exact integer-key host ranking per plane — the batched
    twin of ``pipeline._block_bases``. Rows for planes >= s_i stay zero
    (their segment lengths are zero, the kernel never reads them)."""
    from ..ops import blocks as block_ops

    b = imgs_dev.shape[0]
    max_s = max(int(s_arr.max(initial=1)), 1)
    counts = np.asarray(_batch_block_counts_jit(imgs_dev, max_s, block))
    ntiles = (-(-h // block)) * (-(-w // block))
    bases = np.zeros((b, nbits, ntiles), dtype=np.int32)
    for i in range(b):
        for p in range(int(s_arr[i])):
            bases[i, p] = block_ops.block_base_offsets(
                counts[i, p], h, w, block
            )[0]
    return bases


@partial(jax.jit, static_argnames=("nbits", "block"))
def _block_embed_batch(imgs, msgs, bases, lengths, offsets, s, nbits, block,
                       msg_rows=None):
    """One fused dispatch: vmapped variance-ranked block embed (the batched
    twin of ``pipeline._fused_block_embed_step``'s embed half).

    ``msg_rows`` — ``(B, nbits, ntiles, block^2)`` host-pre-sliced plane
    windows (``ops.embed.block_msg_rows``) — removes the kernel's traced
    window slice on uniform tilings; when given, ``msgs`` may be a tiny
    dummy (the uniform route never reads it)."""
    from ..ops.embed import embed_block_adaptive

    if msg_rows is None:
        return jax.vmap(
            lambda im, mg, ba, le, of, ss: embed_block_adaptive(
                im, mg, ba, le, of, ss, nbits, block
            )
        )(imgs, msgs, bases, lengths, offsets, s)
    return jax.vmap(
        lambda im, mg, ba, le, of, ss, mr: embed_block_adaptive(
            im, mg, ba, le, of, ss, nbits, block, mr
        )
    )(imgs, msgs, bases, lengths, offsets, s, msg_rows)


def _preplaced_layout(n: int):
    """(n_buf, tile, wpp) for the preplaced kernels: the direct layout when
    N tiles evenly, the padded split-window layout otherwise."""
    from ..ops import pallas_embed as pe

    if pe.direct_ok(n):
        return n, pe.preferred_tile(n), 1
    n_buf, tile = pe.padded_flat(n)
    return n_buf, tile, 2


_PREPLACED_HBM_CAP = 2 << 30    # bits-buffer budget for the preplaced layout


def _msg_prefix(plan: "BatchPlan") -> np.ndarray:
    """Payload-covering prefix of ``plan.msgs`` for the device relayouts:
    ``plan.msgs`` carries +N window slack for the windowed kernels, but the
    device preplace pads internally, so ship only a power-of-two prefix
    covering every message offset (offsets never exceed the payload size)."""
    p2 = 1 << max(
        3,
        int(max(plan.payload_bits.max(initial=1),
                plan.offsets.max(initial=0) + 1) - 1).bit_length(),
    )
    return plan.msgs[:, : min(p2, plan.msgs.shape[1])]


def _pick_pallas_backend(shape: tuple, nbits: int, mesh: Optional[Mesh]) -> str:
    """'packed' (fastest, round 3: all plane windows folded on device into
    per-pixel clear/value words, embed = one fused HBM-bound XLA sweep —
    ~7 GPix/s cycle at B=256 vs ~5.5 for 'preplaced'; no tile constraint,
    any N via pad-to-128) unless its 2-words/pixel buffer pair would blow
    the HBM budget; then 'preplaced' (host/device-positioned plane bits,
    Mosaic kernels), then the windowed 'pallas' kernels (O(message)
    memory); 'xla' off-TPU with no mesh.

    Under a ``dp`` mesh the packed tier still applies on any platform: it
    is pure elementwise XLA, so ``NamedSharding`` partitions it over the
    batch axis with zero collectives (the Mosaic tiers stay single-chip)."""
    import jax as _jax

    n = int(np.prod(shape[1:]))
    b = int(shape[0])
    n_buf128 = (n + 127) // 128 * 128
    packed_fits = 2 * b * n_buf128 * 2 <= _PREPLACED_HBM_CAP  # clear+value
    if mesh is not None:
        return "packed" if ("dp" in mesh.axis_names and packed_fits) else "xla"
    if _jax.default_backend() != "tpu":
        return "xla"
    from ..ops import pallas_embed as pe

    if packed_fits:
        return "packed"
    if not pe.preplaced_ok(n):
        return "xla"
    bits_bytes = n * b * nbits
    if not pe.direct_ok(n):
        # odd-N geometries only have the preplaced (padded) route; the
        # windowed kernels need the direct layout
        return "preplaced" if bits_bytes <= _PREPLACED_HBM_CAP else "xla"
    return "preplaced" if bits_bytes <= _PREPLACED_HBM_CAP else "pallas"


@partial(jax.jit, static_argnames=("n", "nbits", "n_buf", "max_s"))
def _packed_embed_jit(imgs, msgs, st, ln, of, n, nbits, n_buf, max_s):
    """The packed tier as ONE program: preplace + embed, plus (when
    ``max_s >= 1``) the bit-packed XOR maps — the single-image hot path
    paid three dispatches (preplace, embed, xor) at the tunnel's fixed
    ~7 ms each for one fused HBM sweep's worth of work. This jit is the
    ONLY implementation of the packed-tier protocol; ``encode_batch``'s
    'packed' branch delegates here with ``max_s=0`` (maps skipped).

    Returns ``(stego (B, n) in the images' dtype, packed maps (B, max_s,
    n/8) or None)``."""
    from ..ops import pallas_embed as pe

    b = imgs.shape[0]
    flat = imgs.reshape(b, n)
    clear3, value3 = pe.preplace_packed_device(
        msgs, st, ln, of, n, nbits, n_buf, dtype=imgs.dtype
    )
    buf = flat if n_buf == n else jnp.pad(flat, ((0, 0), (0, n_buf - n)))
    stego3 = pe.embed_batch_packed(
        buf.reshape(b, n_buf // 128, 128), clear3, value3
    )
    stego = stego3.reshape(b, n_buf)[:, :n]
    packed = (
        embed_ops.xor_maps_packed_batch(flat, stego, max_s) if max_s else None
    )
    return stego, packed


def _packed_with_maps_eligible(
    shape: tuple, nbits: int, mesh: Optional[Mesh], max_s: int
) -> bool:
    """Shared gate for the fused packed-tier+maps route (single image and
    serving batch): bit-packable geometry, >= 1 embedded plane, no mesh
    (sharded inputs keep the encode_batch device_put path), packed tier
    picked."""
    n = int(np.prod(shape[1:]))
    return (
        n % 8 == 0 and max_s >= 1 and mesh is None
        and _pick_pallas_backend(shape, nbits, None) == "packed"
    )


def encode_single_packed_with_maps(
    image_dev: jax.Array, plan: BatchPlan, s: int
):
    """Single-image TPU fast path: returns ``(stego (H, W) device, packed
    XOR maps (s, N/8) device)`` from one fused dispatch, or ``None`` when
    the packed tier or bit-packed maps are ineligible (caller falls back
    to :func:`encode_batch` + a separate maps dispatch)."""
    h, w = image_dev.shape
    n = h * w
    if not _packed_with_maps_eligible((1, h, w), plan.nbits, None, s):
        return None
    stego, packed = _packed_embed_jit(
        image_dev[None], jnp.asarray(_msg_prefix(plan)),
        jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
        jnp.asarray(plan.offsets),
        n, plan.nbits, (n + 127) // 128 * 128, s,
    )
    return stego[0].reshape(h, w), packed[0]


def encode_batch(
    images: np.ndarray,
    plan: BatchPlan,
    mesh: Optional[Mesh] = None,
    backend: str = "auto",
) -> jax.Array:
    """Fused batched embed; with a mesh, inputs are sharded on ``dp``.

    ``backend='auto'`` picks the fastest eligible tier (see
    :func:`_pick_pallas_backend`): 'packed' (~7 GPix/s cycle at B=256 on
    v5e; also the dp-sharded tier under a mesh), then the Mosaic
    'preplaced'/'pallas' kernels on single-chip TPU, else XLA.
    """
    if backend == "auto":
        backend = _pick_pallas_backend(images.shape, plan.nbits, mesh)
    if backend == "packed":
        b, h, w = np.shape(images)
        n = h * w
        imgs = jnp.asarray(images)
        msgs = jnp.asarray(_msg_prefix(plan))
        st, ln, of = (jnp.asarray(a)
                      for a in (plan.starts, plan.lengths, plan.offsets))
        if mesh is not None:
            shard2 = NamedSharding(mesh, P("dp", None))
            imgs = jax.device_put(imgs, NamedSharding(mesh, P("dp", None, None)))
            msgs = jax.device_put(msgs, shard2)
            st, ln, of = (jax.device_put(a, shard2) for a in (st, ln, of))
        stego, _ = _packed_embed_jit(
            imgs, msgs, st, ln, of, n, plan.nbits,
            (n + 127) // 128 * 128, 0,
        )
        return stego.reshape(b, h, w)
    if backend == "preplaced":
        from ..ops import pallas_embed as pe

        b, h, w = np.shape(images)
        n = h * w
        n_buf, tile, wpp = _preplaced_layout(n)
        # relayout on DEVICE from the compact messages: the raster-positioned
        # bit tensor is NP x N bytes per image and must never cross the host
        # link (it dominated e2e time on slow links).
        bits4 = pe.preplace_bits_device(
            jnp.asarray(_msg_prefix(plan)),
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            jnp.asarray(plan.offsets), n, plan.nbits, n_buf,
        )
        if wpp == 1:
            st2, ln2 = plan.starts, plan.lengths
            imgs3 = jnp.asarray(images).reshape(b, n // 128, 128)
        else:
            # odd-N route: zero-pad the flat images and split each logical
            # (wrapping) window into two non-wrapping ones
            st2, ln2 = pe.split_windows(plan.starts, plan.lengths, n)
            flat = jnp.asarray(images).reshape(b, n)
            flat = jnp.pad(flat, ((0, 0), (0, n_buf - n)))
            imgs3 = flat.reshape(b, n_buf // 128, 128)
        stego = pe.embed_batch_preplaced(
            imgs3, bits4, jnp.asarray(st2), jnp.asarray(ln2),
            plan.nbits, tile, wpp,
        )
        if wpp != 1:
            stego = stego.reshape(b, n_buf)[:, :n]
        return stego.reshape(b, h, w)
    if backend == "pallas":
        from ..ops import pallas_embed as pe

        b, h, w = images.shape
        n = h * w
        tile = pe.preferred_tile(n)
        msg2d, l2 = pe.shift_messages_2d(plan.msgs, n)
        padded = pe.embed_batch_padded(
            jnp.asarray(images).reshape(b, n // 128, 128),
            jnp.asarray(msg2d),
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            jnp.asarray(plan.offsets),
            plan.nbits, tile, l2,
        )
        return pe.unpad_stego(padded, b, n).reshape(b, h, w)

    imgs = jnp.asarray(images)
    msgs = jnp.asarray(plan.msgs)
    if mesh is not None:
        shard3 = NamedSharding(mesh, P("dp", None, None))
        shard2 = NamedSharding(mesh, P("dp", None))
        shard1 = NamedSharding(mesh, P("dp"))
        imgs = jax.device_put(imgs, shard3)
        msgs = jax.device_put(msgs, shard2)
        args = [
            jax.device_put(jnp.asarray(a), shard2)
            for a in (plan.starts, plan.lengths, plan.offsets)
        ]
        s = jax.device_put(jnp.asarray(plan.s), shard1)
    else:
        args = [jnp.asarray(a) for a in (plan.starts, plan.lengths, plan.offsets)]
        s = jnp.asarray(plan.s)
    return _embed_batch(imgs, msgs, *args, s, plan.nbits)


def extract_aligned_batch(
    stego: jax.Array,
    plan: BatchPlan,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """(B, nbits, H*W) aligned plane rows — the device half of extraction."""
    st = jnp.asarray(stego)
    if mesh is not None:
        st = jax.device_put(st, NamedSharding(mesh, P("dp", None, None)))
    return _extract_aligned_batch(
        st,
        jnp.asarray(plan.starts),
        jnp.asarray(plan.lengths),
        jnp.asarray(plan.s),
        plan.nbits,
    )


def extract_batch(
    stego: jax.Array,
    plan: BatchPlan,
    mesh: Optional[Mesh] = None,
    out_len: Optional[int] = None,
    backend: str = "auto",
) -> np.ndarray:
    """(B, out_len) message bits: device extraction + DEVICE assembly, so
    only the payload itself crosses the host link (the P x N aligned-rows
    tensor dominated end-to-end decode on slow host<->device links).

    The device assembly length is bucketed to the next power of two (jit
    specializations are per static out_len; on real TPU each is a remote
    compile) and sliced back on host."""
    from ..pipeline import _next_pow2

    out_len = out_len or plan.lpad
    pad_len = _next_pow2(max(out_len, 1))
    if backend == "auto":
        backend = _pick_pallas_backend(np.shape(stego), plan.nbits, mesh)
    if backend == "packed":
        from ..ops import pallas_embed as pe

        b = np.shape(stego)[0]
        n = int(np.prod(np.shape(stego)[1:]))
        n_buf = (n + 127) // 128 * 128
        flat = jnp.asarray(stego).reshape(b, n)
        if mesh is not None:
            flat = jax.device_put(flat, NamedSharding(mesh, P("dp", None)))
        if n_buf != n:
            flat = jnp.pad(flat, ((0, 0), (0, n_buf - n)))
        packed = pe.extract_packed_batch(
            flat.reshape(b, n_buf // 128, 128), plan.nbits
        )
        rows = pe.unpack_rows_device(
            packed.reshape(b, n_buf)[:, :n], plan.nbits
        )
        return np.asarray(embed_ops.assemble_raster_device(
            rows,
            jnp.asarray(plan.starts), jnp.asarray(plan.offsets),
            jnp.asarray(plan.lengths), pad_len,
        ))[:, :out_len]
    if backend == "preplaced":
        from ..ops import pallas_embed as pe

        b = np.shape(stego)[0]
        n = int(np.prod(np.shape(stego)[1:]))
        n_buf, tile, wpp = _preplaced_layout(n)
        if wpp == 1:
            st2, ln2 = plan.starts, plan.lengths
            stego3 = jnp.asarray(stego).reshape(b, n // 128, 128)
        else:
            st2, ln2 = pe.split_windows(plan.starts, plan.lengths, n)
            flat = jnp.asarray(stego).reshape(b, n)
            flat = jnp.pad(flat, ((0, 0), (0, n_buf - n)))
            stego3 = flat.reshape(b, n_buf // 128, 128)
        rows = pe.extract_raster_batch(
            stego3, jnp.asarray(st2), jnp.asarray(ln2),
            plan.nbits, tile, wpp,
        )
        rows = rows.reshape(b, plan.nbits, n_buf)[:, :, :n]
        return np.asarray(embed_ops.assemble_raster_device(
            rows,
            jnp.asarray(plan.starts), jnp.asarray(plan.offsets),
            jnp.asarray(plan.lengths), pad_len,
        ))[:, :out_len]
    if backend == "pallas":
        from ..ops import pallas_embed as pe

        # the padded-flat relayout genuinely needs host bytes; only this
        # branch pays the device->host copy
        stego_np = np.asarray(stego)
        b = stego_np.shape[0]
        n = int(np.prod(stego_np.shape[1:]))
        tile = pe.preferred_tile(n)
        aligned = pe.extract_aligned_batch_padded(
            jnp.asarray(pe.pad_stego_flat(stego_np)),
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            plan.nbits, n, tile,
        )
    else:
        aligned = extract_aligned_batch(stego, plan, mesh)
    return np.asarray(embed_ops.assemble_message_device(
        aligned, jnp.asarray(plan.offsets), jnp.asarray(plan.lengths), pad_len
    ))[:, :out_len]


# ---------------------------------------------------------------------------
# container-level batch pipeline (the production serving path)
#
# The reference has no batch mode at all (one image per process,
# src/codec.py:847); BatchRunner covers fault-tolerant per-item jobs. This
# is the throughput path: one fused device dispatch for the whole batch's
# embedding (and one for extraction), with the host shell — transport codec,
# XOR maps, STGC packing — spread over a thread pool. Containers are
# byte-identical to the single-image pipeline's (tested), so the two paths
# interoperate freely.
# ---------------------------------------------------------------------------


@jax.jit
def _pair_stats_batch_jit(images, stego):
    from ..ops import metrics as metric_ops

    return jax.vmap(metric_ops.pair_stats)(images, stego)


def _batch_quality_reports(images, stego) -> list:
    """Per-image quality reports from one fused vmapped stats pass (the jit
    lives at module level — a fresh ``jax.jit(...)`` object per call keys a
    new compile cache entry and recompiles every request)."""
    from ..ops import metrics as metric_ops

    stats = _pair_stats_batch_jit(jnp.asarray(images), jnp.asarray(stego))
    stats_np = {k: np.asarray(v) for k, v in stats.items()}
    return [
        metric_ops.quality_report({k: v[i] for k, v in stats_np.items()})
        for i in range(len(stats_np["sum_sqdiff"]))
    ]


def hybrid_base_offsets_host(
    images: np.ndarray, h: int, w: int, search_block: int
) -> list:
    """Pure-numpy twin of :func:`hybrid_base_offsets`: plane-0 tile
    popcounts (zero-padded reshape-sum, same zeros-contribute-nothing
    convention as ``ops.blocks.block_bit_counts_all``) + the exact
    integer-key ranking. Popcounts are integers, so the chosen offsets are
    identical to the device scan's — but nothing here can block on the
    image upload DMA, which the serving path's plan stage must never do
    (round-5: the device scan's ``np.asarray`` absorbed the whole 16 MB
    upload tail into ``batch_plan`` — 300+ ms of pure link time on a
    degraded relay, misattributed as host planning work)."""
    from ..ops import blocks as block_ops

    b = images.shape[0]
    bs = search_block
    nh, nw = -(-h // bs), -(-w // bs)
    bits = (images & 1).astype(np.uint8)
    if (nh * bs, nw * bs) != (h, w):
        bits = np.pad(bits, ((0, 0), (0, nh * bs - h), (0, nw * bs - w)))
    counts = bits.reshape(b, nh, bs, nw, bs).sum(axis=(2, 4), dtype=np.int64)
    return [
        block_ops.best_offset_from_counts(counts[i], h, w, bs)
        for i in range(b)
    ]


def hybrid_base_offsets(images, h: int, w: int, search_block: int) -> list:
    """Per-image variance-chosen hybrid start offsets from one vmapped
    tile-popcount pass — shared by the batch planner and the volume encoder
    (they must never drift: both write the offset into container metadata)."""
    from ..ops import blocks as block_ops

    # plane 0 only: _batch_block_counts_jit with nplanes=1 (module-level jit
    # — the eager per-call vmap this replaces re-traced and dispatched
    # op-by-op over the dev link)
    counts = np.asarray(
        _batch_block_counts_jit(jnp.asarray(images), 1, search_block)
    )[:, 0]
    return [
        block_ops.best_offset_from_counts(counts[i], h, w, search_block)
        for i in range(counts.shape[0])
    ]


@dataclass
class BatchEncodeResult:
    stego: np.ndarray                       # (B, H, W)
    containers: List[bytes]                 # one STGC-v2 per image
    plan: Optional[BatchPlan]               # None for the PEE delegation
    metrics: Optional[List[dict]] = None    # per-image quality reports


def encode_batch_containers(
    images: np.ndarray,
    payloads: Sequence[Union[bytes, str, np.ndarray]],
    config: EncodeConfig = EncodeConfig(),
    mesh: Optional[Mesh] = None,
    *,
    bits_stored: Optional[int] = None,
) -> BatchEncodeResult:
    """Encode a ``(B, H, W)`` batch into one STGC-v2 container per image.

    Raster strategies (``multi_plane`` / ``hybrid``) run as the fused batch
    kernels; ``pee`` delegates to :func:`parallel.batch_pee.encode_pee_batch`.
    """
    config = config.validate()
    if config.container_version != 2:
        raise ValueError("batch container encoding writes v2 containers only")
    if config.strategy == "pee":
        from .batch_pee import encode_pee_batch

        r = encode_pee_batch(
            images, payloads, config, mesh, bits_stored=bits_stored
        )
        metrics = None
        if config.compute_metrics:
            # same per-image quality reports as the raster branch below
            # (advisor finding, round 2: the PEE delegation silently dropped
            # compute_metrics)
            metrics = _batch_quality_reports(images, r.stego)
        return BatchEncodeResult(
            stego=r.stego, containers=r.containers, plan=None, metrics=metrics,
        )

    images = np.asarray(images)
    b, h, w = images.shape
    n = h * w
    dtype_bits = images.dtype.itemsize * 8
    nbits = config.nbits
    if nbits is None:
        nbits = bits_stored if (config.use_bits_stored and bits_stored) else dtype_bits
    nbits = min(nbits, dtype_bits)

    from ..profiling import stage

    # round-5 routing: the raster strategies' device work is O(payload)
    # bit placement, so on a single-device serving host the image upload +
    # packed-map download buys nothing — the measured e2e split put the
    # link alone (~400 ms per 32x512^2 uint16 batch over the dev tunnel)
    # above the CPU backend's whole pipeline. "auto" keeps the chip for
    # the strategies with real per-pixel compute (PEE, block_adaptive,
    # device metrics) and for multi-device meshes (see
    # config.EncodeConfig.device_policy / ops.host_embed).
    host_route = config.resolve_host_route(
        n, 1 if mesh is None else mesh.size
    )

    if not host_route:
        # one host->device image transfer feeds histograms, block scans and
        # the embed kernels (three separate uploads otherwise — the link is
        # the bottleneck of the serving path, not the kernels)
        with stage("batch_upload"):
            imgs_dev = jnp.asarray(images)
            if (os.cpu_count() or 1) <= 1:
                # 1-core host: the tunnel client's transfer work needs the
                # same core the plan's numpy does, so "overlapping" the DMA
                # with planning is false parallelism that smears link time
                # into whatever host stage runs next (the round-5 e2e
                # artifact measured batch_plan at 335 ms for work an idle
                # process does in ~70 — the delta was the in-flight
                # upload). Block here so the stage split stays honest;
                # multi-core hosts keep the async overlap, where it's real.
                jax.block_until_ready(imgs_dev)
    with stage("batch_plan"):
        # DEVICE-FREE planning (round 5). Host bincount histograms: the
        # images are host-resident anyway, and the device histogram path
        # shipped B x 65536 x 4 bytes back over the link (~8 MB for a
        # 32-image uint16 batch — 1.1 s of the round-3 bench's batch_plan
        # stage). The hybrid start-offset scan is the numpy twin
        # (hybrid_base_offsets_host) for the same reason: its device
        # np.asarray read used to absorb the whole upload DMA tail into
        # this stage. These stages run IDENTICAL single-core numpy on every
        # backend — the bench compares them 1:1 against the CPU-backend
        # leg.
        max_val = 255 if images.dtype.itemsize == 1 else 65535
        hists = np.stack([
            np.bincount(im.reshape(-1), minlength=max_val + 1)
            for im in images
        ])
        host_offsets = (
            hybrid_base_offsets_host(images, h, w, config.search_block_size)
            if config.strategy == "hybrid" else None
        )
        plan = plan_batch(
            images, payloads, config, histograms=hists, nbits=nbits,
            base_offsets=host_offsets,
        )

    if not config.allow_capacity_overflow:
        for i in range(b):
            have = int(plan.lengths[i, : plan.s[i]].sum())
            if have < int(plan.payload_bits[i]):
                raise CapacityError(
                    f"payload {i} of {int(plan.payload_bits[i])} bits exceeds "
                    f"the usable capacity of {have} bits at s={int(plan.s[i])}; "
                    f"shrink it, raise beta, or set allow_capacity_overflow=True"
                )

    max_s = int(plan.s.max(initial=0))

    if host_route:
        from ..ops.host_embed import embed_raster_host_packed

        with stage("batch_embed"):
            packed = np.zeros((b, max(max_s, 1), n // 8), dtype=np.uint8)
            stego = np.empty_like(images)
            for i in range(b):
                stego[i], packed[i] = embed_raster_host_packed(
                    images[i], plan.msgs[i], plan.starts[i],
                    plan.lengths[i], plan.offsets[i], int(plan.s[i]),
                    max(max_s, 1),
                )
        metrics = None
        if config.compute_metrics:
            metrics = _batch_quality_reports(images, stego)
        return _pack_batch_result(
            images, stego, packed, plan, config, nbits, bits_stored, h, w,
            metrics,
        )

    packed_dev = None
    with stage("batch_upload_wait"):
        # the upload DMA's tail, attributed honestly: planning above is
        # device-free, so whatever transfer time the host work didn't cover
        # surfaces HERE as link cost (split_tunnel_ms in the bench) instead
        # of inflating the first stage that happens to read a device result
        jax.block_until_ready(imgs_dev)
    with stage("batch_embed"):
        if config.strategy == "block_adaptive":
            # variance-ranked placement: per-image tile bases (one vmapped
            # popcount dispatch + exact host ranking), then one vmapped
            # embed dispatch — the packed/preplaced raster tiers don't
            # apply to rank-compare placement
            block_imgs = imgs_dev
            if mesh is not None and b % int(mesh.shape.get("dp", 1)) == 0:
                block_imgs = jax.device_put(
                    imgs_dev, NamedSharding(mesh, P("dp", None, None))
                )
            bases = _batch_block_bases(
                block_imgs, plan.nbits, plan.s, config.block_size, h, w
            )
            if h % config.block_size == 0 and w % config.block_size == 0:
                # host pre-slice of each plane's message window: the
                # in-kernel traced slice is a batched gather XLA
                # serializes (half the round-4 block cycle); the uniform
                # route never reads the raw msgs buffer, so ship a dummy
                from ..ops.embed import block_msg_rows

                mrows = jnp.asarray(np.stack([
                    block_msg_rows(
                        plan.msgs[i], plan.offsets[i], plan.nbits,
                        h, w, config.block_size,
                    )
                    for i in range(b)
                ]))
                msgs_arg = jnp.zeros((b, 8), jnp.uint8)
            else:
                mrows = None
                msgs_arg = jnp.asarray(plan.msgs)
            stego_dev = _block_embed_batch(
                block_imgs, msgs_arg, jnp.asarray(bases),
                jnp.asarray(plan.lengths), jnp.asarray(plan.offsets),
                jnp.asarray(plan.s), plan.nbits, config.block_size,
                mrows,
            )
        elif _packed_with_maps_eligible((b, h, w), plan.nbits, mesh, max_s):
            # packed tier + bit-packed XOR maps as one program (the
            # separate form paid three dispatches — see the single-image
            # twin encode_single_packed_with_maps)
            st_flat, packed_dev = _packed_embed_jit(
                imgs_dev, jnp.asarray(_msg_prefix(plan)),
                jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
                jnp.asarray(plan.offsets),
                n, plan.nbits, (n + 127) // 128 * 128, max_s,
            )
            stego_dev = st_flat.reshape(b, h, w)
        else:
            stego_dev = encode_batch(imgs_dev, plan, mesh)
        jax.block_until_ready(stego_dev)

    metrics = None
    if config.compute_metrics:
        metrics = _batch_quality_reports(imgs_dev, stego_dev)
    if n % 8 == 0:
        # download bit-packed XOR maps, not the stego batch: 8/itemsize x
        # fewer bytes per plane on the tunnel's slow device->host direction,
        # and the packed planes are exactly the v2.1 container bitmap blobs —
        # stego itself is rebuilt host-side as orig ^ diff. Only the first
        # max(s) planes ever change (every strategy embeds into planes
        # [0, s_i)), so the download/unpack covers max_s planes, not nbits.
        from ..ops.embed import xor_maps_packed_batch

        with stage("batch_download"):
            packed = np.asarray(
                packed_dev if packed_dev is not None
                else xor_maps_packed_batch(imgs_dev, stego_dev, max_s)
            )
        with stage("batch_unpack"):
            if config.strategy in ("multi_plane", "hybrid"):
                # O(payload) window reconstruction (round 5): the raster
                # diffs are all-zero outside each plane's window, so the
                # stego is one memcpy + a few LUT gathers per image —
                # ~3% of the full (s, N) expansion's work at serving
                # payloads (utils.bits.xor_packed_windows). Preallocated
                # output + per-image writes, like the block branch below:
                # np.stack over B live temporaries re-buys the whole-batch
                # allocation churn this function's history documents
                stego = np.empty_like(images)
                for i in range(b):
                    stego[i] = bit_utils.xor_packed_windows(
                        images[i], packed[i],
                        plan.starts[i], plan.lengths[i],
                    )
            else:
                # block_adaptive diffs scatter over variance-ranked tiles —
                # full cached-LUT expansion PER IMAGE into a preallocated
                # output (the whole-batch form allocated fresh B x N x
                # itemsize temporaries per plane and measured 641 ms vs
                # 69.5 ms for identical numpy work — allocation churn)
                stego = np.empty_like(images)
                for i in range(b):
                    diff_i = bit_utils.packed_planes_to_diff(
                        packed[i], images.dtype
                    )
                    np.bitwise_xor(
                        images[i], diff_i.reshape(h, w), out=stego[i]
                    )
    else:
        packed = None
        with stage("batch_download"):
            stego = np.asarray(stego_dev)

    return _pack_batch_result(
        images, stego, packed, plan, config, nbits, bits_stored, h, w,
        metrics,
    )


def _pack_batch_result(
    images: np.ndarray,
    stego: np.ndarray,
    packed: Optional[np.ndarray],
    plan: "BatchPlan",
    config: EncodeConfig,
    nbits: int,
    bits_stored: Optional[int],
    h: int,
    w: int,
    metrics: Optional[List[dict]],
) -> "BatchEncodeResult":
    """Shared container-pack tail of :func:`encode_batch_containers` — the
    host zlib/container shell is identical whether the XOR maps came off
    the device (packed download) or from the O(payload) host embed."""
    from concurrent.futures import ThreadPoolExecutor

    from ..profiling import stage
    from ..utils.pool import host_workers

    from ..io import container as container_io
    from ..io.codecs import get as get_codec
    from ..pipeline import _host_xor_maps

    b = images.shape[0]
    codec = get_codec(config.codec)

    def pack_one(i: int) -> bytes:
        s = int(plan.s[i])
        seg = segment_ops.distribute_segments(
            s, int(plan.payload_bits[i]), config.seed
        )
        # the device download is already bit-packed per plane — v2.1 blobs
        # zlib it as-is (8x less single-core deflate input than the raw
        # 0/1-byte form, round-3 batch_pack breakdown)
        packed_i = packed[i, :s] if packed is not None else None
        maps = (
            None if packed_i is not None
            else _host_xor_maps(images[i], stego[i], s)
        )
        meta = container_io.ContainerMeta(
            version=2, codec=config.codec, strategy=config.strategy,
            s=s, nbits=nbits, bits_stored=bits_stored or nbits,
            dtype=images.dtype, width=w, height=h,
            start_offset=int(plan.base_offsets[i]),
            seed=config.seed,
            payload_bits=int(plan.payload_bits[i]),
            align_across_planes=plan.align,
            has_bitmaps=config.store_bitmaps,
            bitmaps_packed=config.store_bitmaps and packed_i is not None,
            sizes=seg.sizes, indices=seg.indices,
            eff_lengths=tuple(int(v) for v in plan.lengths[i, :s]),
            plane_starts=tuple(int(v) for v in plan.starts[i, :s]),
            ext=(container_io.pack_block_ext(config.block_size)
                 if config.strategy == "block_adaptive" else b""),
        )
        if not config.store_bitmaps:
            bitmaps_blob = b""
        elif packed_i is not None:
            bitmaps_blob = container_io.compress_bitmaps_packed(packed_i)
        else:
            bitmaps_blob = container_io.compress_bitmaps(maps)
        return container_io.pack(meta, bitmaps_blob, codec.encode(stego[i]))

    with stage("batch_pack"):
        with ThreadPoolExecutor(max_workers=host_workers(b)) as pool:
            containers = list(pool.map(pack_one, range(b)))
    return BatchEncodeResult(
        stego=stego, containers=containers, plan=plan, metrics=metrics
    )


def decode_batch_containers(
    containers: Sequence[bytes],
    mesh: Optional[Mesh] = None,
    *,
    restore_original: bool = True,
) -> List:
    """Batched decode: containers group by ``(geometry, dtype, codec,
    version, strategy)`` and each v2 group runs fused — raster and PEE as
    one device extraction, block_adaptive as vmapped bases + extraction per
    block size (``_decode_block_group``); only v1 containers and
    bitmap-less block_adaptive fall back to the single-image path per item.
    Returns ``pipeline.DecodeResult`` objects in input order."""
    from ..io import container as container_io
    from ..pipeline import decode_container

    if not containers:
        raise ValueError("Invalid file: empty container batch")
    conts = [
        c if isinstance(c, container_io.Container) else container_io.parse(c)
        for c in containers
    ]
    groups: dict = {}
    for i, c in enumerate(conts):
        key = (c.meta.width, c.meta.height, str(np.dtype(c.meta.dtype)),
               c.meta.codec, c.meta.version, c.meta.strategy)
        groups.setdefault(key, []).append(i)
    results: List = [None] * len(conts)
    for idxs in groups.values():
        sub = [conts[i] for i in idxs]
        m0 = sub[0].meta
        # a group whose size does not divide the dp axis cannot shard
        # evenly; run it unsharded rather than crash in device_put (mixed
        # batches routinely produce ragged groups, e.g. one straggler)
        gmesh = mesh
        if mesh is not None and len(sub) % int(mesh.shape.get("dp", 1)):
            gmesh = None
        if m0.version == 2 and m0.strategy == "pee":
            from .batch_pee import decode_pee_batch

            outs = decode_pee_batch(sub, restore_original=restore_original)
        elif m0.version == 2 and m0.strategy in ("multi_plane", "hybrid"):
            outs = _decode_raster_group(sub, gmesh, restore_original)
        elif (m0.version == 2 and m0.strategy == "block_adaptive"
              and all(c.meta.has_bitmaps for c in sub)):
            # (missing bitmaps -> the per-item path below raises the
            # single-image decoder's descriptive error)
            outs = _decode_block_group(sub, restore_original)
        else:
            outs = [
                decode_container(c, restore_original=restore_original)
                for c in sub
            ]
        for i, r in zip(idxs, outs):
            results[i] = r
    return results


def _group_decode_stegos(conts: List) -> np.ndarray:
    """Threaded transport-codec decode + stack for a same-key container
    group, with the format-error contract and the ``batch_codec_decode``
    stage both group decoders' callers rely on (serving-path breakdowns in
    the bench artifact attribute host codec cost through this stage)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..io.codecs import get as get_codec
    from ..profiling import stage
    from ..utils.pool import host_workers

    meta0 = conts[0].meta
    codec = get_codec(meta0.codec)
    with stage("batch_codec_decode"):
        with ThreadPoolExecutor(max_workers=host_workers(len(conts))) as pool:
            stegos = list(pool.map(
                lambda c: codec.decode(c.stego_blob).astype(meta0.dtype),
                conts,
            ))
    shape = (meta0.height, meta0.width)
    for st in stegos:
        if st.shape != shape:
            raise ValueError(
                f"Invalid file: decoded stego shape {st.shape} != header "
                f"{shape}"
            )
    return np.stack(stegos)


def _decode_block_group(conts: List, restore_original: bool) -> List:
    """Batched decode for a same-key group of v2 block_adaptive containers:
    per-image original from the XOR maps (host LUT), then HOST extraction —
    tile popcounts + exact integer ranking + O(payload) fill-position
    gathers (``ops.host_extract``). The round-3 device formulation uploaded
    both the originals (for the vmapped popcount bases) and the stegos (for
    the vmapped extraction) — 2 x B x N x itemsize bytes over the link to
    read back B x payload bits. Bit-identical to
    ``pipeline.decode_container`` per item."""
    from ..io import container as container_io
    from ..ops import host_extract
    from ..ops import blocks as block_ops
    from ..pipeline import DecodeResult, _plane_plan_from_meta
    from ..profiling import stage

    meta0 = conts[0].meta
    stego = _group_decode_stegos(conts)
    diffs = np.stack([c.diff(stego.dtype) for c in conts])
    original = stego ^ diffs

    h, w = meta0.height, meta0.width
    results: List = [None] * len(conts)
    with stage("batch_extract"):
        for i, c in enumerate(conts):
            meta = c.meta
            s = int(meta.s)
            block = container_io.parse_block_ext(meta.ext)
            _, lengths, offsets = _plane_plan_from_meta(meta, h * w, max(s, 1))
            counts = host_extract.block_counts_host(original[i], s, block)
            rankings = [
                block_ops.ranking_from_counts(counts[p], h, w, block)
                for p in range(s)
            ]
            bits = host_extract.extract_block_host(
                stego[i], rankings, lengths, offsets, s, block,
                max(int(meta.payload_bits), 1),
            )[: int(meta.payload_bits)]
            results[i] = DecodeResult(
                payload_bits=bits,
                stego=stego[i],
                meta=meta,
                original=original[i] if restore_original else None,
            )
    return results


@partial(jax.jit, static_argnames=("nbits", "block", "out_len"))
def _block_extract_batch(stegos, bases, lengths, offsets, s, nbits, block, out_len):
    """Vmapped twin of ``ops.embed.extract_block_message_device``."""
    return jax.vmap(
        lambda st, ba, le, of, ss: embed_ops.extract_block_message_device(
            st, ba, le, of, ss, nbits, block, out_len
        )
    )(stegos, bases, lengths, offsets, s)


def _decode_raster_group(
    conts: List,
    mesh: Optional[Mesh],
    restore_original: bool,
) -> List:
    """Batched decode for a same-key group of v2 multi_plane/hybrid
    containers. Extraction is HOST numpy window slices
    (``ops.host_extract.extract_raster_host``, O(payload) per image): the
    stego batch is host-resident straight out of the transport codecs, and
    the round-3 device route shipped B x N x itemsize bytes over the link
    (346.66 ms measured at 32x512^2) to read back B x payload bits."""
    from ..ops import host_extract
    from ..pipeline import _plane_plan_from_meta
    from ..pipeline import DecodeResult

    b = len(conts)
    meta0 = conts[0].meta
    h, w = meta0.height, meta0.width
    n = h * w

    from ..profiling import stage

    stego = _group_decode_stegos(conts)

    out_len = max(max(int(c.meta.payload_bits) for c in conts), 1)
    bits = np.zeros((b, out_len), dtype=np.uint8)
    with stage("batch_extract"):
        for i, c in enumerate(conts):
            s = int(c.meta.s)
            starts, lengths, offsets = _plane_plan_from_meta(
                c.meta, n, max(s, 1)
            )
            bits[i] = host_extract.extract_raster_host(
                stego[i], starts, lengths, offsets, s, out_len
            )

    results = []
    for i, c in enumerate(conts):
        original = None
        if restore_original and c.meta.has_bitmaps:
            with stage("batch_restore"):
                # O(payload) window restore (exact full-diff fallback
                # inside — container.restore_original); the full (s, N)
                # expansion measured 43-69 ms per 32-image batch for
                # ~97%-zero bytes in the round-4 breakdowns
                original = c.restore_original(stego[i])
        results.append(DecodeResult(
            payload_bits=np.asarray(
                bits[i, : int(c.meta.payload_bits)], dtype=np.uint8
            ),
            stego=stego[i],
            meta=c.meta,
            original=original,
        ))
    return results
