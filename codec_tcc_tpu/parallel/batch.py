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

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncodeConfig
from ..ops import decompose as decompose_ops
from ..ops import embed as embed_ops
from ..ops import histogram as hist_ops
from ..ops import segments as segment_ops
from ..utils import bits as bit_utils

__all__ = ["BatchPlan", "plan_batch", "encode_batch", "extract_batch", "batched_histograms"]


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


def plan_batch(
    images: np.ndarray,
    payloads: Sequence[Union[bytes, str, np.ndarray]],
    config: EncodeConfig = EncodeConfig(),
    *,
    histograms: Optional[np.ndarray] = None,
) -> BatchPlan:
    """Host-side planning for a batch: per-image decomposition (from one
    vmapped histogram pass) + segment plans, padded to a common ``Lpad``.

    ``config.strategy`` selects the raster strategies: ``multi_plane`` (every
    plane starts at raster 0) or ``hybrid`` (per-image variance-chosen start
    offset from one vmapped tile-popcount pass, SURVEY hybrid semantics with
    defect B4 fixed). Block-adaptive and PEE go through the single-image
    pipeline, whose plans are not plain raster windows."""
    b, h, w = images.shape
    n = h * w
    itemsize = np.dtype(images.dtype).itemsize
    dtype_bits = itemsize * 8
    max_val = 255 if itemsize == 1 else 65535

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
    for i in range(b):
        dec = decompose_ops.decompose(
            images[i], beta=config.beta, nbits=dtype_bits,
            histogram_counts=histograms[i],
        )
        s_arr[i] = dec.s
        plans.append(
            segment_ops.distribute_segments(dec.s, int(payload_bits[i]), config.seed)
        )

    # bucket the static kernel unroll to the batch's largest cut point
    from ..pipeline import _plane_bucket

    nbits = _plane_bucket(int(s_arr.max(initial=1)), dtype_bits)

    if config.strategy == "hybrid":
        from ..ops import blocks as block_ops

        sb = config.search_block_size
        counts = np.asarray(
            jax.vmap(lambda im: block_ops.block_bit_counts(im, 0, sb))(
                jnp.asarray(images)
            )
        )
        base_offsets = [
            block_ops.best_offset_from_counts(counts[i], h, w, sb)
            for i in range(b)
        ]
        align = config.align_across_planes
    elif config.strategy == "multi_plane":
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
    )


def _pallas_ok(shape: tuple, mesh: Optional[Mesh]) -> bool:
    """Pallas fast path: single-chip TPU with a tileable image size.

    Takes the batch *shape* (not the array) so callers don't have to
    materialize device data on host just to pick a backend."""
    import jax as _jax

    from ..ops import pallas_embed as pe

    if mesh is not None or _jax.default_backend() != "tpu":
        return False
    n = int(np.prod(shape[1:]))
    return pe.pick_tile(n) > 0 and n % 128 == 0


_PREPLACED_HBM_CAP = 2 << 30    # bits-buffer budget for the preplaced layout


def _pick_pallas_backend(shape: tuple, nbits: int, mesh: Optional[Mesh]) -> str:
    """'preplaced' (fastest: host-positioned plane bits, ~1.75x the windowed
    kernels) unless its NP x N x B bit buffer would blow the HBM budget, in
    which case the windowed 'pallas' kernels (O(message) memory) serve; 'xla'
    off-TPU or under a mesh."""
    if not _pallas_ok(shape, mesh):
        return "xla"
    bits_bytes = int(np.prod(shape[1:])) * int(shape[0]) * nbits
    return "preplaced" if bits_bytes <= _PREPLACED_HBM_CAP else "pallas"


def encode_batch(
    images: np.ndarray,
    plan: BatchPlan,
    mesh: Optional[Mesh] = None,
    backend: str = "auto",
) -> jax.Array:
    """Fused batched embed; with a mesh, inputs are sharded on ``dp``.

    ``backend='auto'`` uses the Pallas kernels on single-chip TPU (2.4 GPix/s
    cycle on v5e vs ~0.5 for the XLA path) and XLA elsewhere.
    """
    if backend == "auto":
        backend = _pick_pallas_backend(images.shape, plan.nbits, mesh)
    if backend == "preplaced":
        from ..ops import pallas_embed as pe

        b, h, w = images.shape
        n = h * w
        tile = pe.preferred_tile(n)
        bits4 = pe.preplace_bits(
            plan.msgs, plan.starts, plan.lengths, plan.offsets, n
        )
        stego = pe.embed_batch_preplaced(
            jnp.asarray(images).reshape(b, n // 128, 128),
            jnp.asarray(bits4),
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            plan.nbits, tile,
        )
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
    """(B, out_len) message bits: device-aligned rows + host assembly."""
    out_len = out_len or plan.lpad
    if backend == "auto":
        backend = _pick_pallas_backend(np.shape(stego), plan.nbits, mesh)
    if backend == "preplaced":
        from ..ops import pallas_embed as pe

        b = np.shape(stego)[0]
        n = int(np.prod(np.shape(stego)[1:]))
        tile = pe.preferred_tile(n)
        rows = pe.extract_raster_batch(
            jnp.asarray(stego).reshape(b, n // 128, 128),
            jnp.asarray(plan.starts), jnp.asarray(plan.lengths),
            plan.nbits, tile,
        )
        return pe.assemble_raster(
            rows, plan.starts, plan.lengths, plan.offsets, out_len
        )
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
    return embed_ops.assemble_message(aligned, plan.offsets, plan.lengths, out_len)
