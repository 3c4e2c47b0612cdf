"""Batched (data-parallel) PEE embedding with per-image thresholds.

Threshold selection is histogram-driven (round-2 verdict #3): one fused
device pass computes every image's capacity histogram for both passes
(:func:`codec_tcc_tpu.ops.pee.capacity_histogram` — exact for pass 0,
pristine-image estimate for pass 1), each image gets the smallest T whose
combined capacity holds ITS payload, and images sharing a T run both passes
as single fused kernels over the subgroup. One hard image no longer inflates
the whole batch's distortion (round 2 escalated one SHARED T until every
image fit), and the typical batch runs one embed per pass instead of the old
geometric probe schedule. A pass-1 shortfall (the pass-interaction error of
the estimate) escalates only the affected images.

Each image still gets its own self-contained STGC-v2 container (strategy 4,
per-image T in the PEE ext), so decoding uses the standard
:func:`codec_tcc_tpu.decode_container` per item; homogeneous groups decode
fused (:func:`decode_pee_batch` groups mixed-T batches by T).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncodeConfig
from ..errors import CapacityError
from ..io import container as container_io
from ..models.pee import _MAX_T, select_threshold
from ..ops import embed as embed_ops
from ..ops import pee as pee_ops
from ..utils import bits as bit_utils
from ..utils.logging import get_logger

logger = get_logger("parallel.batch_pee")

__all__ = [
    "BatchPeeResult", "encode_pee_batch", "decode_pee_batch",
    "probe_capacity_batch",
]


@dataclass
class BatchPeeResult:
    stego: np.ndarray               # (B, H, W)
    containers: List[bytes]         # one STGC-v2 per image
    thresholds: np.ndarray          # (B,) per-image T
    used_bits: np.ndarray           # (B,) embedded bits

    @property
    def threshold(self) -> int:
        """Largest per-image threshold (round-2 back-compat accessor)."""
        return int(self.thresholds.max())


def _as_bits(p) -> np.ndarray:
    if isinstance(p, str):
        return bit_utils.message_to_bits(p)
    if isinstance(p, (bytes, bytearray)):
        return bit_utils.bytes_to_bits(bytes(p))
    return np.asarray(p, dtype=np.uint8)


def probe_capacity_batch(
    images: np.ndarray, t: int, max_val: int
) -> np.ndarray:
    """Saturated two-pass PEE capacity per image at shared threshold ``t``
    (``(B,)`` int64 bits). Runs the want=INF cycle (pass-1 capacity measured
    on the actual pass-0 stego, so pass interaction is accounted for); the
    saturated case is exactly the capacity convention of ``ops/pee.py``
    (``used = cap`` when ``want > cap``)."""
    b, h, w = images.shape
    n = h * w
    big = jnp.full((b,), np.int32(1 << 30), jnp.int32)
    imgs_d = jnp.asarray(images)
    # the saturated pass-1 window base is u0 (up to the pass-0 capacity
    # ~n/4), so the message buffer must be sized as if the payload were that
    # large — the kernel DMA bound requires msg_base <= Lpad (pallas_pee
    # module docstring); zeros are fine, the probe discards the stego
    lpad = max(8, n // 2)

    from ..ops import pallas_pee as pp

    if jax.default_backend() == "tpu" and pp.routeable(h, w):
        tp = pp.preferred_tile_px(h, w)
        # the probe's message stream is all-zeros: build it ON DEVICE
        # (prep_messages_device) instead of uploading ~b*l2 host bytes
        msg2d_d, l2 = pp.prep_messages_device(
            jnp.zeros((b, lpad), jnp.uint8), n, tp
        )
        if pp.supports(h, w, tp):
            imgs3 = imgs_d.reshape(b, n // 128, 128)
            buf_w = None
        else:
            # pad the ALREADY-UPLOADED device batch (pad_batch(images)
            # would re-ship the full batch over the link)
            imgs3 = pp.pad_batch(imgs_d, h, w, tp)
            buf_w = pp.padded_geometry(h, w, tp)[1]
        zero = jnp.zeros(b, jnp.int32)
        s0, _, u0, _ = pp.embed_pass_batch(
            imgs3, msg2d_d, zero, big, h, w, 0, t, max_val, l2, buf_w=buf_w,
            tile_px=tp,
        )
        _, _, u1, _ = pp.embed_pass_batch(
            s0, msg2d_d, u0, big - u0, h, w, 1, t, max_val, l2, buf_w=buf_w,
            tile_px=tp,
        )
    else:
        zeros_msg = jnp.zeros(lpad, jnp.uint8)
        s0, _, u0, _ = jax.vmap(
            lambda im, w0: pee_ops.embed_pass(
                im, zeros_msg, jnp.int32(0), w0, 0, t, max_val
            )
        )(imgs_d, big)
        _, _, u1, _ = jax.vmap(
            lambda im, b0, w1: pee_ops.embed_pass(
                im, zeros_msg, b0, w1, 1, t, max_val
            )
        )(s0, u0, big - u0)
    return np.asarray(u0).astype(np.int64) + np.asarray(u1).astype(np.int64)


@functools.partial(jax.jit, static_argnames=("t", "max_val"))
def _xla_both_passes(imgs, msgs, want, t, max_val):
    """Both XLA PEE passes plus the overflow bit-pack, fused into one
    dispatch (the Pallas twin is ops.pallas_pee.embed_both_passes_batch)."""
    def one(im, ms, w0):
        s0, o0, u0, n0 = pee_ops.embed_pass(
            im, ms, jnp.int32(0), w0, 0, t, max_val
        )
        s1, o1, u1, n1 = pee_ops.embed_pass(s0, ms, u0, w0 - u0, 1, t, max_val)
        return s1, o0 | o1, u0, n0, u1, n1

    s1, over, u0, n0, u1, n1 = jax.vmap(one)(imgs, msgs, want)
    return s1, embed_ops.pack_bits_batch(over), u0, n0, u1, n1


def _run_passes(
    images,                  # (G, H, W) device (or numpy) subgroup at threshold t
    msgs: np.ndarray,        # (G, Lpad) padded message bits
    want: np.ndarray,        # (G,) int64 payload bits
    t: int,
    max_val: int,
    use_pallas: bool,
    mesh: Optional[Mesh],
):
    """Both PEE passes over one same-threshold subgroup. Returns numpy
    ``(stego, packed overflow (G, ceil(HW/8)) u8, used0, nproc0, used1,
    nproc1)``. The overflow comes back bit-PACKED straight off the device
    (:func:`~codec_tcc_tpu.ops.embed.pack_bits_batch`): 8x less
    device->host traffic and the bytes are exactly the container blob's
    zlib input — no host ``np.packbits`` (~30 MB/s single-core) anywhere.

    The Pallas and XLA backends follow the identical protocol — UNCLAMPED
    wants into the pass kernels (which clamp to capacity themselves,
    saturation convention of ops/pee.py) — so accepted results are
    byte-identical between backends (asserted in tests/test_pallas_pee.py).

    The group is padded to the next power-of-two size with want=0 copies of
    the first image (sliced off the outputs): kernel jits specialize on the
    static (group size, T) pair, so heterogeneous batches would otherwise
    compile a fresh kernel per distinct subgroup size — on the dev tunnel a
    remote compile costs far more than embedding a few inert pad images.
    """
    g = int(np.shape(images)[0])
    h, w = int(np.shape(images)[1]), int(np.shape(images)[2])
    g_pad = 1 << max(0, (g - 1).bit_length())
    imgs_d = jnp.asarray(images)
    if g_pad != g:
        reps = g_pad - g
        imgs_d = jnp.concatenate(
            [imgs_d, jnp.repeat(imgs_d[:1], reps, axis=0)], axis=0
        )
        msgs = np.concatenate(
            [msgs, np.zeros((reps, msgs.shape[1]), np.uint8)], axis=0
        )
        want = np.concatenate([want, np.zeros(reps, want.dtype)])
    want_d = jnp.asarray(want.astype(np.int32))

    if use_pallas:
        from ..ops import pallas_pee as pp

        n = h * w
        tp = pp.preferred_tile_px(h, w)
        msg2d, l2 = pp.prep_messages(msgs, n, tp)
        msg2d_d = jax.device_put(jnp.asarray(msg2d))
        if pp.supports(h, w, tp):
            imgs3 = imgs_d.reshape(g_pad, n // 128, 128)
            buf_w = None
            back = lambda a3: np.asarray(a3)[:g].reshape(g, h, w)
        else:
            # pad-and-mask route (round-2 verdict #4): the kernels run on a
            # zero-padded buffer while masks/ranks use the logical dims —
            # bit-exact with the oracle, no XLA-path cliff for odd shapes
            imgs3 = pp.pad_batch(imgs_d, h, w, tp)
            buf_w = pp.padded_geometry(h, w, tp)[1]
            back = lambda a3: np.asarray(pp.unpad_batch(a3, h, w, tp))[:g]

        # ONE dispatch for both passes AND the overflow bit-pack (pass 1's
        # base/want chain on device; payloads that fit in pass 0 make pass
        # 1 an inactive-tile copy) — the sequential form paid two
        # dispatches plus a used0 download between them, ~15 ms of pure
        # tunnel latency per threshold attempt
        s1, over_packed, u0, n0, u1, n1 = pp.embed_both_passes_batch(
            imgs3, msg2d_d, want_d, h, w, t, max_val, l2,
            buf_w=buf_w, tile_px=tp, pack_overflow=True,
        )
        return (
            back(s1), np.asarray(over_packed)[:g],
            np.asarray(u0).astype(np.int64)[:g],
            np.asarray(n0).astype(np.int64)[:g],
            np.asarray(u1).astype(np.int64)[:g],
            np.asarray(n1).astype(np.int64)[:g],
        )

    msgs_d = jnp.asarray(msgs)
    if mesh is not None and g_pad % mesh.devices.size == 0:
        imgs_d = jax.device_put(imgs_d, NamedSharding(mesh, P("dp", None, None)))
        msgs_d = jax.device_put(msgs_d, NamedSharding(mesh, P("dp", None)))
    # both passes in one dispatch (see embed_both_passes_batch: pass 1 at
    # want - used0 = 0 is a provable no-op, matching the early exit it
    # replaces); pass 1's base/want never visit the host
    s1, over, u0, n0, u1, n1 = _xla_both_passes(
        imgs_d, msgs_d, want_d, t, max_val
    )
    return (
        np.asarray(s1)[:g],
        np.asarray(over)[:g],
        np.asarray(u0).astype(np.int64)[:g],
        np.asarray(n0).astype(np.int64)[:g],
        np.asarray(u1).astype(np.int64)[:g],
        np.asarray(n1).astype(np.int64)[:g],
    )


def encode_pee_batch(
    images: np.ndarray,
    payloads: Sequence[Union[bytes, str, np.ndarray]],
    config: EncodeConfig = EncodeConfig(),
    mesh: Optional[Mesh] = None,
    *,
    bits_stored: Optional[int] = None,
    backend: str = "auto",
) -> BatchPeeResult:
    b, h, w = images.shape
    dtype_bits = np.dtype(images.dtype).itemsize * 8
    eff_bits = bits_stored if (config.use_bits_stored and bits_stored) else dtype_bits
    max_val = (1 << eff_bits) - 1
    if int(images.max()) > max_val:
        max_val = (1 << dtype_bits) - 1

    bit_arrays = [_as_bits(p) for p in payloads]
    want = np.array([x.size for x in bit_arrays], dtype=np.int64)
    lpad = 1 << max(3, (int(want.max(initial=1)) - 1).bit_length())
    msgs = np.zeros((b, lpad), dtype=np.uint8)
    for i, bits in enumerate(bit_arrays):
        msgs[i, : bits.size] = bits

    from ..ops import pallas_pee as pp

    if backend == "auto":
        # Pallas fast path (single-chip): the fused kernels run the pass
        # cycle at ~30x the XLA formulation's throughput (the XLA message
        # gather is the bottleneck — see ops/pallas_pee.py). Bit-exact with
        # the XLA path; unsupported geometries route via pad-and-mask.
        use_pallas = (
            mesh is None and jax.default_backend() == "tpu"
            and pp.routeable(h, w)
        )
    else:
        use_pallas = backend == "pallas"

    # per-image T from ONE fused histogram pass (round-2 verdict #3)
    imgs_dev = jnp.asarray(images)
    if mesh is not None:
        imgs_dev = jax.device_put(
            imgs_dev, NamedSharding(mesh, P("dp", None, None))
        )
    hist0 = jax.vmap(
        lambda im: pee_ops.capacity_histogram(im, 0, _MAX_T, max_val)
    )(imgs_dev)
    hist1 = jax.vmap(
        lambda im: pee_ops.capacity_histogram(im, 1, _MAX_T, max_val)
    )(imgs_dev)
    cap0 = pee_ops.capacities_by_threshold(np.asarray(hist0))
    cap1 = pee_ops.capacities_by_threshold(np.asarray(hist1))
    t_img = np.zeros(b, dtype=np.int32)
    for i in range(b):
        t = select_threshold(cap0[i], cap1[i], int(want[i]), config.pee_threshold)
        # an estimate shortfall even at T=128 still gets one exact attempt —
        # the embed itself is the authority, the histogram only schedules
        t_img[i] = _MAX_T if t is None else t

    stego = np.empty_like(images)
    overflow = np.zeros((b, (h * w + 7) // 8), dtype=np.uint8)  # bit-packed
    used0 = np.zeros(b, np.int64)
    used1 = np.zeros(b, np.int64)
    nproc0 = np.zeros(b, np.int64)
    nproc1 = np.zeros(b, np.int64)
    pending = list(range(b))
    while pending:
        next_pending: List[int] = []
        for t in sorted({int(t_img[i]) for i in pending}):
            idxs = [i for i in pending if int(t_img[i]) == t]
            # reuse the device-resident batch from the histogram pass: a
            # full-batch group passes it straight through; subgroups slice
            # ON DEVICE (a host re-upload of the subset costs ~10 MB/s on
            # the dev link; an HBM gather is free by comparison)
            if len(idxs) == b:
                sub_imgs = imgs_dev
            else:
                sub_imgs = jnp.take(imgs_dev, jnp.asarray(idxs), axis=0)
            g_stego, g_over, g_u0, g_n0, g_u1, g_n1 = _run_passes(
                sub_imgs, msgs[idxs], want[idxs], t, max_val,
                use_pallas, mesh,
            )
            for k, i in enumerate(idxs):
                if g_u0[k] + g_u1[k] >= want[i]:
                    stego[i] = g_stego[k]
                    overflow[i] = g_over[k]
                    used0[i], used1[i] = g_u0[k], g_u1[k]
                    nproc0[i], nproc1[i] = g_n0[k], g_n1[k]
                else:
                    if t >= _MAX_T:
                        raise CapacityError(
                            f"payload {i} of {int(want[i])} bits exceeds the "
                            f"PEE capacity even at T={_MAX_T}"
                        )
                    t_img[i] = t + 1
                    next_pending.append(i)
        pending = next_pending

    from ..io.codecs import get as get_codec
    import zlib
    from concurrent.futures import ThreadPoolExecutor

    from ..utils.pool import host_workers

    codec = get_codec(config.codec)

    def pack_one(i: int) -> bytes:
        passes = 2 if used1[i] > 0 else 1
        ext = container_io.pack_pee_ext(
            int(t_img[i]), passes, int(nproc0[i]), int(nproc1[i]),
            int(used0[i]), int(used1[i]),
        )
        meta = container_io.ContainerMeta(
            version=2, codec=config.codec, strategy="pee", s=0,
            nbits=eff_bits, bits_stored=eff_bits, dtype=images.dtype,
            width=w, height=h, start_offset=0, seed=config.seed,
            payload_bits=int(want[i]), align_across_planes=False,
            has_bitmaps=True, sizes=(), indices=(), eff_lengths=(),
            plane_starts=(), ext=ext,
        )
        map_blob = zlib.compress(overflow[i].tobytes())
        return container_io.pack(meta, map_blob, codec.encode(stego[i]))

    with ThreadPoolExecutor(max_workers=host_workers(b)) as pool:
        containers = list(pool.map(pack_one, range(b)))

    logger.info(
        "pee batch: B=%d T=%s total_bits=%d backend=%s",
        b, sorted(set(t_img.tolist())), int(want.sum()),
        "pallas" if use_pallas else "xla",
    )
    return BatchPeeResult(
        stego=stego, containers=containers, thresholds=t_img,
        used_bits=used0 + used1,
    )


def decode_pee_batch(containers: Sequence[bytes], *, restore_original: bool = True):
    """Batched decode of PEE containers — the symmetric counterpart of
    :func:`encode_pee_batch`.

    Containers are grouped by (geometry, threshold, dtype, codec); each
    group that the Pallas kernels support decodes as fused kernels over the
    whole group on TPU (mixed-T batches from the per-image threshold
    selection fuse per T), anything else decodes through the standard
    single-image path. Returns ``pipeline.DecodeResult`` in input order."""
    import jax

    from ..pipeline import decode_container
    from ..ops import pallas_pee as pp

    from ..models.pee import parse_pee_container_parts

    conts = [
        c if isinstance(c, container_io.Container) else container_io.parse(c)
        for c in containers
    ]
    parsed_ext = []
    overflow_maps = []
    groups: dict = {}
    for j, c in enumerate(conts):
        if c.meta.strategy != "pee":
            raise ValueError(f"not a PEE container (strategy={c.meta.strategy})")
        # shared hardened parsing: 'Invalid file: ...' ValueErrors on
        # truncated ext blocks / corrupt or short overflow maps
        ext, over = parse_pee_container_parts(c)
        parsed_ext.append(ext)
        overflow_maps.append(over)
        key = (c.meta.width, c.meta.height, c.meta.bits_stored,
               str(np.dtype(c.meta.dtype)), c.meta.codec, ext[0])
        groups.setdefault(key, []).append(j)

    results: List = [None] * len(conts)
    for key, idxs in groups.items():
        w, h = key[0], key[1]
        if jax.default_backend() == "tpu" and pp.routeable(h, w):
            group_res = _decode_group_fused(
                [conts[j] for j in idxs],
                [parsed_ext[j] for j in idxs],
                [overflow_maps[j] for j in idxs],
                restore_original,
            )
            for j, r in zip(idxs, group_res):
                results[j] = r
        else:
            for j in idxs:
                results[j] = decode_container(
                    conts[j], restore_original=restore_original
                )
    return results


def _decode_group_fused(conts, parsed_ext, overflow_maps, restore_original):
    """Fused Pallas decode of one homogeneous (shared-key) container group."""
    from ..pipeline import DecodeResult
    from ..io.codecs import get as get_codec
    from ..ops import pallas_pee as pp

    b = len(conts)
    w, h = conts[0].meta.width, conts[0].meta.height
    n = h * w
    t = parsed_ext[0][0]
    bits_stored = conts[0].meta.bits_stored
    dtype = conts[0].meta.dtype
    max_val = (1 << bits_stored) - 1

    from concurrent.futures import ThreadPoolExecutor

    from ..utils.pool import host_workers

    codec = get_codec(conts[0].meta.codec)

    with ThreadPoolExecutor(max_workers=host_workers(b)) as pool:
        stegos = list(pool.map(
            lambda c: codec.decode(c.stego_blob).astype(dtype), conts
        ))
    stego = np.stack(stegos)
    if int(stego.max()) > max_val:
        max_val = (1 << (np.dtype(dtype).itemsize * 8)) - 1
    over = np.stack(overflow_maps).astype(np.uint8)
    nproc0 = jnp.asarray([e[2] for e in parsed_ext], dtype=jnp.int32)
    # same guard as the single-image decoder (models/pee.py): a 1-pass
    # container must not have a pass-1 inversion applied even if its ext
    # carries a (foreign/corrupt) nonzero nproc1
    nproc1 = jnp.asarray(
        [e[3] if e[1] == 2 else 0 for e in parsed_ext], dtype=jnp.int32
    )

    tp = pp.preferred_tile_px(h, w)
    if pp.supports(h, w, tp):
        stego3 = jnp.asarray(stego).reshape(b, n // 128, 128)
        over3 = jnp.asarray(over).reshape(b, n // 128, 128)
        buf_w = None
        back = lambda a3: np.asarray(a3).reshape(b, h, w)
    else:
        # pad-and-mask route for odd geometries (round-2 verdict #4)
        stego3 = pp.pad_batch(stego, h, w, tp)
        over3 = pp.pad_batch(over, h, w, tp)
        buf_w = pp.padded_geometry(h, w, tp)[1]
        back = lambda a3: np.asarray(pp.unpad_batch(a3, h, w, tp))
    # both inversions in one dispatch (boundaries come from the container
    # ext, so nothing needs the host between passes)
    r0, segs1, cnts1, segs0, cnts0 = pp.extract_both_passes_batch(
        stego3, over3, nproc0, nproc1, h, w, t, max_val,
        buf_w=buf_w, tile_px=tp,
    )
    restored = back(r0)
    out_len0 = max(int(max(e[4] for e in parsed_ext)), 1)
    out_len1 = max(int(max(e[5] for e in parsed_ext)), 1)
    bits0 = pp.collect_bits(segs0, cnts0, out_len0)
    bits1 = pp.collect_bits(segs1, cnts1, out_len1)

    results = []
    for i, c in enumerate(conts):
        _, _, _, _, b0, b1 = parsed_ext[i]
        payload = np.concatenate(
            [bits0[i, :b0], bits1[i, :b1]]
        )[: c.meta.payload_bits].astype(np.uint8)
        results.append(DecodeResult(
            payload_bits=payload,
            stego=stego[i],
            meta=c.meta,
            original=restored[i] if restore_original else None,
        ))
    logger.info("pee batch decode (pallas): B=%d T=%d", b, t)
    return results
