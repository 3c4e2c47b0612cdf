"""Batched (data-parallel) PEE embedding.

The single-image PEE path (:mod:`codec_tcc_tpu.models.pee`) escalates its
threshold per image; here a batch shares one threshold T (escalated until
every image's payload fits, pass-1 capacity measured on the pass-0 results)
so both passes run as single vmapped kernels over the whole batch — the PEE
analog of the LSB batch pipeline, shardable over the mesh ``dp`` axis.

Each image still gets its own self-contained STGC-v2 container (strategy 4),
so decoding uses the standard :func:`codec_tcc_tpu.decode_container` per item.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EncodeConfig
from ..io import container as container_io
from ..models.pee import _threshold_schedule
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
    threshold: int                  # shared T
    used_bits: np.ndarray           # (B,) embedded bits


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
    (``(B,)`` int64 bits). Runs the want=INF cycle the volume encoder uses to
    split a payload across slices before committing to a threshold; the
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

    if jax.default_backend() == "tpu" and pp.supports(h, w):
        msg2d, l2 = pp.prep_messages(np.zeros((b, lpad), np.uint8), n)
        msg2d_d = jnp.asarray(msg2d)
        imgs3 = imgs_d.reshape(b, n // 128, 128)
        zero = jnp.zeros(b, jnp.int32)
        s0, _, u0, _ = pp.embed_pass_batch(
            imgs3, msg2d_d, zero, big, h, w, 0, t, max_val, l2
        )
        _, _, u1, _ = pp.embed_pass_batch(
            s0, msg2d_d, u0, big - u0, h, w, 1, t, max_val, l2
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


def encode_pee_batch(
    images: np.ndarray,
    payloads: Sequence[Union[bytes, str, np.ndarray]],
    config: EncodeConfig = EncodeConfig(),
    mesh: Optional[Mesh] = None,
    *,
    bits_stored: Optional[int] = None,
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

    imgs_d = jnp.asarray(images)
    msgs_d = jnp.asarray(msgs)
    if mesh is not None:
        imgs_d = jax.device_put(imgs_d, NamedSharding(mesh, P("dp", None, None)))
        msgs_d = jax.device_put(msgs_d, NamedSharding(mesh, P("dp", None)))

    want_d = jnp.asarray(want.astype(np.int32))
    zeros = jnp.zeros(b, jnp.int32)

    # Pallas fast path (single-chip): the fused kernels run the pass cycle at
    # ~30x the XLA formulation's throughput (the XLA message gather is the
    # bottleneck — see ops/pallas_pee.py). Bit-exact with the XLA path.
    from ..ops import pallas_pee as pp

    if mesh is None and jax.default_backend() == "tpu" and pp.supports(h, w):
        return _encode_pee_batch_pallas(
            images, imgs_d, msgs, want, config, eff_bits, max_val, bit_arrays
        )

    # Identical probe protocol to the Pallas loop below: UNCLAMPED wants into
    # embed_pass (which clamps to capacity itself — saturation convention,
    # ops/pee.py) and used-based acceptance, so the two backends produce
    # byte-identical containers and no separate capacity passes run.
    chosen = None
    for t in _threshold_schedule(config.pee_threshold):
        stego0, over0, used0, nproc0 = jax.vmap(
            lambda im, ms, w0: pee_ops.embed_pass(
                im, ms, jnp.int32(0), w0, 0, t, max_val
            )
        )(imgs_d, msgs_d, want_d)
        used0 = np.asarray(used0).astype(np.int64)
        want1 = want - used0
        if (want1 <= 0).all():
            stego = stego0
            over1 = jnp.zeros_like(over0)
            used1 = np.zeros(b, dtype=np.int64)
            nproc1 = zeros
            chosen = (t, stego, over0, over1, used0, np.asarray(nproc0),
                      used1, np.asarray(nproc1))
            break
        stego, over1, used1, nproc1 = jax.vmap(
            lambda im, ms, b0, w1: pee_ops.embed_pass(
                im, ms, b0, w1, 1, t, max_val
            )
        )(stego0, msgs_d, jnp.asarray(used0.astype(np.int32)),
          jnp.asarray(want1.astype(np.int32)))
        used1 = np.asarray(used1).astype(np.int64)
        if (used1 >= want1).all():
            chosen = (t, stego, over0, over1, used0, np.asarray(nproc0),
                      used1, np.asarray(nproc1))
            break
    if chosen is None:
        raise ValueError(
            f"some payloads exceed the batch PEE capacity even at T=128"
        )

    t, stego_d, over0_d, over1_d, used0, nproc0, used1, nproc1 = chosen
    stego = np.asarray(stego_d)
    overflow = np.asarray(over0_d) | np.asarray(over1_d)

    from ..io.codecs import get as get_codec
    import zlib
    from concurrent.futures import ThreadPoolExecutor

    codec = get_codec(config.codec)

    def pack_one(i: int) -> bytes:
        passes = 2 if used1[i] > 0 else 1
        ext = container_io.pack_pee_ext(
            t, passes, int(nproc0[i]), int(nproc1[i]),
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
        map_blob = zlib.compress(np.packbits(overflow[i]).tobytes())
        return container_io.pack(meta, map_blob, codec.encode(stego[i]))

    with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
        containers = list(pool.map(pack_one, range(b)))

    logger.info("pee batch: B=%d T=%d total_bits=%d", b, t, int(want.sum()))
    return BatchPeeResult(
        stego=stego, containers=containers, threshold=t, used_bits=used0 + used1
    )


def _encode_pee_batch_pallas(
    images, imgs_d, msgs, want, config, eff_bits, max_val, bit_arrays
):
    """Pallas-kernel variant of the threshold-escalation probe loop.

    Acceptance criterion is identical to the XLA loop (a pass-1 attempt whose
    embedded count falls short of the remainder escalates T), so accepted
    results are bit-identical."""
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_pee as pp

    b, h, w = images.shape
    n = h * w
    msg2d, l2 = pp.prep_messages(msgs, n)
    msg2d_d = jax.device_put(jnp.asarray(msg2d))
    imgs3 = jnp.asarray(imgs_d).reshape(b, n // 128, 128)
    want_d = jnp.asarray(want.astype(np.int32))
    zero = jnp.zeros(b, jnp.int32)

    chosen = None
    for t in _threshold_schedule(config.pee_threshold):
        s0, o0, u0, n0 = pp.embed_pass_batch(
            imgs3, msg2d_d, zero, want_d, h, w, 0, t, max_val, l2
        )
        used0 = np.asarray(u0).astype(np.int64)
        want1 = want - used0
        if (want1 <= 0).all():
            chosen = (t, s0, o0, jnp.zeros_like(o0), used0,
                      np.asarray(jnp.maximum(n0, 0)),
                      np.zeros(b, np.int64), np.zeros(b, np.int32))
            break
        s1, o1, u1, n1 = pp.embed_pass_batch(
            s0, msg2d_d, u0, want_d - u0, h, w, 1, t, max_val, l2
        )
        used1 = np.asarray(u1).astype(np.int64)
        if (used1 >= want1).all():
            chosen = (t, s1, o0, o1, used0, np.asarray(n0),
                      used1, np.asarray(n1))
            break
    if chosen is None:
        raise ValueError("some payloads exceed the batch PEE capacity even at T=128")

    t, stego_d, over0_d, over1_d, used0, nproc0, used1, nproc1 = chosen
    stego = np.asarray(stego_d).reshape(b, h, w)
    overflow = (np.asarray(over0_d) | np.asarray(over1_d)).reshape(b, h, w)

    from ..io.codecs import get as get_codec
    import zlib
    from concurrent.futures import ThreadPoolExecutor

    codec = get_codec(config.codec)

    def pack_one(i: int) -> bytes:
        passes = 2 if used1[i] > 0 else 1
        ext = container_io.pack_pee_ext(
            t, passes, int(nproc0[i]), int(nproc1[i]),
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
        map_blob = zlib.compress(np.packbits(overflow[i]).tobytes())
        return container_io.pack(meta, map_blob, codec.encode(stego[i]))

    with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
        containers = list(pool.map(pack_one, range(b)))

    logger.info("pee batch (pallas): B=%d T=%d total_bits=%d", b, t, int(want.sum()))
    return BatchPeeResult(
        stego=stego, containers=containers, threshold=t, used_bits=used0 + used1
    )


def decode_pee_batch(containers: Sequence[bytes], *, restore_original: bool = True):
    """Batched decode of PEE containers — the symmetric counterpart of
    :func:`encode_pee_batch`.

    When every container shares geometry/threshold/dtype (what the batch
    encoder produces) and the backend is TPU, both inverse passes run as the
    fused Pallas kernels over the whole batch; otherwise each item decodes
    through the standard single-image path. Returns a list of
    ``pipeline.DecodeResult``."""
    import jax

    from ..pipeline import DecodeResult, decode_container
    from ..io.codecs import get as get_codec
    from ..ops import pallas_pee as pp

    from ..models.pee import parse_pee_container_parts

    conts = [
        c if isinstance(c, container_io.Container) else container_io.parse(c)
        for c in containers
    ]
    keys = set()
    parsed_ext = []
    overflow_maps = []
    for c in conts:
        if c.meta.strategy != "pee":
            raise ValueError(f"not a PEE container (strategy={c.meta.strategy})")
        # shared hardened parsing: 'Invalid file: ...' ValueErrors on
        # truncated ext blocks / corrupt or short overflow maps
        ext, over = parse_pee_container_parts(c)
        parsed_ext.append(ext)
        overflow_maps.append(over)
        keys.add((c.meta.width, c.meta.height, c.meta.bits_stored,
                  str(np.dtype(c.meta.dtype)), c.meta.codec, ext[0]))
    w, h = conts[0].meta.width, conts[0].meta.height
    if (
        len(keys) != 1
        or jax.default_backend() != "tpu"
        or not pp.supports(h, w)
    ):
        return [decode_container(c, restore_original=restore_original)
                for c in conts]

    b = len(conts)
    n = h * w
    t = parsed_ext[0][0]
    bits_stored = conts[0].meta.bits_stored
    dtype = conts[0].meta.dtype
    max_val = (1 << bits_stored) - 1

    from concurrent.futures import ThreadPoolExecutor

    codec = get_codec(conts[0].meta.codec)

    with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
        stegos = list(pool.map(
            lambda c: codec.decode(c.stego_blob).astype(dtype), conts
        ))
    stego = np.stack(stegos)
    if int(stego.max()) > max_val:
        max_val = (1 << (np.dtype(dtype).itemsize * 8)) - 1
    over = np.stack(overflow_maps).astype(np.uint8)
    nproc0 = jnp.asarray([e[2] for e in parsed_ext], dtype=jnp.int32)
    nproc1 = jnp.asarray([e[3] for e in parsed_ext], dtype=jnp.int32)

    stego3 = jnp.asarray(stego).reshape(b, n // 128, 128)
    over3 = jnp.asarray(over).reshape(b, n // 128, 128)
    r1, segs1, cnts1 = pp.extract_pass_batch(
        stego3, over3, nproc1, h, w, 1, t, max_val
    )
    r0, segs0, cnts0 = pp.extract_pass_batch(
        r1, over3, nproc0, h, w, 0, t, max_val
    )
    restored = np.asarray(r0).reshape(b, h, w)
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
