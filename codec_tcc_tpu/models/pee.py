"""PEE embedder model: pipeline + container integration.

Implements the north-star scheme end to end ("PEE neighbor predictor,
prediction-error histogram, expansion-and-shift embedding, location-map
generation" — BASELINE.json) on top of the kernels in
:mod:`codec_tcc_tpu.ops.pee`. The STGC v2 container carries it as strategy 4
with a PEE extension block (threshold, passes, per-pass boundaries and bit
counts) and the overflow location map in the bitmaps slot.

Threshold selection is capacity-adaptive: the smallest ``T`` whose two-pass
capacity holds the payload (the "prediction-error histogram" step — capacity
per T *is* the cumulative histogram of |e|), starting from the configured
``pee_threshold``.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

from ..config import EncodeConfig
from ..errors import CapacityError
from ..io import container as container_io
from ..ops import metrics as metric_ops
from ..ops import pee as pee_ops
from ..utils.logging import get_logger

logger = get_logger("models.pee")

_MAX_T = 128
_pack_ext = container_io.pack_pee_ext
_parse_ext = container_io.parse_pee_ext


def select_threshold(cap0, cap1_est, total_bits: int, t_min: int = 1):
    """Smallest ``T >= t_min`` whose exact pass-0 capacity plus estimated
    pass-1 capacity holds the payload, read off the capacity histograms
    (:func:`ops.pee.capacities_by_threshold`) — the histogram-driven
    threshold selection the north star names (round-2 verdict #3). Returns
    ``None`` when even ``T = t_max`` falls short of the estimate.

    ``cap0`` is exact (the histogram excludes T-independent expansion
    overflow), so a payload within ``cap0[T-1]`` embeds in ONE pass with no
    confirmation shortfall possible. ``cap1_est`` is measured on the
    pristine image while pass 1 really runs on the pass-0 stego; the tiny
    interaction error is absorbed by the caller's escalate-on-shortfall
    loop (rare — one extra embed, not the old up-to-8 probe schedule)."""
    import numpy as np

    comb = np.asarray(cap0) + np.asarray(cap1_est)
    t_min = max(1, int(t_min))
    fits = np.nonzero(comb[t_min - 1 :] >= total_bits)[0]
    if fits.size == 0:
        return None
    return t_min + int(fits[0])


def encode_pee_array(
    image,
    payload,
    config: EncodeConfig,
    *,
    bits_stored: Optional[int] = None,
):
    from ..pipeline import EncodeResult, _as_payload_bits  # cycle-free at runtime

    image = np.asarray(image)
    if image.ndim != 2 or image.dtype not in (np.uint8, np.uint16):
        raise ValueError("image must be 2-D uint8/uint16")
    h, w = image.shape
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

    # Pallas fast path (single chip, supported geometry): identical bytes to
    # the XLA loop below — every backend passes the UNCLAMPED want into
    # embed_pass, which clamps to capacity itself (saturation convention,
    # ops/pee.py) — so routing is purely a speed choice (the XLA per-pixel
    # message gather measures ~43 MPix/s; the kernels >1 GPix/s).
    import jax

    from ..ops import pallas_pee as _pp

    if jax.default_backend() == "tpu" and _pp.routeable(h, w):
        from ..parallel.batch_pee import encode_pee_batch

        bres = encode_pee_batch(
            image[None], [msg_bits], config, bits_stored=bits_stored
        )
        stego_np = bres.stego[0]
        meta = container_io.parse(bres.containers[0]).meta
        metrics = None
        if config.compute_metrics:
            stats = metric_ops.pair_stats(image, stego_np)
            metrics = metric_ops.quality_report(stats)
        from ..ops.decompose import DecompositionResult

        dec = DecompositionResult(
            s=0, nbits=eff_bits, entropy=0.0, target=0.0,
            mi=np.zeros(0), cumulative=np.zeros(0),
        )
        return EncodeResult(
            container=bres.containers[0], stego=stego_np, meta=meta,
            decomposition=dec, metrics=metrics,
        )

    # Histogram-driven threshold selection (round-2 verdict #3): one device
    # histogram pass yields the exact pass-0 capacity and the pass-1 estimate
    # at EVERY threshold, so the typical encode runs ONE embed per pass
    # instead of probing the geometric T schedule with full embeds. Pass
    # interaction (pass 1 runs on the pass-0-MODIFIED image, estimate is on
    # the pristine one) is absorbed by escalating on an actual shortfall.
    hist0 = pee_ops.capacity_histogram(image, 0, _MAX_T, max_val)
    hist1 = pee_ops.capacity_histogram(image, 1, _MAX_T, max_val)
    cap0 = pee_ops.capacities_by_threshold(hist0)
    cap1 = pee_ops.capacities_by_threshold(hist1)
    t = select_threshold(cap0, cap1, total_bits, config.pee_threshold)
    if t is None:
        t = _MAX_T  # one exact attempt: the embed is the authority, the
        #             histogram estimate only schedules (matches batch path)
    result = None
    while t <= _MAX_T:
        # ONE dispatch per threshold attempt: both passes chain on device
        # (pass 1 at want - used0 = 0 bits is a provable no-op, so the
        # fused form is bit-identical to the old sequential early exit);
        # only the used/nproc scalars come back to the host
        stego, over_dev, u0, n0, u1, n1 = pee_ops.embed_both_passes(
            image, msg_pad, np.int32(total_bits), t, max_val
        )
        used0, used1 = int(u0), int(u1)
        if used0 + used1 < total_bits:
            t += 1  # estimate fell short by the pass interaction; escalate
            continue
        passes = 2 if used1 > 0 else 1
        result = (t, stego, over_dev, used0, int(n0), used1, int(n1), passes)
        break
    if result is None:
        raise CapacityError(
            f"payload of {total_bits} bits exceeds PEE capacity even at "
            f"T={_MAX_T} (pass-1 capacity measured on the pass-0 result)"
        )
    t, stego, over_dev, used0, nproc0, used1, nproc1, passes = result

    # pack the overflow map ON DEVICE (8x less device->host traffic and no
    # host packbits; the packed bytes ARE the container blob's input)
    from ..ops import embed as embed_ops

    stego_np = np.asarray(stego)
    packed_over = np.asarray(embed_ops.pack_bits_batch(over_dev[None]))[0]
    map_blob = zlib.compress(packed_over.tobytes())

    metrics = None
    if config.compute_metrics:
        stats = metric_ops.pair_stats(image, stego_np)
        metrics = metric_ops.quality_report(stats)

    from ..io.codecs import get as get_codec

    stego_blob = get_codec(config.codec).encode(stego_np)
    ext = _pack_ext(t, passes, int(nproc0), nproc1, used0, used1)
    meta = container_io.ContainerMeta(
        version=2,
        codec=config.codec,
        strategy="pee",
        s=0,
        nbits=eff_bits,
        bits_stored=eff_bits,
        dtype=image.dtype,
        width=w,
        height=h,
        start_offset=0,
        seed=config.seed,
        payload_bits=total_bits,
        align_across_planes=False,
        has_bitmaps=True,
        sizes=(),
        indices=(),
        eff_lengths=(),
        plane_starts=(),
        ext=ext,
    )
    blob = container_io.pack(meta, map_blob, stego_blob)
    logger.info(
        "pee encoded: T=%d passes=%d bits=%d (pass0=%d pass1=%d) container=%d B",
        t, passes, total_bits, used0, used1, len(blob),
    )

    # decomposition result stub for API uniformity (PEE has no cut point)
    from ..ops.decompose import DecompositionResult

    dec = DecompositionResult(
        s=0, nbits=eff_bits, entropy=0.0, target=0.0,
        mi=np.zeros(0), cumulative=np.zeros(0),
    )
    return EncodeResult(
        container=blob, stego=stego_np, meta=meta, decomposition=dec, metrics=metrics
    )


def parse_pee_container_parts(cont: container_io.Container):
    """Validate and unpack a PEE container's strategy parts with the
    'Invalid file: ...' ValueError contract (shared by the single-image and
    batched decoders). Returns ``(ext_tuple, overflow_bool_hw)``."""
    meta = cont.meta
    if len(meta.ext) < struct.calcsize(container_io._PEE_EXT_FMT):
        raise ValueError(
            "Invalid file: truncated PEE extension block "
            f"({len(meta.ext)} bytes, need "
            f"{struct.calcsize(container_io._PEE_EXT_FMT)})"
        )
    ext = _parse_ext(meta.ext)
    h, w = meta.height, meta.width
    # defense in depth: container.parse already rejects oversized dims, but
    # n below feeds the overflow-map inflate bound, so never trust a meta
    # that arrived by another route (the bound would scale with h*w and
    # expand_bits multiplies the inflated bytes 8x)
    container_io._check_dims(w, h, meta.s)
    t_val, passes, nproc0, nproc1, bits0, bits1 = ext
    n = h * w
    if not (1 <= t_val <= _MAX_T) or passes not in (1, 2):
        raise ValueError(
            f"Invalid file: PEE ext out of range (T={t_val}, passes={passes})"
        )
    if not (0 <= nproc0 <= n and 0 <= nproc1 <= n
            and 0 <= bits0 <= n and 0 <= bits1 <= n):
        raise ValueError(
            "Invalid file: PEE ext boundaries exceed the image size "
            f"({nproc0}, {nproc1}, {bits0}, {bits1} vs {n} pixels)"
        )
    if meta.payload_bits > bits0 + bits1:
        raise ValueError(
            f"Invalid file: payload_bits {meta.payload_bits} exceeds the "
            f"recorded pass totals ({bits0} + {bits1})"
        )
    from ..utils.bits import bounded_inflate, expand_bits

    # the map is pack_bits of n pixels (device packing may lane-pad the
    # tail); bound the untrusted inflate at that size plus the padding slack
    raw = bounded_inflate(
        cont.bitmaps_blob, (n + 7) // 8 + 4096, "PEE overflow map blob"
    )

    overflow = expand_bits(np.frombuffer(raw, dtype=np.uint8))
    if overflow.size < h * w:
        raise ValueError(
            f"Invalid file: PEE overflow map holds {overflow.size} bits, "
            f"image needs {h * w}"
        )
    return ext, overflow[: h * w].reshape(h, w).astype(bool)


def decode_pee_container(cont: container_io.Container, *, restore_original: bool = True):
    from ..pipeline import DecodeResult
    from ..io.codecs import get as get_codec

    meta = cont.meta

    # Pallas fast path (same routing rule as encode; decode_pee_batch will
    # not fall back to this function when the conditions hold, so there is
    # no recursion)
    import jax

    from ..ops import pallas_pee as _pp

    if jax.default_backend() == "tpu" and _pp.routeable(meta.height, meta.width):
        from ..parallel.batch_pee import decode_pee_batch

        return decode_pee_batch([cont], restore_original=restore_original)[0]
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

    # invert pass 1 first (it was applied last), then pass 0 — fused into
    # one dispatch; single-pass containers carry nproc1 == 0, which makes
    # the pass-1 inversion an exact identity (see ops.pee)
    img, b1, n1, b0, n0 = pee_ops.extract_both_passes(
        stego, overflow, np.int32(nproc0),
        np.int32(nproc1 if passes == 2 else 0), t, max_val, out_len,
    )
    bits1_arr = np.asarray(b1)[: int(n1)]
    bits0_arr = np.asarray(b0)[: int(n0)]

    payload_bits = np.concatenate([bits0_arr, bits1_arr])[: meta.payload_bits]
    original = np.asarray(img) if restore_original else None
    return DecodeResult(
        payload_bits=payload_bits.astype(np.uint8),
        stego=stego,
        meta=meta,
        original=original,
    )
