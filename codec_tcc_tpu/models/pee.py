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
from typing import Optional, Tuple, Union

import numpy as np

from ..config import EncodeConfig
from ..io import container as container_io
from ..ops import metrics as metric_ops
from ..ops import pee as pee_ops
from ..utils.logging import get_logger

logger = get_logger("models.pee")

_MAX_T = 128
_EXT_FMT = ">IIIIQQ"  # t, passes, n_proc0, n_proc1, bits0, bits1


def _pack_ext(t: int, passes: int, n0: int, n1: int, b0: int, b1: int) -> bytes:
    return struct.pack(_EXT_FMT, t, passes, n0, n1, b0, b1)


def _parse_ext(ext: bytes) -> Tuple[int, int, int, int, int, int]:
    return struct.unpack(_EXT_FMT, ext[: struct.calcsize(_EXT_FMT)])


def _select_threshold(
    image: np.ndarray, payload_bits: int, t0: int, max_val: int
) -> Tuple[int, int, int]:
    """Smallest T >= t0 with capacity(pass0)+capacity(pass1) >= payload.

    Returns (t, cap0, cap_total). Raises if even T=_MAX_T cannot hold it.
    """
    t = max(1, int(t0))
    while t <= _MAX_T:
        cap0 = int(pee_ops.capacity(image, 0, t, max_val))
        cap1 = int(pee_ops.capacity(image, 1, t, max_val))
        if cap0 + cap1 >= payload_bits:
            return t, cap0, cap0 + cap1
        t *= 2
    raise ValueError(
        f"payload of {payload_bits} bits exceeds PEE capacity even at T={_MAX_T}"
    )


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

    t, cap0, cap_total = _select_threshold(image, total_bits, config.pee_threshold, max_val)

    lpad = 1 << max(3, (max(total_bits, 1) - 1).bit_length())
    msg_pad = np.zeros(lpad, dtype=np.uint8)
    msg_pad[:total_bits] = msg_bits

    want0 = min(total_bits, cap0)
    stego0, over0, used0, nproc0 = pee_ops.embed_pass(
        image, msg_pad, np.int32(0), np.int32(want0), 0, t, max_val
    )
    used0 = int(used0)
    want1 = total_bits - used0
    passes = 1
    over1 = np.zeros((h, w), dtype=bool)
    nproc1 = 0
    used1 = 0
    stego = stego0
    if want1 > 0:
        passes = 2
        stego, over1_dev, used1_dev, nproc1_dev = pee_ops.embed_pass(
            stego0, msg_pad, np.int32(used0), np.int32(want1), 1, t, max_val
        )
        over1 = np.asarray(over1_dev)
        used1 = int(used1_dev)
        nproc1 = int(nproc1_dev)
        if used0 + used1 < total_bits:  # cannot happen after _select_threshold
            raise AssertionError("PEE capacity accounting violated")

    stego_np = np.asarray(stego)
    overflow = np.asarray(over0) | np.asarray(over1)
    map_blob = zlib.compress(np.packbits(overflow).tobytes())

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


def decode_pee_container(cont: container_io.Container, *, restore_original: bool = True):
    from ..pipeline import DecodeResult
    from ..io.codecs import get as get_codec

    meta = cont.meta
    t, passes, nproc0, nproc1, bits0, bits1 = _parse_ext(meta.ext)
    stego = get_codec(meta.codec).decode(cont.stego_blob)
    if stego.dtype != meta.dtype:
        stego = stego.astype(meta.dtype)
    h, w = meta.height, meta.width
    max_val = (1 << meta.bits_stored) - 1
    if int(stego.max()) > max_val:
        max_val = (1 << (stego.dtype.itemsize * 8)) - 1

    raw = zlib.decompress(cont.bitmaps_blob)
    overflow = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))[: h * w]
    overflow = overflow.reshape(h, w).astype(bool)

    out_len = 1 << max(3, (max(int(meta.payload_bits), 1) - 1).bit_length())

    # invert pass 1 first (it was applied last), then pass 0
    img = stego
    bits1_arr = np.zeros(0, dtype=np.uint8)
    if passes == 2:
        img, b1, n1 = pee_ops.extract_pass(
            img, overflow, np.int32(nproc1), 1, t, max_val, out_len
        )
        bits1_arr = np.asarray(b1)[: int(n1)]
    img, b0, n0 = pee_ops.extract_pass(
        img, overflow, np.int32(nproc0), 0, t, max_val, out_len
    )
    bits0_arr = np.asarray(b0)[: int(n0)]

    payload_bits = np.concatenate([bits0_arr, bits1_arr])[: meta.payload_bits]
    original = np.asarray(img) if restore_original else None
    return DecodeResult(
        payload_bits=payload_bits.astype(np.uint8),
        stego=stego,
        meta=meta,
        original=original,
    )
