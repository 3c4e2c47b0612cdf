"""End-to-end encode / decode pipelines (host orchestration shell).

Mirrors the reference flow (``/root/reference/src/codec.py:847-926`` encode,
``:795-842`` decode) with the TPU division of labor from SURVEY §7: pixel
tensors live on device; decomposition is one device histogram + exact host
float64 cut-point math; embedding/extraction are fused jitted kernels; the
host keeps only DICOM file I/O, the transport codec, and the STGC container.

Unlike the reference, decode actually works (defect B1 fixed): positions are
deterministic from container metadata, segments join in message order, and the
XOR location maps make the *original* image recoverable, not just the payload.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple, Union

import jax
import numpy as np

from .config import EncodeConfig
from .errors import CapacityError
from .io import container as container_io
from .io import dicom
from .io.codecs import get as get_codec
from .ops import blocks as block_ops
from .ops import decompose as decompose_ops
from .ops import embed as embed_ops
from .ops import metrics as metric_ops
from .ops import segments as segment_ops
from .utils import bits as bit_utils
from .utils.logging import get_logger
from .profiling import stage

logger = get_logger("pipeline")

ArrayLike = Union[np.ndarray, jax.Array]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def _plane_bucket(s: int, dtype_bits: int) -> int:
    """Static unroll count for the plane kernels: 4, 8 or dtype width."""
    if s <= 4:
        return min(4, dtype_bits)
    if s <= 8:
        return min(8, dtype_bits)
    return dtype_bits


@dataclass
class EncodeResult:
    container: bytes
    stego: np.ndarray
    meta: container_io.ContainerMeta
    decomposition: decompose_ops.DecompositionResult
    metrics: Optional[Dict[str, float]] = None

    @property
    def s(self) -> int:
        return self.meta.s


@dataclass
class DecodeResult:
    payload_bits: np.ndarray
    stego: np.ndarray
    meta: container_io.ContainerMeta
    original: Optional[np.ndarray] = None   # restored via XOR maps if present

    @property
    def payload(self) -> bytes:
        return bit_utils.bits_to_bytes(self.payload_bits)

    @property
    def message(self) -> str:
        return self.payload.decode("utf-8", errors="replace")


def _as_payload_bits(payload: Union[bytes, str, np.ndarray]) -> np.ndarray:
    if isinstance(payload, str):
        return bit_utils.message_to_bits(payload)
    if isinstance(payload, (bytes, bytearray)):
        return bit_utils.bytes_to_bits(bytes(payload))
    return np.asarray(payload, dtype=np.uint8)


@partial(jax.jit, static_argnames=("nbits", "with_stats"))
def _fused_embed_step(image, msg, starts, lengths, offsets, s, nbits, with_stats):
    """One device dispatch for the whole embed stage: stego + fused metric
    moments. Separate launches cost ~9 ms each through the dev TPU tunnel
    and an extra host->device image transfer besides. XOR maps are NOT
    produced here: they are a cheap host XOR/shift of arrays the host holds
    anyway, and returning all ``nbits`` planes would move 8x the image size
    back over the link."""
    stego = embed_ops.embed(image, msg, starts, lengths, offsets, s, nbits)
    stats = metric_ops.pair_stats(image, stego) if with_stats else None
    return stego, stats


@partial(jax.jit, static_argnames=("nbits", "block", "with_stats"))
def _fused_block_embed_step(
    image, msg, bases, lengths, offsets, s, nbits, block, with_stats,
    msg_rows=None,
):
    stego = embed_ops.embed_block_adaptive(
        image, msg, bases, lengths, offsets, s, nbits, block, msg_rows
    )
    stats = metric_ops.pair_stats(image, stego) if with_stats else None
    return stego, stats


def _single_pallas_ok() -> bool:
    """Whether the single-image raster embed should route through the
    batch fast tiers (``parallel.batch._pick_pallas_backend``: packed ->
    preplaced -> windowed). The packed tier (round 3) takes ANY geometry
    via pad-to-128, so there is no geometry gate: on TPU the answer is
    simply yes; off-TPU the fused XLA step keeps its one-dispatch stats
    advantage."""
    return jax.default_backend() == "tpu"


def _host_xor_maps(original: np.ndarray, stego: np.ndarray, s: int) -> np.ndarray:
    """(s, H, W) uint8 XOR location maps computed on host (the reference's
    ``orig ^ stego`` bitmaps, src/codec.py:309-311).

    Written plane-at-a-time in the images' native dtype: the int64 broadcast
    it replaced materialized 8-byte temporaries 10x slower on the serving
    host's single core (round-3 batch_pack breakdown)."""
    diff = original ^ stego
    out = np.empty((s,) + diff.shape, np.uint8)
    for k in range(s):
        np.bitwise_and(diff >> k, 1, out=out[k], casting="unsafe")
    return out


def _block_bases(
    image: ArrayLike, nbits: int, s: int, block: int, h: int, w: int
) -> np.ndarray:
    ntiles = (-(-h // block)) * (-(-w // block))
    base = np.zeros((nbits, ntiles), dtype=np.int32)
    counts = np.asarray(block_ops.block_bit_counts_all(image, s, block))
    for p in range(s):
        b, _ = block_ops.block_base_offsets(counts[p], h, w, block)
        base[p] = b
    return base


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_array(
    image: ArrayLike,
    payload: Union[bytes, str, np.ndarray],
    config: EncodeConfig = EncodeConfig(),
    *,
    bits_stored: Optional[int] = None,
) -> EncodeResult:
    """Embed ``payload`` into ``image`` and build an STGC container."""
    config = config.validate()
    if config.strategy == "pee":
        from .models.pee import encode_pee_array

        return encode_pee_array(image, payload, config, bits_stored=bits_stored)

    image = np.asarray(image)
    if image.ndim != 2 or image.dtype not in (np.uint8, np.uint16):
        raise ValueError("image must be 2-D uint8/uint16")
    h, w = image.shape
    n = h * w
    dtype_bits = image.dtype.itemsize * 8

    nbits = config.nbits
    if nbits is None:
        if config.use_bits_stored and bits_stored:
            nbits = bits_stored     # defect B6 fixed (opt-out via config)
        else:
            nbits = dtype_bits      # reference default (src/codec.py:567)
    nbits = min(nbits, dtype_bits)

    msg_bits = _as_payload_bits(payload)
    total_bits = int(msg_bits.size)

    # 1. decomposition: one device histogram + exact host cut-point math
    with stage("decompose"):
        dec = decompose_ops.decompose(image, beta=config.beta, nbits=nbits)
    s = dec.s

    # 2. segment plan (host scalar work)
    plan = segment_ops.distribute_segments(s, total_bits, config.seed)
    dropped = total_bits - sum(min(e, n) for e in plan.eff_lengths)
    if dropped > 0 and not config.allow_capacity_overflow:
        raise CapacityError(
            f"payload of {total_bits} bits exceeds the usable capacity of "
            f"{segment_ops.usable_capacity_bits(s, n, config.seed)} bits at "
            f"s={s} ({dropped} bits would be silently dropped by the "
            f"per-plane clamp); shrink the payload, raise beta, or set "
            f"allow_capacity_overflow=True for reference-identical clamping"
        )

    # 3. strategy-specific plane plan + device embed.
    # The kernels unroll a *static* plane count; bucket it to the smallest
    # power-of-two >= s (4/8/16) so a typical beta=0.4 cut (s=3-4) does a
    # quarter of the work of a full 16-plane unroll.
    kernel_bits = _plane_bucket(s, dtype_bits)
    # round-5 routing (see config.EncodeConfig.device_policy and
    # ops.host_embed): raster embeds are O(payload) bit placement, so the
    # serving default ("auto") keeps them host-side — no image upload, no
    # map download — and reserves the chip for strategies with real
    # per-pixel compute (PEE, block_adaptive, fused device metrics).
    host_route = config.resolve_host_route(n)
    # upload the image once; both the block scan and the fused embed step
    # read it (a second host->device copy costs more than the kernels here).
    # decompose above did NOT transfer it: numpy inputs take the host
    # np.bincount histogram path.
    image_dev = None if host_route else jax.device_put(image)
    if config.strategy == "hybrid":
        if host_route:
            from .parallel.batch import hybrid_base_offsets_host

            # numpy twin of the device scan — byte-identical offsets
            # (tests/test_round5_serving.py)
            start = hybrid_base_offsets_host(
                image[None], h, w, config.search_block_size
            )[0]
        else:
            counts0 = np.asarray(
                block_ops.block_bit_counts(
                    image_dev, 0, config.search_block_size
                )
            )
            start = block_ops.best_offset_from_counts(
                counts0, h, w, config.search_block_size
            )
        pp = segment_ops.raster_plane_plan(
            plan, n, kernel_bits, start, config.align_across_planes
        )
    elif config.strategy == "multi_plane":
        pp = segment_ops.raster_plane_plan(plan, n, kernel_bits, 0, True)
    elif config.strategy == "block_adaptive":
        pp = segment_ops.raster_plane_plan(plan, n, kernel_bits, 0, True)
    else:  # pragma: no cover
        raise ValueError(config.strategy)

    max_off = int(pp.offsets.max(initial=0))
    msg_pad = embed_ops.pad_message(msg_bits, n, max_off)
    # bucket the padded length to limit jit specializations
    lpad = _next_pow2(msg_pad.size)
    if lpad != msg_pad.size:
        msg_pad = np.pad(msg_pad, (0, lpad - msg_pad.size))

    packed_maps_dev = None  # set by the fused packed-tier route below
    with stage("embed"):
        # 3b+4. one fused device dispatch: embed + metric moments — or the
        # O(payload) host window placement when the route is host-side
        if host_route:
            from .ops.host_embed import embed_raster_host_packed

            stego, packed_maps = embed_raster_host_packed(
                image, msg_pad, pp.starts, pp.lengths, pp.offsets,
                s, max(s, 1),
            )
            maps = None
            # forced-host with metrics requested still reports them (one
            # fused reduction; transfers only in that explicit case)
            stats = (
                metric_ops.pair_stats(image, stego)
                if config.compute_metrics else None
            )
            metrics = (
                metric_ops.quality_report(stats)
                if config.compute_metrics else None
            )
        elif config.strategy == "block_adaptive":
            bases = _block_bases(image_dev, kernel_bits, s, config.block_size, h, w)
            if h % config.block_size == 0 and w % config.block_size == 0:
                # uniform tiling: host pre-slice kills the kernel's traced
                # window slice (ops.embed.block_msg_rows)
                mrows = embed_ops.block_msg_rows(
                    msg_pad, pp.offsets, kernel_bits, h, w,
                    config.block_size,
                )
                stego_dev, stats = _fused_block_embed_step(
                    image_dev, np.zeros(8, np.uint8), bases, pp.lengths,
                    pp.offsets, np.int32(s), kernel_bits,
                    config.block_size, config.compute_metrics, mrows,
                )
            else:
                stego_dev, stats = _fused_block_embed_step(
                    image_dev, msg_pad, bases, pp.lengths, pp.offsets,
                    np.int32(s), kernel_bits, config.block_size,
                    config.compute_metrics,
                )
        elif _single_pallas_ok():
            # TPU raster route through the batch fast tiers (packed ->
            # preplaced): ships only the payload-covering message prefix
            # instead of the XLA formulation's off+N-sized buffer
            # (~0.5 MB/image on the dev link), and runs the fastest
            # eligible kernel. Bit-exact with the XLA path
            # (tests/test_pallas.py).
            from .parallel import batch as batch_par

            plan1 = batch_par.BatchPlan(
                s=np.array([s], np.int32),
                starts=pp.starts[None], lengths=pp.lengths[None],
                offsets=pp.offsets[None], msgs=msg_pad[None],
                payload_bits=np.array([total_bits], np.int64),
                nbits=kernel_bits, lpad=msg_pad.size,
            )
            # packed tier + bit-packed XOR maps as one dispatch when
            # eligible (3 dispatches' fixed tunnel cost otherwise)
            fused1 = batch_par.encode_single_packed_with_maps(
                image_dev, plan1, s
            )
            if fused1 is not None:
                stego_dev, packed_maps_dev = fused1
            else:
                stego_dev = batch_par.encode_batch(
                    image_dev[None], plan1, backend="auto"
                )[0]
            stats = (
                metric_ops.pair_stats(image_dev, stego_dev)
                if config.compute_metrics else None
            )
        else:
            stego_dev, stats = _fused_embed_step(
                image_dev, msg_pad, pp.starts, pp.lengths, pp.offsets,
                np.int32(s), kernel_bits, config.compute_metrics,
            )
        if not host_route:
            metrics = (
                metric_ops.quality_report(stats)
                if config.compute_metrics else None
            )
            if n % 8 == 0:
                # download bit-packed XOR maps instead of the stego image
                # (the tunnel's device->host direction is the slow one) and
                # rebuild stego host-side as orig ^ diff; the packed planes
                # are the v2.1 container bitmap blob, so no second diff
                # pass happens on host. Every strategy embeds into planes
                # [0, s) only, so s planes cover the whole diff — no need
                # to ship all kernel_bits.
                packed_maps = np.asarray(
                    packed_maps_dev if packed_maps_dev is not None
                    else embed_ops.xor_maps_packed_batch(
                        image_dev[None], stego_dev[None], s
                    )[0]
                )
                diff = bit_utils.packed_planes_to_diff(
                    packed_maps, image.dtype
                )
                stego = image ^ diff.reshape(h, w)
                maps = None  # v1 fallback rebuilds the raw planes on demand
            else:
                stego = np.asarray(stego_dev)
                maps = _host_xor_maps(image, stego, s)
                packed_maps = None

    # 5. transport codec + container (v2 stores the bitmap planes bit-packed
    # before zlib — 8x less single-core deflate input; v1 must keep the
    # reference's raw 0/1-byte blob so its own parse path reads our files)
    bitmaps_packed = (
        config.store_bitmaps and config.container_version == 2 and n % 8 == 0
    )
    with stage("transport_codec"):
        codec = get_codec(config.codec)
        stego_blob = codec.encode(stego)
        if not config.store_bitmaps:
            bitmaps_blob = b""
        elif bitmaps_packed:
            bitmaps_blob = container_io.compress_bitmaps_packed(
                packed_maps if packed_maps is not None else maps
            )
        else:
            if maps is None:  # packed branch above skips the raw planes
                maps = bit_utils.expand_bits(
                    packed_maps.reshape(s, n // 8)
                ).reshape(s, h, w)
            bitmaps_blob = container_io.compress_bitmaps(maps)

    ext = b""
    if config.strategy == "block_adaptive":
        ext = container_io.pack_block_ext(config.block_size)

    meta = container_io.ContainerMeta(
        version=config.container_version,
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
        ext=ext,
    )
    if config.container_version == 1:
        import struct as _struct

        if config.codec == "png":
            # the reference's 'png' codec is really a whole DEFLATED DICOM
            # file (src/codec.py:151-162); write that byte format in v1
            # containers so the reference's own decompress path reads them
            # (our PngCodec.decode accepts both forms)
            stego_blob = dicom.to_bytes(
                dicom.build_secondary_capture(stego, bits_stored=bits_stored),
                deflated=True,
            )
        # v1 stores only the clamped effective lengths, but decode replays
        # message offsets by accumulating the *planned* sizes; when the plan
        # has a negative bucket (tiny payloads) or per-plane clamping fired,
        # those disagree and a v1 round-trip would silently misjoin bits.
        if tuple(plan.sizes) != tuple(meta.eff_lengths):
            raise ValueError(
                "this embedding plan cannot round-trip through a v1 container "
                f"(planned segment sizes {tuple(plan.sizes)} != embedded "
                f"lengths {tuple(meta.eff_lengths)}); use container_version=2"
            )
        try:
            blob = container_io.pack_v1(
                config.codec, s, list(meta.eff_lengths),
                plan.indices, bitmaps_blob, stego_blob, w, h,
                pp.base_start_offset, pp.align_across_planes,
            )
        except _struct.error as exc:
            raise ValueError(
                "payload/geometry exceeds the v1 container's 16-bit field "
                "limits (reference defect B5); use container_version=2"
            ) from exc
    else:
        blob = container_io.pack(meta, bitmaps_blob, stego_blob)

    logger.info(
        "encoded: s=%d strategy=%s codec=%s payload=%d bits container=%d bytes",
        s, config.strategy, config.codec, total_bits, len(blob),
    )
    return EncodeResult(
        container=blob, stego=stego, meta=meta, decomposition=dec, metrics=metrics
    )


def encode_dicom(
    path: str,
    payload: Union[bytes, str, np.ndarray],
    config: EncodeConfig = EncodeConfig(),
) -> EncodeResult:
    image, ds = dicom.load_image(path)
    if image.dtype == np.int16:
        image = image.astype(np.uint16)
    return encode_array(image, payload, config, bits_stored=ds.bits_stored)


def encode_file(
    path: str,
    payload: Union[bytes, str, np.ndarray],
    config: EncodeConfig = EncodeConfig(),
) -> EncodeResult:
    """Encode any supported image file: DICOM through the native reader
    (BitsStored plumbed through), PNG/PIL grayscale formats otherwise."""
    if path.lower().endswith(".dcm"):
        image, ds = dicom.load_image(path)
        if image.ndim == 3:
            raise ValueError(
                f"{path} is a multi-frame DICOM ({image.shape[0]} frames); "
                f"use encode-volume / parallel.volume for volumes"
            )
        if image.dtype == np.int16:
            image = image.astype(np.uint16)
        return encode_array(image, payload, config, bits_stored=ds.bits_stored)
    from PIL import Image

    arr = np.array(Image.open(path))
    if arr.dtype == np.int32:
        arr = arr.astype(np.uint16)
    return encode_array(arr, payload, config)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _plane_plan_from_meta(meta: container_io.ContainerMeta, n: int, kernel_bits: int):
    """Rebuild the device plan from container metadata alone (no re-derivation
    from the seed needed — v2 stores the resolved plan)."""
    starts = np.zeros(kernel_bits, dtype=np.int32)
    lengths = np.zeros(kernel_bits, dtype=np.int32)
    offsets = np.zeros(kernel_bits, dtype=np.int32)
    # message offsets replay the reference's cumulative walk in segment order
    bit_idx = 0
    for plane in meta.indices:
        offsets[plane] = max(bit_idx, 0)
        # sizes are plane-indexed in both versions (the reference walks
        # distributed_sizes[dest_plane_idx] in segment order, codec.py:269-272)
        bit_idx += meta.sizes[plane]
    for plane in range(meta.s):
        lengths[plane] = meta.eff_lengths[plane]
    if meta.version == 1:
        # v1 stores only the base start_offset + align flag; replay the
        # hybrid strategy's sequential-advance walk (src/codec.py:482-485)
        offset = meta.start_offset % n if n else 0
        for plane in meta.indices:
            starts[plane] = offset
            if not meta.align_across_planes:
                offset = (offset + min(int(lengths[plane]), n)) % n
    else:
        for plane in range(meta.s):
            starts[plane] = meta.plane_starts[plane]
    return starts, lengths, offsets


def decode_container(
    data: Union[bytes, container_io.Container],
    *,
    restore_original: bool = True,
) -> DecodeResult:
    cont = container_io.parse(data) if isinstance(data, (bytes, bytearray)) else data
    meta = cont.meta

    if meta.strategy == "pee":
        from .models.pee import decode_pee_container

        return decode_pee_container(cont, restore_original=restore_original)

    with stage("transport_decode"):
        codec = get_codec(meta.codec)
        stego = codec.decode(cont.stego_blob)
    if meta.version == 1:
        # v1 headers record no dtype (the parse-time uint16 is a placeholder);
        # the decoded transport payload does (BitsAllocated in the embedded
        # DICOM) — adopt it so reference-written uint8 images restore as uint8
        meta.dtype = stego.dtype
    elif stego.dtype != meta.dtype:
        stego = stego.astype(meta.dtype)
    h, w = meta.height, meta.width
    if stego.shape != (h, w):
        raise ValueError(f"Decoded stego shape {stego.shape} != header {(h, w)}")
    n = h * w
    kernel_bits = _plane_bucket(meta.s, stego.dtype.itemsize * 8)

    starts, lengths, offsets = _plane_plan_from_meta(meta, n, kernel_bits)
    out_len = max(int(meta.payload_bits), 1)

    # Extraction runs ON HOST: the stego just came out of a host transport
    # codec, and reading payload_bits of it is O(payload) numpy slice work —
    # the device formulation is O(N) and must ship the whole image over the
    # link first (round-3 bench: 346.66 ms batch_extract on TPU vs 67.57 ms
    # CPU backend for identical 32x512^2 work; the host windows are
    # microseconds). ops.embed's device kernels stay the path for
    # device-resident data (encode, volume, tile, cycle benches) and are
    # property-tested bit-equal to ops.host_extract.
    from .ops import host_extract

    if meta.strategy == "block_adaptive":
        diff = cont.diff(stego.dtype)
        if diff is None:
            raise ValueError(
                "block_adaptive extraction requires the XOR location maps"
            )
        block = container_io.parse_block_ext(meta.ext)
        original = stego ^ diff
        with stage("extract"):
            counts = host_extract.block_counts_host(original, meta.s, block)
            rankings = [
                block_ops.ranking_from_counts(counts[p], h, w, block)
                for p in range(meta.s)
            ]
            bits = host_extract.extract_block_host(
                stego, rankings, lengths, offsets, meta.s, block, out_len,
            )[: meta.payload_bits]
        return DecodeResult(bits, stego, meta, original if restore_original else None)

    with stage("extract"):
        bits = host_extract.extract_raster_host(
            stego, starts, lengths, offsets, meta.s, out_len
        )[: meta.payload_bits]

    original = None
    if restore_original and meta.has_bitmaps:
        with stage("restore"):
            # O(payload) window restore for raster v2.1 containers (exact
            # full-diff fallback otherwise — container.restore_original)
            original = cont.restore_original(stego)
    return DecodeResult(bits, stego, meta, original)


def decode_file(path: str, *, restore_original: bool = True) -> DecodeResult:
    with open(path, "rb") as f:
        return decode_container(f.read(), restore_original=restore_original)


# ---------------------------------------------------------------------------
# capacity planning
# ---------------------------------------------------------------------------


def load_input(path: str) -> Tuple[np.ndarray, Optional[int]]:
    """Image array + BitsStored (``None`` for non-DICOM): one shared input
    prologue for the CLI ``capacity`` subcommand and the serve daemon's
    ``capacity`` op, so the two entry points answer identically for the
    same file."""
    if path.lower().endswith(".dcm"):
        arr, ds = dicom.load_image(path)
        return arr, ds.bits_stored
    from .cli import _load_any

    return _load_any(path), None


def capacity_report(
    arr: np.ndarray,
    *,
    bits_stored: Optional[int] = None,
    beta: float = 0.4,
    seed: int = 42,
    nbits: Optional[int] = None,
    use_bits_stored: bool = True,
    pee_threshold: int = 2,
) -> Dict:
    """Usable payload capacity per strategy, without encoding anything.

    Reports the boundary the encoders actually accept: the quadratic
    segment distribution's usable bits for the LSB strategies (NOT the
    reference's ``s*H*W`` claim, codec.py:294, which oversubscribes
    plane 0 — included as ``reference_rule_bits`` for contrast) and the
    saturated two-pass probe for PEE (pass-1 capacity measured on the
    pass-0 result). 3-D inputs use :func:`parallel.volume.encode_volume`'s
    semantics: one GLOBAL cut point, per-slice chunks. Shared by the CLI
    ``capacity`` subcommand and the serve daemon's ``capacity`` op."""
    from .models import get_embedder

    arr = np.asarray(arr)
    dtype_bits = arr.dtype.itemsize * 8
    if nbits is None:
        eff_nbits = (
            bits_stored if (bits_stored and use_bits_stored) else dtype_bits
        )
    else:
        eff_nbits = nbits
    eff_nbits = min(eff_nbits, dtype_bits)
    t = max(1, pee_threshold)

    out: Dict = {
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
        "bits_stored": bits_stored,
        "beta": beta,
        "nbits": eff_nbits,
        "pee_threshold": t,
    }
    if arr.ndim == 3:
        from .parallel.batch_pee import probe_capacity_batch
        from .parallel.volume import volume_cut_point

        d, h, w = arr.shape
        s, _ = volume_cut_point(arr, beta)
        out["cut_point_s"] = int(s)
        out["frames"] = d
        out["lsb_bits"] = int(
            segment_ops.usable_capacity_bits(s, h * w, seed)
        ) * d
        # the volume PEE encoder embeds with the full-dtype max_val
        # (parallel/volume._encode_volume_pee — STGV volumes carry no
        # BitsStored), so the report must probe with the same bound to be
        # "the boundary the encoders actually accept"
        max_val = (1 << dtype_bits) - 1
        out["pee_bits"] = int(np.sum(probe_capacity_batch(arr, t, max_val)))
        out["reference_rule_bits"] = int(s) * h * w * d
    else:
        dec = decompose_ops.decompose(arr, beta=beta, nbits=eff_nbits)
        out["cut_point_s"] = int(dec.s)
        out["lsb_bits"] = int(
            segment_ops.usable_capacity_bits(dec.s, arr.size, seed)
        )
        pee = get_embedder(
            "pee", beta=beta, seed=seed, nbits=nbits,
            use_bits_stored=use_bits_stored, pee_threshold=t,
        )
        out["pee_bits"] = int(pee.capacity_bits(arr, bits_stored=bits_stored))
        out["reference_rule_bits"] = int(dec.s) * arr.size
    return out


# ---------------------------------------------------------------------------
# analyze
# ---------------------------------------------------------------------------


def analyze_pair(
    original: ArrayLike,
    stego: ArrayLike,
    *,
    range_a: Optional[float] = None,
    range_b: Optional[float] = None,
    max_value: Optional[float] = None,
) -> Dict[str, float]:
    """Quality metrics for an image pair — delegates to the single unified
    entry point :func:`codec_tcc_tpu.ops.metrics.analyze_pair` (data-max
    range policy by default; pass BitsStored-derived ranges for the
    reference's file branch, or ``max_value`` to override only the final
    PSNR/SSIM range — all keyword-only, see that docstring)."""
    return metric_ops.analyze_pair(
        original, stego, range_a=range_a, range_b=range_b, max_value=max_value
    )
