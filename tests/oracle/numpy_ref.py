"""NumPy oracle: the semantic contract for the TPU framework.

This module re-expresses the *behavior* of the reference
(``/root/reference/src/codec.py``) as small, tested NumPy functions, with the
verified defects of SURVEY.md §2.4 resolved the way the survey prescribes:

* B1 — extraction here reads LSBs at the deterministic embedding positions and
  joins segments in message (``segment_indices``) order, so payloads round-trip
  exactly (the reference's ``decode_message`` at ``src/codec.py:752-787`` never
  round-trips: its XOR bitmap skips ~50% of bits and joins in plane order).
* B2 — block-adaptive embedding implements the *intended* variance-ranked
  block fill (the reference version at ``src/codec.py:320-410`` is a no-op due
  to writes into ravel() copies). Ranking is defined exactly: blocks ordered by
  the exact rational variance ``c*(k-c)/k^2`` (c = popcount, k = block size)
  descending, ties broken by raster block order — equivalent to the reference's
  stable ``sort(key=np.var, reverse=True)`` wherever np.var is exact.
* B4 — the hybrid strategy returns its variance-chosen ``start_offset`` so it
  can be persisted (the reference drops it, ``src/codec.py:453,485``).

Everything the device kernels must match bit-for-bit lives here.
"""

from __future__ import annotations

import math
import random as _random
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_SHUFFLE_SEED = 42

# ---------------------------------------------------------------------------
# Bit-plane split / merge  (reference: src/codec.py:571, 215-237)
# ---------------------------------------------------------------------------


def split_planes(image: np.ndarray, nbits: int) -> List[np.ndarray]:
    """LSB-first list of bit planes, same dtype as the image
    (``(image >> i) & 1``, src/codec.py:571)."""
    return [(image >> np.array(i, dtype=image.dtype)) & np.array(1, dtype=image.dtype) for i in range(nbits)]


def merge_planes(global_planes: Sequence[np.ndarray], local_planes: Sequence[np.ndarray]) -> np.ndarray:
    """Shift-OR recombination; uint16 iff total planes > 8 (src/codec.py:215-237)."""
    sample = global_planes[0] if len(global_planes) else local_planes[0]
    total = len(global_planes) + len(local_planes)
    dtype = np.uint16 if total > 8 else np.uint8
    out = np.zeros(sample.shape, dtype=dtype)
    for i, plane in enumerate(global_planes):
        out |= plane.astype(dtype) << (i + len(local_planes))
    for i, plane in enumerate(local_planes):
        out |= plane.astype(dtype) << i
    return out


# ---------------------------------------------------------------------------
# Information-theoretic decomposition  (reference: src/codec.py:489-599)
# ---------------------------------------------------------------------------


def entropy(image: np.ndarray) -> float:
    """Shannon entropy, reproducing src/codec.py:489-502 exactly (bincount of
    the raveled array, filter zero counts, float64 math)."""
    counts = np.bincount(image.ravel())
    probs = counts[counts > 0] / image.size
    return float(-np.sum(probs * np.log2(probs)))


def _dtype_max(image: np.ndarray) -> int:
    if image.dtype == np.uint8:
        return 255
    if image.dtype == np.uint16:
        return 65535
    return int(image.max())


def mutual_information(bit_plane: np.ndarray, image: np.ndarray) -> float:
    """I(X;Y) between a bit plane and the image, reproducing the float64
    evaluation order of src/codec.py:504-559 (without its unbounded cache).

    Mathematically this equals H(bit_plane) because the plane is a
    deterministic function of the pixel value — the insight the TPU path
    exploits — but we keep the reference's exact formula here so cut points
    agree to the last ulp.
    """
    if bit_plane.min() == bit_plane.max() or image.min() == image.max():
        return 0.0
    bp = bit_plane.ravel()
    im = image.ravel()

    counts_x = np.bincount(bp, minlength=2)
    probs_x = counts_x[counts_x > 0] / bit_plane.size
    h_x = -np.sum(probs_x * np.log2(probs_x))

    max_val = _dtype_max(image)
    counts_y = np.bincount(im, minlength=max_val + 1)
    probs_y = counts_y[counts_y > 0] / image.size
    h_y = -np.sum(probs_y * np.log2(probs_y))

    combined = bp.astype(np.int32) * (max_val + 1) + im.astype(np.int32)
    joint_counts = np.bincount(combined, minlength=2 * (max_val + 1))
    joint_probs = joint_counts[joint_counts > 0] / image.size
    h_xy = -np.sum(joint_probs * np.log2(joint_probs))

    return max(0.0, float(h_x + h_y - h_xy))


def adaptive_decomposition(
    image: np.ndarray, beta: float = 0.8, nbits: Optional[int] = None
) -> Tuple[int, List[np.ndarray], List[np.ndarray]]:
    """Adaptive cut point s: accumulate per-plane MI (LSB->MSB) until it
    reaches ``beta * H(image)`` (src/codec.py:561-599). Returns
    ``(s, global_planes, local_planes)``.

    Note the reference defaults ``nbits`` to the dtype width, ignoring DICOM
    BitsStored (defect B6); callers should pass BitsStored when they have it.
    """
    if nbits is None:
        nbits = image.dtype.itemsize * 8
    planes = split_planes(image, nbits)
    target = beta * entropy(image)
    cumulative = 0.0
    s = 1
    for i in range(nbits):
        cumulative += mutual_information(planes[i], image)
        if cumulative >= target:
            s = i + 1
            break
    return s, planes[s:], planes[:s]


# ---------------------------------------------------------------------------
# Segment distribution  (reference: src/codec.py:242-274)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SegmentPlan:
    """The full embedding plan: everything a decoder needs to invert an embed.

    For segment order position ``k`` (message order), the destination plane is
    ``indices[k]``; that segment's *planned* size is ``sizes[indices[k]]`` and
    it is sliced from the message at ``msg_offsets[k]`` with *effective* length
    ``eff_lengths[k]`` (Python slice clamping applied, matching
    ``message_bits[bit_idx:bit_idx+size]`` at src/codec.py:271).
    """

    s: int
    total_bits: int
    sizes: Tuple[int, ...]          # indexed by plane (may contain a negative!)
    indices: Tuple[int, ...]        # segment order k -> destination plane
    msg_offsets: Tuple[int, ...]    # segment order k -> message bit offset
    eff_lengths: Tuple[int, ...]    # segment order k -> bits actually available

    def plane_eff_length(self, plane: int) -> int:
        return self.eff_lengths[self.indices.index(plane)]

    def plane_msg_offset(self, plane: int) -> int:
        return self.msg_offsets[self.indices.index(plane)]


def distribute_segments(
    s: int, total_bits: int, seed: int = DEFAULT_SHUFFLE_SEED
) -> SegmentPlan:
    """Quadratic decreasing weights ``(s-i)^2`` with a ``max(1, .)`` floor and
    excess correction on the largest bucket, then a fixed Mersenne-Twister
    shuffle of destination order (src/codec.py:251-264). All edge accidents of
    the reference (negative corrected sizes, offsets past the message end) are
    reproduced via genuine Python slice semantics."""
    weights = [(s - i) ** 2 for i in range(s)]
    total_weight = sum(weights)
    sizes = [max(1, int((w / total_weight) * total_bits)) for w in weights]
    excess = sum(sizes) - total_bits
    if excess != 0:
        sizes[sizes.index(max(sizes))] -= excess

    indices = list(range(s))
    _random.Random(seed).shuffle(indices)

    msg_offsets: List[int] = []
    eff_lengths: List[int] = []
    probe = range(total_bits)  # Python slice semantics oracle (same as str/np)
    bit_idx = 0
    for plane in indices:
        size = sizes[plane]
        msg_offsets.append(bit_idx)
        eff_lengths.append(len(probe[bit_idx : bit_idx + size]))
        bit_idx += size
    return SegmentPlan(
        s=s,
        total_bits=total_bits,
        sizes=tuple(sizes),
        indices=tuple(indices),
        msg_offsets=tuple(msg_offsets),
        eff_lengths=tuple(eff_lengths),
    )


# ---------------------------------------------------------------------------
# Block scoring  (reference: src/codec.py:352-359, 441-450)
# ---------------------------------------------------------------------------


def block_grid(h: int, w: int, block: int) -> List[Tuple[int, int, int, int]]:
    """Raster-ordered list of (y0, x0, bh, bw) tiles."""
    out = []
    for y in range(0, h, block):
        for x in range(0, w, block):
            out.append((y, x, min(block, h - y) , min(block, w - x)))
    return out


def block_variance_ranking(plane: np.ndarray, block: int) -> List[int]:
    """Indices into :func:`block_grid` order, ranked by exact binary variance
    ``c*(k-c)/k^2`` descending with raster tie-break (the well-defined version
    of the reference's ``sort(key=np.var, reverse=True)`` at
    src/codec.py:361-362)."""
    from fractions import Fraction

    h, w = plane.shape
    grid = block_grid(h, w, block)
    keyed = []
    for i, (y0, x0, bh, bw) in enumerate(grid):
        blk = plane[y0 : y0 + bh, x0 : x0 + bw]
        c = int(np.count_nonzero(blk))
        k = bh * bw
        # exact rational variance of binary data: c*(k-c)/k^2
        keyed.append((Fraction(-(c * (k - c)), k * k), i))
    keyed.sort()
    return [i for _, i in keyed]


def best_block_offset(plane: np.ndarray, block: int) -> int:
    """Raster offset ``y0*w + x0`` of the strictly-max-variance block (first
    max in raster order wins, matching the strict ``>`` scan at
    src/codec.py:441-450)."""
    h, w = plane.shape
    best = None
    best_i = 0
    grid = block_grid(h, w, block)
    from fractions import Fraction

    for i, (y0, x0, bh, bw) in enumerate(grid):
        blk = plane[y0 : y0 + bh, x0 : x0 + bw]
        c = int(np.count_nonzero(blk))
        k = bh * bw
        score = Fraction(c * (k - c), k * k)
        if best is None or score > best:
            best = score
            best_i = i
    y0, x0, _, _ = grid[best_i]
    return y0 * w + x0


# ---------------------------------------------------------------------------
# Embedding strategies
# ---------------------------------------------------------------------------


@dataclass
class EmbedResult:
    stego_planes: List[np.ndarray]
    bitmaps: List[np.ndarray]          # XOR maps orig ^ stego, uint8, per plane
    total_used: int
    plan: SegmentPlan
    # raster start offset per plane (indexed by plane); fully determines
    # positions for strategies 1 and 3
    plane_starts: Tuple[int, ...]
    base_start_offset: int = 0
    align_across_planes: bool = False
    # for block-adaptive: per-plane permutation of raster positions actually
    # used (None for raster strategies)
    positions: Optional[List[np.ndarray]] = None


def _embed_one_plane(
    plane: np.ndarray, msg_bits: np.ndarray, positions: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Generic gather/modify/scatter with XOR map (src/codec.py:299-311)."""
    h, w = plane.shape
    stego = plane.copy()
    flat = stego.ravel()
    orig = flat[positions]
    mask = np.array(np.iinfo(plane.dtype).max - 1, dtype=plane.dtype)  # ...11110
    newv = (orig & mask) | msg_bits.astype(plane.dtype)
    flat[positions] = newv
    bitmap = np.zeros(h * w, dtype=np.uint8)
    bitmap[positions] = (orig ^ newv).astype(np.uint8)
    return flat.reshape(h, w), bitmap.reshape(h, w)


def embed_multi_plane(
    local_planes: Sequence[np.ndarray],
    message_bits: np.ndarray,
    seed: int = DEFAULT_SHUFFLE_SEED,
) -> EmbedResult:
    """Strategy 1: raster LSB substitution from offset 0 on each plane
    (src/codec.py:276-318)."""
    s = len(local_planes)
    plan = distribute_segments(s, int(message_bits.size), seed)
    return _embed_raster(local_planes, message_bits, plan, start_offset=0, align=True)


def embed_hybrid(
    local_planes: Sequence[np.ndarray],
    message_bits: np.ndarray,
    search_block_size: int = 8,
    align_across_planes: bool = False,
    seed: int = DEFAULT_SHUFFLE_SEED,
) -> EmbedResult:
    """Strategy 3: raster embedding starting at the raster offset of the
    max-variance ``search_block_size`` block of local plane 0, wrapping modulo
    h*w; without alignment each plane continues after the previous plane's
    span (src/codec.py:412-487). Unlike the reference, the chosen offset is
    returned (defect B4 fixed)."""
    s = len(local_planes)
    plan = distribute_segments(s, int(message_bits.size), seed)
    start = best_block_offset(local_planes[0], search_block_size)
    return _embed_raster(
        local_planes, message_bits, plan, start_offset=start, align=align_across_planes
    )


def _embed_raster(
    local_planes: Sequence[np.ndarray],
    message_bits: np.ndarray,
    plan: SegmentPlan,
    start_offset: int,
    align: bool,
) -> EmbedResult:
    s = plan.s
    h, w = local_planes[0].shape
    n = h * w
    stego_planes: List[Optional[np.ndarray]] = [None] * s
    bitmaps: List[Optional[np.ndarray]] = [None] * s
    plane_starts = [0] * s
    total_used = 0
    offset = start_offset
    for k, plane_idx in enumerate(plan.indices):
        seg_off = plan.msg_offsets[k]
        num_bits = min(plan.eff_lengths[k], n)
        seg = message_bits[seg_off : seg_off + num_bits]
        positions = (np.arange(offset, offset + num_bits)) % n
        stego, bitmap = _embed_one_plane(local_planes[plane_idx], seg, positions)
        stego_planes[plane_idx] = stego
        bitmaps[plane_idx] = bitmap
        plane_starts[plane_idx] = offset
        total_used += num_bits
        if not align:
            offset = (offset + num_bits) % n
    return EmbedResult(
        stego_planes=stego_planes,  # type: ignore[arg-type]
        bitmaps=bitmaps,  # type: ignore[arg-type]
        total_used=total_used,
        plan=plan,
        plane_starts=tuple(plane_starts),
        base_start_offset=start_offset,
        align_across_planes=align,
    )


def embed_block_adaptive(
    local_planes: Sequence[np.ndarray],
    message_bits: np.ndarray,
    block_size: int = 8,
    seed: int = DEFAULT_SHUFFLE_SEED,
) -> EmbedResult:
    """Strategy 2, *intended* semantics (defect B2 fixed): per plane, rank
    blocks by variance descending and fill them raster-within-block with that
    plane's segment (src/codec.py:320-410)."""
    s = len(local_planes)
    plan = distribute_segments(s, int(message_bits.size), seed)
    h, w = local_planes[0].shape
    n = h * w
    stego_planes: List[Optional[np.ndarray]] = [None] * s
    bitmaps: List[Optional[np.ndarray]] = [None] * s
    positions_per_plane: List[Optional[np.ndarray]] = [None] * s
    total_used = 0
    for k, plane_idx in enumerate(plan.indices):
        plane = local_planes[plane_idx]
        num_bits = min(plan.eff_lengths[k], n)
        seg = message_bits[plan.msg_offsets[k] : plan.msg_offsets[k] + num_bits]
        positions = block_fill_positions(plane, block_size, num_bits)
        stego, bitmap = _embed_one_plane(plane, seg, positions)
        stego_planes[plane_idx] = stego
        bitmaps[plane_idx] = bitmap
        positions_per_plane[plane_idx] = positions
        total_used += num_bits
    return EmbedResult(
        stego_planes=stego_planes,  # type: ignore[arg-type]
        bitmaps=bitmaps,  # type: ignore[arg-type]
        total_used=total_used,
        plan=plan,
        plane_starts=tuple([0] * s),
        positions=positions_per_plane,  # type: ignore[arg-type]
    )


def block_fill_positions(plane: np.ndarray, block_size: int, num_bits: int) -> np.ndarray:
    """First ``num_bits`` raster positions when blocks are visited in
    variance-ranked order and scanned raster-within-block."""
    h, w = plane.shape
    grid = block_grid(h, w, block_size)
    order = block_variance_ranking(plane, block_size)
    positions: List[np.ndarray] = []
    remaining = num_bits
    for gi in order:
        if remaining <= 0:
            break
        y0, x0, bh, bw = grid[gi]
        yy, xx = np.mgrid[y0 : y0 + bh, x0 : x0 + bw]
        flat = (yy * w + xx).ravel()[:remaining]
        positions.append(flat)
        remaining -= flat.size
    if positions:
        return np.concatenate(positions)
    return np.zeros((0,), dtype=np.int64)


# ---------------------------------------------------------------------------
# Extraction (corrected semantics — defect B1 fixed)
# ---------------------------------------------------------------------------


def extract_local_planes(stego: np.ndarray, s: int) -> List[np.ndarray]:
    """(stego >> i) & 1 for the s LSB planes (src/codec.py:789-793)."""
    return split_planes(stego, s)


def extract_raster(
    stego_planes: Sequence[np.ndarray],
    plan: SegmentPlan,
    plane_starts: Sequence[int],
) -> np.ndarray:
    """Exact inverse of the raster strategies: read LSBs at the deterministic
    embedding positions, assemble segments in message order."""
    h, w = stego_planes[0].shape
    n = h * w
    out = np.zeros(plan.total_bits, dtype=np.uint8)
    for k, plane_idx in enumerate(plan.indices):
        num_bits = min(plan.eff_lengths[k], n)
        positions = np.arange(plane_starts[plane_idx], plane_starts[plane_idx] + num_bits) % n
        bits = stego_planes[plane_idx].ravel()[positions] & 1
        out[plan.msg_offsets[k] : plan.msg_offsets[k] + num_bits] = bits
    return out


def extract_block_adaptive(
    stego_planes: Sequence[np.ndarray],
    bitmaps: Sequence[np.ndarray],
    plan: SegmentPlan,
    block_size: int,
) -> np.ndarray:
    """Inverse of block-adaptive: restore each original plane via the XOR map
    (orig = stego ^ map), recompute the variance ranking from the restored
    plane, then read at the recomputed positions."""
    h, w = stego_planes[0].shape
    n = h * w
    out = np.zeros(plan.total_bits, dtype=np.uint8)
    for k, plane_idx in enumerate(plan.indices):
        num_bits = min(plan.eff_lengths[k], n)
        stego = stego_planes[plane_idx]
        orig = (stego ^ bitmaps[plane_idx].astype(stego.dtype))
        positions = block_fill_positions(orig, block_size, num_bits)
        bits = stego.ravel()[positions] & 1
        out[plan.msg_offsets[k] : plan.msg_offsets[k] + num_bits] = bits
    return out


def restore_original(
    stego: np.ndarray, bitmaps: Sequence[np.ndarray], s: int
) -> np.ndarray:
    """Reversibility: original image = stego with each local plane XORed by
    its location map (the reference stores the maps but never uses them for
    restoration)."""
    out = stego.copy()
    for i in range(s):
        out ^= bitmaps[i].astype(stego.dtype) << np.array(i, dtype=stego.dtype)
    return out


# ---------------------------------------------------------------------------
# Quality metrics  (reference: src/mse.py:74-179)
# ---------------------------------------------------------------------------


def mse(a: np.ndarray, b: np.ndarray, max_a: float, max_b: float) -> Tuple[float, float]:
    """Range-normalized MSE (src/mse.py:100-116). Returns (mse, max_range)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if max_a != max_b:
        max_range = max(max_a, max_b)
        a = (a / max_a) * max_range
        b = (b / max_b) * max_range
    else:
        max_range = max_a
    diff = a - b
    return float(np.mean(diff * diff)), float(max_range)


def psnr(mse_value: float, max_value: float = 255.0) -> float:
    """10*log10(MAX^2/MSE), inf when identical (src/mse.py:118-133)."""
    if mse_value == 0:
        return float("inf")
    return float(10.0 * np.log10((max_value**2) / mse_value))


def ssim_global(a: np.ndarray, b: np.ndarray, max_a: float, max_b: float) -> float:
    """Global-statistics SSIM — single mean/var over the whole image with
    range-adapted constants (src/mse.py:135-179). Not windowed SSIM."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    max_range = max(max_a, max_b)
    if max_a != max_b:
        a = (a / max_a) * max_range
        b = (b / max_b) * max_range
    mu1, mu2 = np.mean(a), np.mean(b)
    var1, var2 = np.var(a), np.var(b)
    cov = np.mean((a - mu1) * (b - mu2))
    c1 = (0.01 * max_range) ** 2
    c2 = (0.03 * max_range) ** 2
    num = (2 * mu1 * mu2 + c1) * (2 * cov + c2)
    den = (mu1**2 + mu2**2 + c1) * (var1 + var2 + c2)
    return float(num / den)
