"""Prediction-Error Expansion (PEE) reversible embedding — TPU kernels.

The reference's README and the driver north star describe the project as PEE
("PEE neighbor predictor, prediction-error histogram, expansion-and-shift"),
but the committed reference code contains no predictor at all (SURVEY.md §0
"naming caution": the only primitives are LSB substitutions at
``src/codec.py:306,394,472``). This module provides the *true* PEE embedder
the north star names, built TPU-first:

* **Rhombus predictor on a checkerboard lattice** (the classic two-pass
  scheme): pixels split into cross ((y+x) even) and dot ((y+x) odd) sets; a
  pixel is predicted as the floor-average of its 4-neighbors, all of which
  belong to the other set, so each pass's predictions depend only on values
  the decoder can reconstruct. Pass 0 embeds into cross using original dots;
  pass 1 embeds into dot using the *modified* cross; decoding inverts pass 1
  first, then pass 0.
* **Expansion and shift**: prediction error ``e = x - pred``; expandable
  errors (``-T <= e < T``) become ``e' = 2e + bit``; larger errors shift
  outward by ``T``. Fully invertible integer math.
* **Overflow location map**: pixels whose expansion/shift would leave
  ``[0, max_val]`` stay untouched and are flagged in a bitmask (packed +
  zlib'd into the container's map slot).
* **Processed-prefix boundary**: each pass embeds into in-set pixels in
  raster order and stops after ``n_proc`` of them (stored in the container),
  so distortion scales with the payload instead of the full capacity, and the
  decoder can reproduce the exact embedded set with no ambiguity.

Everything is dense int32 arithmetic — pad/shift neighbor sums, cumulative
sums for ranks, one gather of the message per pass — no scatter on the
embed path and a single drop-mode scatter to collect extracted bits.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "rhombus_predict",
    "capacity",
    "capacity_histogram",
    "capacities_by_threshold",
    "embed_pass",
    "extract_pass",
    "embed_both_passes",
    "extract_both_passes",
    "parity_mask",
]

_BIG = jnp.int32(2**31 - 1)


def _raster_cumsum(mask: jax.Array) -> jax.Array:
    """Inclusive prefix sum of a boolean (H, W) mask in raster order.

    A flat ``cumsum(mask.reshape(-1))`` is one 2^18-element scan — measured at
    <50 MPix/s on TPU v5e (it serializes the whole image). The two-level
    form (row totals -> tiny H-length scan -> vectorized within-row scan over
    H parallel lanes) keeps the long scan axis at W and runs ~40x faster.
    """
    m = mask.astype(jnp.int32)
    row = jnp.cumsum(m, axis=1)
    row_tot = row[:, -1]
    row_pref = jnp.cumsum(row_tot) - row_tot  # exclusive over rows
    return row + row_pref[:, None]


def _set_rank(h: int, w: int, parity: int) -> jax.Array:
    """Closed-form inclusive rank among the interior checkerboard set in
    raster order (values are only meaningful on in-set pixels). The set is
    deterministic, so no data scan is needed at all."""
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # per-row in-set count for interior rows r in [1, h-2]:
    # x in [1, w-2] with (x & 1) == q, q = (parity + r) & 1
    q = (parity + y) & 1
    interior_row = (y >= 1) & (y <= h - 2)
    c = jnp.where(q == 1, (w - 1) // 2, (w - 2) // 2)
    c = jnp.where(interior_row, c, 0)
    row_excl = jnp.cumsum(c[:, 0]) - c[:, 0]  # rows before y (tiny H scan)
    in_row = jnp.where(q == 1, (x + 1) // 2, x // 2)  # in-set x' <= x in row y
    return row_excl[:, None] + in_row


def rhombus_predict(img: jax.Array) -> jax.Array:
    """Floor-average of the 4-neighborhood with edge replication. int32."""
    x = img.astype(jnp.int32)
    p = jnp.pad(x, 1, mode="edge")
    s = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    return s // 4


def parity_mask(h: int, w: int, parity: int) -> jax.Array:
    """Checkerboard set membership, **interior pixels only**.

    Border pixels are excluded from processing: with edge-replicated padding a
    border pixel is its own 4-neighbor, so its prediction would depend on its
    own (modified) value and decoding could not invert it. The 1-pixel frame
    always passes through unchanged.
    """
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (y > 0) & (y < h - 1) & (x > 0) & (x < w - 1)
    return (((y + x) & 1) == parity) & interior


def _classify(img: jax.Array, parity: int, t: int, max_val: int):
    """Shared encode-side classification for one pass.

    Returns (pred, e, in_set, expandable, overflow) — all over the full image.
    """
    h, w = img.shape
    x = img.astype(jnp.int32)
    pred = rhombus_predict(img)
    e = x - pred
    in_set = parity_mask(h, w, parity)
    expandable = (e >= -t) & (e < t)
    # worst-case expansion target must stay in range for either bit value
    exp_over = (pred + 2 * e + 1 > max_val) | (pred + 2 * e < 0)
    shift_over = jnp.where(e >= t, x + t > max_val, x - t < 0)
    overflow = in_set & jnp.where(expandable, exp_over, shift_over)
    return pred, e, in_set, expandable, overflow


@partial(jax.jit, static_argnames=("parity", "t", "max_val"))
def capacity(img: jax.Array, parity: int, t: int, max_val: int) -> jax.Array:
    """Number of embeddable bits this pass offers (eligible pixels)."""
    _, _, in_set, expandable, overflow = _classify(img, parity, t, max_val)
    return jnp.sum((in_set & expandable & ~overflow).astype(jnp.int32))


@partial(jax.jit, static_argnames=("parity", "t_max"))
def error_histogram(img: jax.Array, parity: int, t_max: int = 64) -> jax.Array:
    """Prediction-error histogram for one pass: counts of ``e = x - pred``
    clamped to ``[-t_max, t_max]``, returned as ``(2*t_max + 1,) int32``
    (bin 0 <=> e = -t_max).

    This is the "prediction-error histogram" stage the north star names: the
    cumulative sum of the central ``2T`` bins IS the expandable capacity at
    threshold ``T``, so threshold selection and capacity analysis read
    straight off this histogram. Computed scatter-free (sort + searchsorted,
    like the value histogram)."""
    h, w = img.shape
    pred = rhombus_predict(img)
    e = img.astype(jnp.int32) - pred
    in_set = parity_mask(h, w, parity)
    e = jnp.clip(e, -t_max, t_max) + t_max
    # park out-of-set pixels in an overflow bin that gets dropped
    nbins = 2 * t_max + 1
    e = jnp.where(in_set, e, nbins)
    flat = jnp.sort(e.reshape(-1))
    edges = jnp.arange(nbins + 2, dtype=jnp.int32)
    idx = jnp.searchsorted(flat, edges, side="left")
    return jnp.diff(idx)[:nbins].astype(jnp.int32)


@partial(jax.jit, static_argnames=("parity", "t_max", "max_val"))
def capacity_histogram(
    img: jax.Array, parity: int, t_max: int, max_val: int
) -> jax.Array:
    """Capacity-exact prediction-error histogram for one pass.

    Counts ``e = x - pred`` over in-set pixels whose EXPANSION stays in range
    (``exp_over`` depends only on ``pred`` and ``e``, not on T, so it can be
    excluded up front), binned over ``[-t_max, t_max)`` — bin ``k`` holds
    ``e = k - t_max``. The central cumulative sums therefore give the EXACT
    eligible capacity at every threshold simultaneously::

        cap(T) = hist[t_max-T : t_max+T].sum()
               == capacity(img, parity, T, max_val)   for all T <= t_max

    This is the histogram-driven threshold selection the north star names:
    one device pass replaces the embed-probe-per-candidate-T loop (round-2
    verdict #3). Scatter-free (sort + searchsorted, like the value
    histogram — scatter-adds take minutes to compile on this TPU)."""
    h, w = img.shape
    x = img.astype(jnp.int32)
    pred = rhombus_predict(img)
    e = x - pred
    in_set = parity_mask(h, w, parity)
    exp_over = (pred + 2 * e + 1 > max_val) | (pred + 2 * e < 0)
    ok = in_set & ~exp_over & (e >= -t_max) & (e < t_max)
    nbins = 2 * t_max
    idx = jnp.where(ok, e + t_max, nbins)  # park excluded pixels past the end
    flat = jnp.sort(idx.reshape(-1))
    edges = jnp.arange(nbins + 2, dtype=jnp.int32)
    pos = jnp.searchsorted(flat, edges, side="left")
    return jnp.diff(pos)[:nbins].astype(jnp.int32)


def capacities_by_threshold(hist) -> "np.ndarray":
    """Host helper: ``(..., 2*t_max)`` capacity histogram(s) ->
    ``(..., t_max)`` exact capacities, ``caps[..., T-1] = cap(T)``."""
    import numpy as np

    hist = np.asarray(hist)
    t_max = hist.shape[-1] // 2
    c = np.cumsum(hist, axis=-1)
    ts = np.arange(1, t_max + 1)
    hi = c[..., t_max + ts - 1]
    lo_idx = t_max - ts - 1
    lo = np.where(lo_idx >= 0, c[..., np.maximum(lo_idx, 0)], 0)
    return hi - lo


@partial(jax.jit, static_argnames=("parity", "t", "max_val"))
def embed_pass(
    img: jax.Array,          # (H, W) uint8/uint16
    msg_bits: jax.Array,     # (Lpad,) uint8, zero-padded
    msg_base: jax.Array,     # scalar int32: this pass's first message bit
    want_bits: jax.Array,    # scalar int32: bits this pass should embed
    parity: int,
    t: int,
    max_val: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One PEE pass. Returns (stego, overflow_map_bool, used_bits, n_proc)."""
    h, w = img.shape
    pred, e, in_set, expandable, overflow = _classify(img, parity, t, max_val)
    eligible = in_set & expandable & ~overflow

    set_rank = _set_rank(h, w, parity)
    elig_cum = _raster_cumsum(eligible)
    total_cap = elig_cum[-1, -1]
    used = jnp.minimum(want_bits, total_cap)

    # smallest processed prefix (in set_rank counting) covering `used` bits.
    # Capacity-saturated passes (want > capacity) process the WHOLE in-set:
    # the natural raster-scan encoder only stops when the message is done, so
    # if it is not done at image end, every scanned pixel was shifted. This
    # convention lets the Pallas kernels embed without a separate capacity
    # count pass (the per-tile running rank cannot see future tiles' counts).
    hit = eligible & (elig_cum == used)
    n_proc = jnp.where(
        want_bits > total_cap,
        jnp.int32(h * w),
        jnp.where(used > 0, jnp.min(jnp.where(hit, set_rank, _BIG)), 0),
    )
    processed = in_set & (set_rank <= n_proc)

    embeds = eligible & processed
    rank = elig_cum - 1  # 0-based among eligible
    lpad = msg_bits.shape[0]
    midx = jnp.clip(msg_base + rank, 0, lpad - 1)
    b = jnp.take(msg_bits, midx, mode="clip").astype(jnp.int32)

    e_new = jnp.where(
        expandable, 2 * e + jnp.where(embeds, b, 0), e + jnp.where(e >= t, t, -t)
    )
    x_new = pred + e_new
    # un-embedded expandable pixels inside the processed prefix cannot occur
    # (the prefix ends exactly at the used-th eligible pixel), but guard
    # anyway: only expand where a bit was embedded, otherwise only shift
    modify = processed & ~overflow & (embeds | ~expandable)
    out = jnp.where(modify, x_new, img.astype(jnp.int32)).astype(img.dtype)
    return out, overflow & processed, used, n_proc


@partial(jax.jit, static_argnames=("t", "max_val"))
def embed_both_passes(
    img: jax.Array,
    msg_bits: jax.Array,
    total_bits: jax.Array,   # scalar int32
    t: int,
    max_val: int,
):
    """Both PEE passes in ONE dispatch (single image). Returns
    ``(stego, overflow_map, used0, nproc0, used1, nproc1)``.

    Pass 1's base/want chain on pass 0's device scalars, so an encode
    threshold attempt costs one jitted call instead of two with a
    ``used0`` download between them. A pass at ``want = 0`` is a provable
    no-op (``n_proc = 0`` empties ``processed``, the stego copy and the
    ``overflow & processed`` map are exact identities), so this is
    bit-identical to running pass 0 alone when the payload fits there."""
    s0, o0, u0, n0 = embed_pass(
        img, msg_bits, jnp.int32(0), total_bits, 0, t, max_val
    )
    s1, o1, u1, n1 = embed_pass(s0, msg_bits, u0, total_bits - u0, 1, t, max_val)
    return s1, o0 | o1, u0, n0, u1, n1


@partial(jax.jit, static_argnames=("t", "max_val", "out_len"))
def extract_both_passes(
    stego: jax.Array,
    overflow_map: jax.Array,
    nproc0: jax.Array,       # scalar int32 (pass-0 boundary)
    nproc1: jax.Array,       # scalar int32 (pass-1 boundary; 0 = no pass 1)
    t: int,
    max_val: int,
    out_len: int,
):
    """Invert both PEE passes (pass 1 first) in ONE dispatch. Returns
    ``(restored, bits1, n_bits1, bits0, n_bits0)``. A pass at
    ``n_proc = 0`` is an exact identity (``processed`` is empty), so
    single-pass containers (``nproc1 == 0``) restore bit-identically."""
    r1, b1, m1 = extract_pass(stego, overflow_map, nproc1, 1, t, max_val, out_len)
    r0, b0, m0 = extract_pass(r1, overflow_map, nproc0, 0, t, max_val, out_len)
    return r0, b1, m1, b0, m0


@partial(jax.jit, static_argnames=("parity", "t", "max_val", "out_len"))
def extract_pass(
    stego: jax.Array,
    overflow_map: jax.Array,  # (H, W) bool
    n_proc: jax.Array,        # scalar int32
    parity: int,
    t: int,
    max_val: int,
    out_len: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Invert one PEE pass. Returns (restored, bits[out_len], n_bits)."""
    h, w = stego.shape
    x2 = stego.astype(jnp.int32)
    pred = rhombus_predict(stego)
    e2 = x2 - pred
    in_set = parity_mask(h, w, parity)
    set_rank = _set_rank(h, w, parity)
    processed = in_set & (set_rank <= n_proc) & ~overflow_map

    expanded = processed & (e2 >= -2 * t) & (e2 < 2 * t)
    b = e2 & 1  # floor-mod 2 for int32
    e = jnp.where(
        expanded,
        (e2 - b) >> 1,
        e2 + jnp.where(e2 >= 2 * t, -t, t),
    )
    restored = jnp.where(processed, pred + e, x2).astype(stego.dtype)

    rank = _raster_cumsum(expanded) - 1
    n_bits = jnp.sum(expanded.astype(jnp.int32))
    # scatter-free bit collection: pack (rank, bit) as 2*rank + bit for
    # expanded pixels, park the rest at +inf, and sort once — ascending order
    # IS message order. A rank scatter (`.at[idx].max`) is the op family that
    # takes minutes to compile on this TPU (see CLAUDE.md).
    comp = jnp.where(expanded, 2 * rank + b, _BIG).reshape(-1)
    if out_len > comp.size:  # static shapes; keep the slice below in bounds
        comp = jnp.concatenate(
            [comp, jnp.full((out_len - comp.size,), _BIG, jnp.int32)]
        )
    comp = jax.lax.sort(comp)[:out_len]
    valid = jnp.arange(out_len, dtype=jnp.int32) < n_bits
    bits = jnp.where(valid, (comp & 1).astype(jnp.uint8), 0)
    return restored, bits, n_bits
