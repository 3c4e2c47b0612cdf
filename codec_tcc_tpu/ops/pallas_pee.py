"""Pallas TPU kernels for the PEE (prediction-error expansion) hot path.

The XLA formulation (:mod:`codec_tcc_tpu.ops.pee`) measured 43 MPix/s/chip
on v5e for the two-pass embed — 100 ms of every 101 ms pass is the per-pixel
message gather ``jnp.take(msg, msg_base + rank)`` (XLA lowers it to serial
scalar gathers). These kernels replace the gather with structured data
movement that the VPU/MXU actually execute well:

* the image is processed in raster tiles of ``tile_px`` pixels (static
  parameter, default ``TILE_PX = 65536``) in pixel-major
  ``(tile_px/128, 128)`` layout; the grid is sequential on a TensorCore,
  so the running count of eligible pixels carries across tiles in SMEM —
  the "global rank" prefix costs one scalar per tile instead of an
  image-wide scan; larger tiles amortize the measured ~5-6 us per-step
  floor (see ``preferred_tile_px``);
* the rhombus prediction is computed **in-kernel** from a haloed DMA of the
  (zero-padded) image — vertical neighbors are static row shifts of the
  pixel-major layout, horizontal neighbors are lane rotations with a
  one-row carry; border garbage is harmless because only interior
  checkerboard pixels are ever eligible;
* each tile's message window is one contiguous DMA (rank order is raster
  order, so a tile consumes ``msg[base + tile_base : + tile_count]``);
* each 128-pixel row fetches its in-window slice with one-hot matmuls on
  the MXU (exact 0/1 bf16 products; the window row index spans
  [0, tile_px/256), selected by ``tile_px/32768`` one-hot segment pairs)
  plus seven conditional static lane rotations (binary decomposition of
  the per-row offset);
* within a row, bits spread to the eligible lanes with the Hacker's
  Delight 7-4 **expand** network generalized from word bits to lanes,
  executed on 32-row-packed int32 words (8x less VPU work than unpacked;
  validated element-exactly against the naive reference);
* extraction runs the inverse **compress** network and scatters each row's
  packed bits back into the tile window with transposed one-hot matmuls,
  emitting one aligned ``(256, 128)`` bit segment per tile (host
  concatenation of the per-tile segments is plain memcpy work).

Everything is bit-exact with :mod:`codec_tcc_tpu.ops.pee` (asserted in
``tests/test_pallas_pee.py`` and on-chip).

DMA window bounds (keep in sync — an out-of-bounds DMA hard-aborts the TPU
and interpret mode does not check):

* message: the embed kernel copies ``_WBUF_ROWS`` rows from the
  2048-aligned base of ``b*l2 + msg_base[b] + tile_base`` for ACTIVE tiles;
  :func:`prep_messages` sizes each image region as
  ``l2 >= Lpad + n/2 + _WBUF_ROWS*128`` (rounded to 2048), covering the
  largest window (``msg_base <= Lpad``, ``tile_base <= n/2``). In shard
  mode (``shard=`` on the pass wrappers) ``tile_base`` carries the GLOBAL
  rank prefix, so ``n`` in that sizing MUST be the global pixel count —
  call ``prep_messages(msgs, h*w)`` with the full-image geometry, never
  the shard-local count (an undersized region is an out-of-bounds DMA that
  interpret-mode tests cannot catch);
* image halo: both kernels copy rows ``[t*TROWS, t*TROWS + TROWS +
  2*_halo(w))`` of the **padded** image (``pad_images`` adds ``_halo(w)``
  zero rows on each side, sized to the width's vertical-neighbor offset),
  so every window is in bounds by construction.

Mosaic/v5e quirks honored here (discovered on hardware): no select on i1
operands (logical compositions instead), no f32->u8 or i1->u8 casts (hop via
int32), no unsigned-i8 compares (cast first), scalar outputs as full-array
SMEM refs (``(1,1)`` block specs are rejected).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_embed import _ALIGN_E, _ALIGN_R, _LANE, _PAD_R, _rot_window

__all__ = [
    "TILE_PX",
    "supports",
    "routeable",
    "preferred_tile_px",
    "padded_geometry",
    "pad_batch",
    "unpad_batch",
    "prep_messages",
    "pad_images",
    "embed_pass_batch",
    "extract_pass_batch",
    "embed_both_passes_batch",
    "extract_both_passes_batch",
    "collect_bits",
]

TILE_PX = 65536                 # DEFAULT pixels per grid step
_TROWS = TILE_PX // _LANE       # 512 pixel-major rows per tile
_WCAP = TILE_PX // 2            # max eligible pixels per tile (checkerboard)
_WROWS = _WCAP // _LANE         # 256 window rows
_WBUF_ROWS = _WROWS + _PAD_R    # message DMA buffer rows

# Larger tiles amortize the kernels' per-grid-step floor (measured ~5-6 us
# on v5e: a copy-only variant of the grid runs at full-math speed, so the
# bound is step overhead + DMA issue, not compute). tile_px is threaded as a
# static parameter; 65536 reproduces the round-2 kernels bit-for-bit, and
# every derived dimension scales: TROWS = tile_px/128 buffer rows per step,
# WROWS = tile_px/256 message-window rows, fetch/scatter one-hot segments =
# WROWS/128. VMEM per step grows linearly (~270 KB at 65536); the remote
# compiler 500s on multi-MB blocks, so sizes beyond 262144 are not offered.


def _tile_geom(tile_px: int) -> Tuple[int, int, int]:
    """(trows, wrows, wbuf_rows) for a given tile size."""
    if tile_px % (2 * _LANE * _LANE) != 0:
        raise ValueError(f"tile_px {tile_px} must be a multiple of 32768")
    trows = tile_px // _LANE
    wrows = tile_px // (2 * _LANE)
    return trows, wrows, wrows + _PAD_R
def _halo(w: int) -> int:
    """Image halo rows for width ``w``: must cover the rhombus prediction's
    vertical-neighbor offset of ``w // 128`` pixel-major buffer rows, rounded
    up to a multiple of 8 (sublane-aligned DMA rows). 8 for w <= 1024, 16 for
    w = 2048, and so on — no upper width cap."""
    return max(8, ((w // _LANE + 7) // 8) * 8)


# Production tile-size preference, largest first. On-chip certification
# (tools/pee_profile.py, B=256 512^2): 131072 restores bit-exactly and runs
# the full cycle at 30.97 ms vs 33.64 at 65536 (~9% — the per-grid-step
# floor is NOT the cycle's bound, see docs/KERNELS.md round-4 roofline);
# 262144's VMEM block is rejected by the remote compiler (HTTP 500), so it
# stays unoffered. Every size here is proven bit-identical in interpret
# mode (tests/test_pallas_pee.py) and the padded route re-validated on chip
# (tools/check_padded_onchip.py).
_TILE_CHOICES = (131072, 65536)


def preferred_tile_px(h: int, w: int) -> int:
    """Largest certified tile size for an (h, w) image: direct support
    first, then the padded route provided its buffer stays within the 2x
    pad-overhead bound that :func:`routeable` promises."""
    for tp in _TILE_CHOICES:
        if supports(h, w, tp):
            return tp
    for tp in _TILE_CHOICES:
        hb, wb = padded_geometry(h, w, tp)
        if hb * wb <= 2 * h * w:
            return tp
    return TILE_PX


def supports(h: int, w: int, tile_px: int = TILE_PX) -> bool:
    """Whether these kernels handle an (h, w) image DIRECTLY (no padding):
    the width must pack an integral number of pixel-major rows (the
    in-kernel rhombus prediction's vertical-neighbor offset is ``w // 128``
    buffer rows, covered by a width-sized halo) and the flat size must tile
    evenly. Other geometries run via :func:`padded_geometry` + the
    ``buf_w`` kernel parameter (round-2 verdict #4: a 640x480 or 500x500
    image must not fall off a ~40x cliff to the XLA path)."""
    return w % _LANE == 0 and w >= _LANE and (h * w) % tile_px == 0


def routeable(h: int, w: int) -> bool:
    """Whether these kernels are the right route for an (h, w) image: either
    directly supported, or large enough (>= one full tile of real pixels)
    that the pad-and-mask buffer amortizes — AND the pad overhead is
    bounded (an extreme-aspect image like 65536x4 would inflate the padded
    buffer ~32x; the XLA path serves those better than a kernel doing 32x
    the work). Below the size floor the XLA path's dispatch-bound latency
    is comparable anyway."""
    if supports(h, w):
        return True
    if h * w < TILE_PX:
        return False
    hb, wb = padded_geometry(h, w)
    return hb * wb <= 2 * h * w


def padded_geometry(h: int, w: int, tile_px: int = TILE_PX) -> Tuple[int, int]:
    """Smallest buffer geometry ``(hb, wb)`` the kernels accept that embeds
    a logical (h, w) image: ``wb`` is the width rounded up to a full lane
    row, ``hb`` the height rounded up so the buffer tiles evenly. Padding is
    semantically clean: padded rows/columns are outside the logical interior,
    so they are never in-set, never processed, and never predicted-from by a
    processed pixel (an interior pixel's 4-neighbors are all real pixels)."""
    import math

    wb = max(_LANE, -(-w // _LANE) * _LANE)
    trows = tile_px // _LANE
    step = trows // math.gcd(wb // _LANE, trows)
    hb = -(-h // step) * step
    return hb, wb


def pad_batch(images, h: int, w: int, tile_px: int = TILE_PX):
    """(B, h, w) -> (B, hb*wb/128, 128) zero-padded pixel-major buffer."""
    import jax.numpy as _jnp

    hb, wb = padded_geometry(h, w, tile_px)
    x = _jnp.asarray(images)
    x = _jnp.pad(x, ((0, 0), (0, hb - h), (0, wb - w)))
    return x.reshape(x.shape[0], hb * wb // _LANE, _LANE)


def unpad_batch(x3, h: int, w: int, tile_px: int = TILE_PX):
    """Inverse of :func:`pad_batch` for (B, hb*wb/128, 128) buffers."""
    hb, wb = padded_geometry(h, w, tile_px)
    return x3.reshape(x3.shape[0], hb, wb)[:, :h, :w]


# ---------------------------------------------------------------------------
# lane-vector bit networks (all static shifts; each (R, 128) row independent)
# ---------------------------------------------------------------------------


def _shl(x, s: int):
    """Toward higher lanes with zero fill: out[c] = x[c-s]."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= s, pltpu.roll(x, s, 1), 0)


def _shr(x, s: int):
    """Toward lower lanes with zero fill: out[c] = x[c+s]."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < _LANE - s, pltpu.roll(x, _LANE - s, 1), 0)


def _suffix(mk):
    mp = mk ^ _shl(mk, 1)
    s = 2
    while s < _LANE:
        mp = mp ^ _shl(mp, s)
        s *= 2
    return mp


def _pack32(v):
    """(R, 128) 0/1 int32 -> (R/32, 128) int32 bitfields.

    The expand/compress networks below are lane-wise and bitwise, so 32
    independent pixel rows pack into the 32 bits of one int32 word and the
    whole network runs on 8x less data (the networks dominate the kernels'
    VPU time)."""
    rows = v.shape[0]
    r3 = v.reshape(rows // 32, 32, _LANE)
    j = jax.lax.broadcasted_iota(jnp.int32, r3.shape, 1)
    return jnp.sum(r3 << j, axis=1)


def _unpack32(p, rows: int):
    """(rows/32, 128) int32 bitfields -> (rows, 128) 0/1 int32."""
    shape3 = (rows // 32, 32, _LANE)
    j = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    return ((p[:, None, :] >> j) & 1).reshape(rows, _LANE)


def _expand_rows(x, m):
    """Per row: spread x[0..popcount(m)-1] to the set lanes of m, in order.
    Hacker's Delight 7-4 expand with lanes as bits (lane 0 = LSB), executed
    on 32-row-packed words."""
    rows = x.shape[0]
    x = _pack32(x)
    m = _pack32(m)
    m0 = m
    mk = _shl(~m, 1)
    moves = []
    for i in range(7):
        mp = _suffix(mk)
        mv = mp & m
        moves.append(mv)
        m = (m ^ mv) | _shr(mv, 1 << i)
        mk = mk & ~mp
    for i in reversed(range(7)):
        mv = moves[i]
        x = (x & ~mv) | (_shl(x, 1 << i) & mv)
    return _unpack32(x & m0, rows)


def _compress_rows(x, m):
    """Per row: pack the set-lane values of x to the low lanes, in order
    (32-row-packed, see :func:`_expand_rows`)."""
    rows = x.shape[0]
    x = _pack32(x)
    m = _pack32(m)
    x = x & m
    mk = _shl(~m, 1)
    for i in range(7):
        mp = _suffix(mk)
        mv = mp & m
        m = (m ^ mv) | _shr(mv, 1 << i)
        t = x & mv
        x = (x ^ t) | _shr(t, 1 << i)
        mk = mk & ~mp
    return _unpack32(x, rows)


def _mxu_prefixes(counts):
    """(inrow_inclusive, rowtot_bcast, row_exclusive) of a 0/1 ``(R, 128)``
    int32 mask — both prefix directions as ONE MXU matmul each instead of
    ~18 sublane/lane roll+add chains (measured ~2x faster on v5e):

    * in-row inclusive: ``counts @ U`` with U[j,c] = 1 for j <= c; exact in
      bf16 (row sums <= 128 < 256, the bf16 exact-integer range);
    * row exclusive: ``L @ rowtot`` with L[r,r'] = 1 for r' < r; f32 (sums
      <= TILE_PX/2 = 2^15 << 2^24, exact)."""
    rows = counts.shape[0]
    u_r = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    u_c = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
    upper = (u_r <= u_c).astype(jnp.bfloat16)
    inrow = jnp.dot(counts.astype(jnp.bfloat16), upper,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    rowtot = inrow[:, _LANE - 1 :] + jnp.zeros((rows, _LANE), jnp.int32)
    l_r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    l_c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    lower = (l_c < l_r).astype(jnp.float32)
    rowpref = jnp.dot(lower, rowtot.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    return inrow, rowtot, rowpref


def _cond_rotl(x, br):
    """Per-row left rotation by br in [0,128): out[c] = x[(c+br) mod 128]."""
    for k in range(7):
        bit = ((br >> k) & 1) > 0
        x = jnp.where(bit, pltpu.roll(x, _LANE - (1 << k), 1), x)
    return x


def _cond_rotr(x, br):
    """Per-row right rotation by br: out[c] = x[(c-br) mod 128]."""
    for k in range(7):
        bit = ((br >> k) & 1) > 0
        x = jnp.where(bit, pltpu.roll(x, 1 << k, 1), x)
    return x


# ---------------------------------------------------------------------------
# closed-form checkerboard geometry (must match ops.pee exactly)
# ---------------------------------------------------------------------------


def _geometry(pos, h: int, w: int, wb: int, parity: int):
    """(in_set, set_rank) from global flat positions. set_rank is the
    inclusive rank among interior in-set pixels in raster order (meaningful
    on in-set pixels only), matching ops.pee._set_rank. ``pos`` indexes the
    (possibly width-padded) BUFFER with row stride ``wb``; interior tests
    and per-row counts use the LOGICAL ``w``, so padded columns/rows are
    never in-set and ranks match the unpadded oracle exactly."""
    y = pos // wb
    x = pos % wb
    interior = (y >= 1) & (y <= h - 2) & (x >= 1) & (x <= w - 2)
    in_set = (((y + x) & 1) == parity) & interior
    m = jnp.clip(y - 1, 0, h - 2)         # interior rows before y: 1..m
    if parity % 2 == 0:
        n_q1 = (m + 1) // 2               # odd rows have q == 1
    else:
        n_q1 = m // 2                     # even rows have q == 1
    n_q0 = m - n_q1
    row_excl = n_q1 * ((w - 1) // 2) + n_q0 * ((w - 2) // 2)
    q = (parity + y) & 1
    in_row = jnp.where(q == 1, (x + 1) // 2, x // 2)
    return in_set, row_excl + in_row


def _classify(x, pred, in_set, t: int, max_val: int):
    """Elementwise encode-side classification (mirrors ops.pee._classify)."""
    e = x - pred
    expandable = (e >= -t) & (e < t)
    exp_over = (pred + 2 * e + 1 > max_val) | (pred + 2 * e < 0)
    # pure logical composition (Mosaic cannot lower select on i1 operands)
    shift_over = ((e >= t) & (x + t > max_val)) | ((e < t) & (x - t < 0))
    overflow = in_set & ((expandable & exp_over) | (~expandable & shift_over))
    eligible = in_set & expandable & ~overflow
    return e, expandable, overflow, eligible


def _halo_predict(hbuf, w: int, trows: int = _TROWS):
    """Rhombus prediction for the tile's center rows from the haloed image
    buffer ``(trows + 2*_halo(w), 128)`` (uint8/uint16). Returns (x, pred) as
    int32 ``(trows, 128)``. Values at image borders are garbage — harmless,
    since only interior checkerboard pixels are eligible/processed."""
    wr = w // _LANE
    hl = _halo(w)
    buf = hbuf[...].astype(jnp.int32)
    center = buf[hl : hl + trows]
    up = buf[hl - wr : hl - wr + trows]
    down = buf[hl + wr : hl + wr + trows]
    prev = buf[hl - 1 : hl - 1 + trows]
    nxt = buf[hl + 1 : hl + 1 + trows]
    col = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
    left = jnp.where(
        col >= 1, pltpu.roll(center, 1, 1), pltpu.roll(prev, 1, 1)
    )
    right = jnp.where(
        col <= _LANE - 2, pltpu.roll(center, _LANE - 1, 1),
        pltpu.roll(nxt, _LANE - 1, 1),
    )
    return center, (up + down + left + right) // 4


def _fetch_rows(win, onehot_for, rowpref, wrows: int = _WROWS):
    """Per-row window slices: out[r, j] = win_flat[rowpref[r] + j].

    ``win`` is the rotated (row-aligned) window as int32 ``(>=wrows+1, 128)``;
    the row index ``ar = rowpref >> 7`` spans [0, wrows), selected by
    ``wrows/128`` one-hot matmul segments; the residual ``br`` is applied as
    conditional lane rotations."""
    ar = rowpref >> 7
    br = rowpref & (_LANE - 1)
    winf = win.astype(jnp.bfloat16)

    def select(base_row_shift: int, a):
        out = None
        for k in range(wrows // _LANE):
            oh = onehot_for(a - k * _LANE).astype(jnp.bfloat16)
            part = jnp.dot(
                oh,
                winf[base_row_shift + k * _LANE
                     : base_row_shift + (k + 1) * _LANE],
                preferred_element_type=jnp.float32,
            )
            out = part if out is None else out + part
        return out.astype(jnp.int32)

    p_rows = select(0, ar)
    q_rows = select(1, ar)
    c_id = jax.lax.broadcasted_iota(jnp.int32, p_rows.shape, 1)
    p_rot = _cond_rotl(p_rows, br)
    q_rot = _cond_rotl(q_rows, br)
    return jnp.where(c_id < _LANE - br, p_rot, q_rot)


# ---------------------------------------------------------------------------
# embed kernel
# ---------------------------------------------------------------------------


def _start_img_dma(imgp_ref, hbuf, hsem, step, tiles: int, w: int,
                   trows: int = _TROWS):
    """Issue the haloed image-row DMA for flat grid ``step`` into buffer slot
    ``step % 2``. Returns the copy descriptor (same args re-create it for the
    matching ``wait``)."""
    bb = step // tiles
    tt = step % tiles
    slot = step % 2
    row_img = pl.multiple_of(tt * trows, _ALIGN_R)
    return pltpu.make_async_copy(
        imgp_ref.at[bb, pl.ds(row_img, trows + 2 * _halo(w)), :],
        hbuf.at[slot], hsem.at[slot],
    )


def _embed_kernel(
    msg_base_ref, want_ref, pos_base_ref, rank_base_ref,  # prefetch (B,) i32
    imgp_ref, msg_ref,                # padded image (ANY), msg (ANY)
    stego_ref, over_ref, nproc_ref, cnt_ref,  # outs: tile, tile, SMEM (B,T) x2
    hbuf, hsem, wbuf, wsem, carry,    # scratch
    *, h: int, w: int, wb: int, parity: int, t: int, max_val: int, l2: int,
    tiles: int, batch: int, tile_px: int = TILE_PX,
):
    trows, wrows, _ = _tile_geom(tile_px)
    b = pl.program_id(0)
    tt = pl.program_id(1)

    # cross-step double buffering: the image DMA for flat step s+1 is issued
    # before waiting on step s's, so its ~10 us latency (the measured floor
    # of the whole kernel: a copy-only variant of this grid runs at the same
    # speed as the full math) hides behind this step's compute — across
    # image boundaries too (the grid is row-major, b outer).
    step = b * tiles + tt

    @pl.when(step == 0)
    def _():
        _start_img_dma(imgp_ref, hbuf, hsem, 0, tiles, wb, trows).start()

    @pl.when(step + 1 < batch * tiles)
    def _():
        _start_img_dma(imgp_ref, hbuf, hsem, step + 1, tiles, wb, trows).start()

    cp_img = _start_img_dma(imgp_ref, hbuf, hsem, step, tiles, wb, trows)
    hview = hbuf.at[step % 2]

    # rank_base/pos_base generalize the kernel to a SHARD of a larger image
    # (parallel/tile_pee.py): positions offset by the shard's first global
    # raster index, the rank carry seeded with the eligible count of the
    # shards before it. Zeros = the whole-image case.
    @pl.when(tt == 0)
    def _():
        carry[0] = rank_base_ref[b]

    tile_base = carry[0]
    # `want` (unclamped) substitutes the clamped `used = min(want, cap)`:
    # `embeds` is identical either way (grank_incl <= cap always), and for
    # `processed` the capacity-saturated case (want > cap) extends the prefix
    # to the whole in-set — exactly ops.pee's saturation convention, so no
    # separate capacity count pass is needed. The host computes `used` from
    # the per-tile counts this kernel emits (cnt_ref).
    want = want_ref[b]

    # Tiles whose first eligible rank is already past the payload embed
    # nothing and process nothing (grank_incl >= tile_base + 1 > want for any
    # eligible pixel, and `processed` requires grank < want or an eligible
    # grank == want): pure image copy. With realistic payloads most tiles —
    # and whole want==0 passes — take this path; `cnt` undercounting in
    # skipped tiles is safe because the carry is then already >= want, so
    # `used = min(want, cap)` and the `want > cap` saturation test are
    # unaffected (cap' >= want exactly when cap >= want).
    active = tile_base < want

    # contiguous message window for this tile (base is known at tile entry,
    # so the DMA overlaps the prediction/classification math; see module
    # docstring for the buffer bound)
    mb = b * l2 + msg_base_ref[b] + tile_base
    mb_al = (mb // _ALIGN_E) * _ALIGN_E
    delta = mb - mb_al
    row0 = pl.multiple_of(mb_al // _LANE, _ALIGN_R)
    cp_msg = pltpu.make_async_copy(
        msg_ref.at[pl.ds(row0, wrows + _PAD_R), :], wbuf, wsem
    )

    @pl.when(active)
    def _():
        cp_msg.start()

    @pl.when(~active)
    def _():
        cp_img.wait()
        hl = _halo(wb)
        stego_ref[0] = hview[hl : hl + trows]
        over_ref[0] = jnp.zeros((trows, _LANE), jnp.uint8)
        nproc_ref[b, tt] = 0
        cnt_ref[b, tt] = 0

    @pl.when(active)
    def _():
        r_id = jax.lax.broadcasted_iota(jnp.int32, (trows, _LANE), 0)
        c_id = jax.lax.broadcasted_iota(jnp.int32, (trows, _LANE), 1)
        pos = pos_base_ref[b] + tt * tile_px + r_id * _LANE + c_id
        in_set, set_rank = _geometry(pos, h, w, wb, parity)

        cp_img.wait()
        x, pred = _halo_predict(hview, wb, trows)
        e, expandable, overflow, eligible = _classify(
            x, pred, in_set, t, max_val
        )

        elig = eligible.astype(jnp.int32)
        inrow_incl, rowtot, rowpref = _mxu_prefixes(elig)
        tile_cnt = rowpref[trows - 1, 0] + rowtot[trows - 1, 0]
        carry[0] = tile_base + tile_cnt

        grank_incl = tile_base + rowpref + inrow_incl
        embeds = eligible & (grank_incl <= want)
        processed = in_set & (
            (grank_incl < want) | (eligible & (grank_incl == want))
        )

        cp_msg.wait()
        win = _rot_window(wbuf[...].astype(jnp.int32), delta, wrows + 8)

        def onehot_for(a):
            return c_id == a

        rw = _fetch_rows(win, onehot_for, rowpref, wrows)
        bits = _expand_rows(rw, embeds.astype(jnp.int32))

        e_new = jnp.where(
            expandable,
            2 * e + jnp.where(embeds, bits, 0),
            e + jnp.where(e >= t, t, -t),
        )
        modify = processed & ~overflow & (embeds | ~expandable)
        stego_ref[0] = jnp.where(modify, pred + e_new, x).astype(stego_ref.dtype)
        over_ref[0] = (overflow & processed).astype(jnp.int32).astype(jnp.uint8)
        nproc_ref[b, tt] = jnp.max(jnp.where(embeds, set_rank, 0))
        cnt_ref[b, tt] = tile_cnt


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "wb", "parity", "t", "max_val", "l2", "interpret", "tile_px"
    ),
)
def _embed_call(
    imgs_pad, msg2d, msg_base, want, pos_base, rank_base,
    h: int, w: int, wb: int, parity: int, t: int, max_val: int, l2: int,
    interpret: bool = False, tile_px: int = TILE_PX,
):
    trows, _, wbuf_rows = _tile_geom(tile_px)
    b = imgs_pad.shape[0]
    nr = imgs_pad.shape[1] - 2 * _halo(wb)
    tiles = nr // trows
    kernel = functools.partial(
        _embed_kernel, h=h, w=w, wb=wb, parity=parity, t=t, max_val=max_val,
        l2=l2, tiles=tiles, batch=b, tile_px=tile_px,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, trows, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, trows, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            # full-array SMEM refs, written at [b, t] (Mosaic rejects (1,1)
            # blocks: last two block dims must be 8/128-divisible or full)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, trows + 2 * _halo(wb), _LANE), imgs_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((wbuf_rows, _LANE), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nr, _LANE), imgs_pad.dtype),
            jax.ShapeDtypeStruct((b, nr, _LANE), jnp.uint8),
            jax.ShapeDtypeStruct((b, tiles), jnp.int32),
            jax.ShapeDtypeStruct((b, tiles), jnp.int32),
        ),
        interpret=interpret,
    )(msg_base, want, pos_base, rank_base, imgs_pad, msg2d)


# ---------------------------------------------------------------------------
# extract kernel
# ---------------------------------------------------------------------------


def _extract_kernel(
    nproc_ref, pos_base_ref,           # scalar prefetch (B,) int32
    stegop_ref, over_ref,              # padded stego (ANY), overflow block
    restored_ref, seg_ref, cnt_ref,    # outs: tile, (1,1,WROWS,128), SMEM
    hbuf, hsem,
    *, h: int, w: int, wb: int, parity: int, t: int, max_val: int,
    tiles: int, batch: int, tile_px: int = TILE_PX,
):
    trows, wrows, _ = _tile_geom(tile_px)
    b = pl.program_id(0)
    tt = pl.program_id(1)

    # cross-step double buffering (see _embed_kernel)
    step = b * tiles + tt

    @pl.when(step == 0)
    def _():
        _start_img_dma(stegop_ref, hbuf, hsem, 0, tiles, wb, trows).start()

    @pl.when(step + 1 < batch * tiles)
    def _():
        _start_img_dma(stegop_ref, hbuf, hsem, step + 1, tiles, wb, trows).start()

    cp = _start_img_dma(stegop_ref, hbuf, hsem, step, tiles, wb, trows)
    hview = hbuf.at[step % 2]

    # Scalar lower bound on the tile's first inclusive in-set rank: ranks are
    # monotone in raster order and every in-set interior pixel has
    # in_row >= 1, so min rank >= row_excl(first row) + 1. Tiles entirely
    # past `nproc` have no processed pixels — pure stego copy (with
    # realistic payloads most tiles, and whole nproc==0 passes, skip).
    y0 = (pos_base_ref[b] + tt * tile_px) // wb
    m0 = jnp.clip(y0 - 1, 0, h - 2)
    if parity % 2 == 0:
        n_q1 = (m0 + 1) // 2
    else:
        n_q1 = m0 // 2
    row_excl0 = n_q1 * ((w - 1) // 2) + (m0 - n_q1) * ((w - 2) // 2)
    active = row_excl0 < nproc_ref[b]

    @pl.when(~active)
    def _():
        cp.wait()
        hl = _halo(wb)
        restored_ref[0] = hview[hl : hl + trows]
        seg_ref[0, 0] = jnp.zeros((wrows, _LANE), jnp.uint8)
        cnt_ref[b, tt] = 0

    @pl.when(active)
    def _():
        r_id = jax.lax.broadcasted_iota(jnp.int32, (trows, _LANE), 0)
        c_id = jax.lax.broadcasted_iota(jnp.int32, (trows, _LANE), 1)
        pos = pos_base_ref[b] + tt * tile_px + r_id * _LANE + c_id
        in_set, set_rank = _geometry(pos, h, w, wb, parity)
        ov = over_ref[0].astype(jnp.int32) > 0  # no unsigned-i8 compares (v5e)
        cp.wait()
        x2, pred = _halo_predict(hview, wb, trows)

        e2 = x2 - pred
        processed = in_set & (set_rank <= nproc_ref[b]) & ~ov
        expanded = processed & (e2 >= -2 * t) & (e2 < 2 * t)
        bitv = e2 & 1
        e = jnp.where(
            expanded, (e2 - bitv) >> 1, e2 + jnp.where(e2 >= 2 * t, -t, t)
        )
        restored_ref[0] = jnp.where(processed, pred + e, x2).astype(
            restored_ref.dtype
        )

        # pack bits into message (raster-rank) order: per-row compress, then
        # scatter each row's packed run into the tile window via transposed
        # one-hot matmuls (inverse of the embed fetch)
        exp = expanded.astype(jnp.int32)
        packed = _compress_rows(jnp.where(expanded, bitv, 0), exp)
        _, rowcnt, rowpref = _mxu_prefixes(exp)
        packed = jnp.where(c_id < rowcnt, packed, 0)

        ar = rowpref >> 7
        br = rowpref & (_LANE - 1)
        rot = _cond_rotr(packed, br)                # rot[u] = packed[u-br]
        p_part = jnp.where(c_id >= br, rot, 0).astype(jnp.bfloat16)
        q_part = jnp.where(c_id < br, rot, 0).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))

        def scatter_half(a_vals):
            """(128, 128) f32: window rows [base, base+128) of the tile
            segment for one-hot row targets given by a_vals (ar or ar+1,
            shifted)."""
            oh = (c_id == a_vals).astype(jnp.bfloat16)
            oh1 = (c_id == a_vals + 1).astype(jnp.bfloat16)  # Q: row ar+1
            out = jax.lax.dot_general(oh, p_part, dn,
                                      preferred_element_type=jnp.float32)
            return out + jax.lax.dot_general(oh1, q_part, dn,
                                             preferred_element_type=jnp.float32)

        # Mosaic has no f32->u8 cast; hop through int32
        for k in range(wrows // _LANE):
            seg_ref[0, 0, k * _LANE : (k + 1) * _LANE] = (
                scatter_half(ar - k * _LANE).astype(jnp.int32).astype(jnp.uint8)
            )
        cnt_ref[b, tt] = rowpref[trows - 1, 0] + rowcnt[trows - 1, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "wb", "parity", "t", "max_val", "interpret", "tile_px"
    ),
)
def _extract_call(
    stego_pad, over3, nproc, pos_base,
    h: int, w: int, wb: int, parity: int, t: int, max_val: int,
    interpret: bool = False, tile_px: int = TILE_PX,
):
    trows, wrows, _ = _tile_geom(tile_px)
    b = stego_pad.shape[0]
    nr = stego_pad.shape[1] - 2 * _halo(wb)
    tiles = nr // trows
    kernel = functools.partial(
        _extract_kernel, h=h, w=w, wb=wb, parity=parity, t=t, max_val=max_val,
        tiles=tiles, batch=b, tile_px=tile_px,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, trows, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, trows, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wrows, _LANE), lambda bb, tt, *_: (bb, tt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, trows + 2 * _halo(wb), _LANE), stego_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nr, _LANE), stego_pad.dtype),
            jax.ShapeDtypeStruct((b, tiles, wrows, _LANE), jnp.uint8),
            jax.ShapeDtypeStruct((b, tiles), jnp.int32),
        ),
        interpret=interpret,
    )(nproc, pos_base, stego_pad, over3)


# ---------------------------------------------------------------------------
# XLA glue
# ---------------------------------------------------------------------------


def _prep_stride(lpad: int, n_pixels: int, tile_px: int = TILE_PX) -> int:
    """Per-image message stride ``l2`` for the kernels' DMA bound (shared by
    the host and device preps so the layouts cannot drift). A multiple of
    ``_ALIGN_E`` (2048), hence of ``_LANE``. ``tile_px`` MUST match the pass
    calls': a larger tile copies a larger message window per step."""
    _, _, wbuf_rows = _tile_geom(tile_px)
    l2 = lpad + n_pixels // 2 + wbuf_rows * _LANE
    return (l2 + _ALIGN_E - 1) // _ALIGN_E * _ALIGN_E


def prep_messages(
    msgs: np.ndarray, n_pixels: int, tile_px: int = TILE_PX
) -> Tuple[np.ndarray, int]:
    """Host prep: per-image message streams in one flat (rows, 128) buffer
    with per-image stride ``l2`` sized for the kernel's DMA bound."""
    b, lpad = msgs.shape
    l2 = _prep_stride(lpad, n_pixels, tile_px)
    flat = np.zeros(b * l2, dtype=np.uint8)
    for i in range(b):
        flat[i * l2 : i * l2 + lpad] = msgs[i]
    return flat.reshape(-1, _LANE), l2


def prep_messages_device(
    msgs: jax.Array, n_pixels: int, tile_px: int = TILE_PX
) -> Tuple[jax.Array, int]:
    """Device twin of :func:`prep_messages` for device-resident message
    rows: each image's stream zero-padded to the ``l2`` stride and flattened
    to (rows, 128). ``l2`` is ``_ALIGN_E``-aligned, so the reshape is exact.
    Lets callers ship messages over the host link 8x packed (or generate
    them on device) instead of uploading the strided uint8 layout."""
    b, lpad = msgs.shape
    l2 = _prep_stride(lpad, n_pixels, tile_px)
    flat = jnp.pad(msgs.astype(jnp.uint8), ((0, 0), (0, l2 - lpad)))
    return flat.reshape(-1, _LANE), l2


@functools.partial(jax.jit, static_argnames=("halo",))
def pad_images(imgs3: jax.Array, halo: int) -> jax.Array:
    """(B, N/128, 128) -> (B, N/128 + 2*halo, 128) with zero halo rows, so
    every kernel halo DMA stays in bounds (``halo = _halo(width)``)."""
    return jnp.pad(imgs3, ((0, 0), (halo, halo), (0, 0)))


def embed_pass_batch(
    imgs3: jax.Array,        # (B, N/128, 128) uint8/uint16, pixel-major
    msg2d: jax.Array,        # (rows, 128) uint8 from prep_messages
    msg_base: jax.Array,     # (B,) int32 — first message bit of this pass
    want: jax.Array,         # (B,) int32 — bits this pass should embed
    h: int, w: int, parity: int, t: int, max_val: int, l2: int,
    interpret: bool = False,
    *,
    shard: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    buf_w: Optional[int] = None,
    tile_px: int = TILE_PX,
):
    """One PEE pass. Returns (stego3, overflow3 u8, used (B,), nproc (B,)).

    ``tile_px`` sets the pixels per grid step (default 65536 = the round-2
    kernels exactly). Larger tiles amortize the ~5-6 us per-step floor;
    ``prep_messages``/``pad_batch``/``padded_geometry`` must be called with
    the SAME value (the message-window DMA and buffer tiling scale with it).

    ``buf_w`` runs the kernels on a width-PADDED buffer (``pad_batch`` /
    ``padded_geometry``): ``imgs3`` is then the padded pixel-major layout
    with row stride ``buf_w`` while ``h``/``w`` stay the LOGICAL geometry —
    the in-set mask, ranks and saturation all use the logical dims, so the
    result is bit-exact with the unpadded oracle (round-2 verdict #4: no
    more 43 MPix/s XLA cliff for 640x480 / 500x500 images). ``prep_messages``
    may be sized with the logical pixel count (the rank prefix only counts
    logical in-set pixels).

    Single fused pass: the embed kernel itself emits per-tile eligible
    counts, so capacity (and hence ``used = min(want, cap)``) falls out of
    the same image sweep — no separate count pass. Capacity-saturated images
    (want > cap) get ``nproc = h*w`` (whole in-set processed), matching
    ops.pee's saturation convention.

    ``shard=(imgs_pad, pos_base, rank_base)`` runs the kernel on a SHARD of
    a larger image (parallel/tile_pee.py): the caller supplies the padded
    buffer (neighbor halo rows already in place), the shard's first global
    raster index, and the global eligible-rank prefix before the shard.
    ``h``/``w`` are then the GLOBAL geometry, ``want`` the global budget,
    and the returned per-shard values combine across shards at the caller;
    the saturation fixup is skipped (the caller resolves it globally).
    ``imgs3`` is ignored in that mode. CAUTION: the shard-mode ``cnt``
    return is exact only while every tile in the shard stays ACTIVE — the
    inactive-tile fast path zeroes ``cnt`` for tiles whose rank prefix has
    already reached ``want``, so it serves the saturation test
    (``cnt >= want`` exactly when the true capacity is) but MUST NOT be
    used to build a cross-shard rank prefix (tile_pee computes an exact
    XLA count for that instead).
    """
    trows, _, wbuf_rows = _tile_geom(tile_px)
    wb = w if buf_w is None else int(buf_w)
    if shard is None:
        if buf_w is None:
            if not supports(h, w, tile_px):
                raise ValueError(
                    f"pallas PEE kernels do not support {h}x{w} images "
                    f"directly (need w % 128 == 0 and >= 128, n % "
                    f"{tile_px} == 0); pass buf_w=padded_geometry(h, w)[1] "
                    f"with a pad_batch buffer"
                )
        else:
            if wb % _LANE or wb < _LANE or (imgs3.shape[1] * _LANE) % tile_px:
                raise ValueError(
                    f"padded buffer ({imgs3.shape[1]} rows, buf_w={wb}) does "
                    f"not tile; use pad_batch/padded_geometry"
                )
            if wb < w or imgs3.shape[1] * _LANE < h * wb:
                raise ValueError(
                    f"padded buffer smaller than the logical {h}x{w} image"
                )
        imgs_pad = pad_images(imgs3, _halo(wb))
        b = imgs_pad.shape[0]
        pos_base = jnp.zeros(b, jnp.int32)
        rank_base = jnp.zeros(b, jnp.int32)
    else:
        if buf_w is not None:
            raise ValueError("buf_w and shard are mutually exclusive")
        imgs_pad, pos_base, rank_base = shard
        pos_base = pos_base.astype(jnp.int32).reshape(imgs_pad.shape[0])
        rank_base = rank_base.astype(jnp.int32).reshape(imgs_pad.shape[0])
        if (imgs_pad.shape[1] - 2 * _halo(w)) % trows:
            raise ValueError(
                f"shard buffer rows {imgs_pad.shape[1]} do not tile "
                f"(need halo {_halo(w)} rows each side + k*{trows})"
            )
        # necessary (not sufficient — Lpad is unknown here) guard against
        # the classic shard-mode mistake of sizing prep_messages with the
        # LOCAL pixel count; see the module docstring's DMA bound
        if l2 < h * w // 2 + wbuf_rows * _LANE:
            raise ValueError(
                f"l2={l2} too small for global geometry {h}x{w}: size "
                f"prep_messages with the GLOBAL pixel count"
            )
    stego3, over3, nproc_t, cnt_t = _embed_call(
        imgs_pad, msg2d, msg_base.astype(jnp.int32), want.astype(jnp.int32),
        pos_base, rank_base,
        h, w, wb, parity, t, max_val, l2, interpret=interpret,
        tile_px=tile_px,
    )
    cap = jnp.sum(cnt_t, axis=1)
    if shard is not None:
        return stego3, over3, cap, jnp.max(nproc_t, axis=1)
    used = jnp.minimum(want, cap)
    nproc = jnp.where(want > cap, jnp.int32(h * w), jnp.max(nproc_t, axis=1))
    return stego3, over3, used, nproc


def extract_pass_batch(
    stego3: jax.Array,
    over3: jax.Array,        # (B, N/128, 128) uint8
    nproc: jax.Array,        # (B,) int32
    h: int, w: int, parity: int, t: int, max_val: int,
    interpret: bool = False,
    *,
    shard: Optional[Tuple[jax.Array, jax.Array]] = None,
    buf_w: Optional[int] = None,
    tile_px: int = TILE_PX,
):
    """Invert one PEE pass. Returns (restored3, segs (B,T,tile_px/256,128)
    u8, counts (B,T) int32); feed segs/counts to :func:`collect_bits`.
    ``tile_px`` must match the embed pass's (see :func:`embed_pass_batch`).

    ``shard=(stego_pad, pos_base)`` inverts one SHARD of a larger image (see
    :func:`embed_pass_batch`): the caller supplies the padded buffer with
    neighbor halo rows and the shard's first global raster index; ``nproc``
    is the pass's GLOBAL boundary (same value on every shard). Per-shard
    tile counts are exact (inactive tiles truly hold no bits), so cross-
    shard bit assembly is count-prefix placement at the caller. ``stego3``
    is ignored in that mode."""
    if shard is not None:
        if buf_w is not None:
            raise ValueError("buf_w and shard are mutually exclusive")
        stego_pad, pos_base = shard
        pos_base = pos_base.astype(jnp.int32).reshape(stego_pad.shape[0])
        return _extract_call(
            stego_pad, over3, nproc.astype(jnp.int32), pos_base,
            h, w, w, parity, t, max_val, interpret=interpret, tile_px=tile_px,
        )
    wb = w if buf_w is None else int(buf_w)
    if buf_w is None and not supports(h, w, tile_px):
        raise ValueError(
            f"pallas PEE kernels do not support {h}x{w} images directly "
            f"(need w % 128 == 0 and >= 128, n % {tile_px} == 0); pass "
            f"buf_w=padded_geometry(h, w)[1] with pad_batch buffers"
        )
    b = stego3.shape[0]
    return _extract_call(
        pad_images(stego3, _halo(wb)), over3, nproc.astype(jnp.int32),
        jnp.zeros(b, jnp.int32),
        h, w, wb, parity, t, max_val, interpret=interpret, tile_px=tile_px,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "t", "max_val", "l2", "buf_w", "tile_px", "interpret",
        "pack_overflow",
    ),
)
def embed_both_passes_batch(
    imgs3: jax.Array, msg2d: jax.Array, want: jax.Array,
    h: int, w: int, t: int, max_val: int, l2: int,
    *, buf_w: Optional[int] = None, tile_px: int = TILE_PX,
    interpret: bool = False, pack_overflow: bool = False,
):
    """Both PEE embed passes in ONE dispatch. Returns
    ``(stego3, overflow, used0, nproc0, used1, nproc1)``; with
    ``pack_overflow`` the overflow comes back bit-PACKED ``(B,
    ceil(hw/8)) uint8`` in LOGICAL geometry (np.packbits-identical bytes,
    the container blob's zlib input), folded into the same program.

    Pass 1's base/want come straight off pass 0's device scalars, so the
    production encoder pays one jitted call (and zero host syncs) per
    threshold attempt instead of two dispatches with a download between —
    on the dev tunnel each dispatch carries a ~7 ms fixed cost. For images
    whose payload fits in pass 0, pass 1 embeds ``want - used0 = 0`` bits:
    every tile takes the inactive fast path (pure copy), ``used1 = nproc1
    = 0`` and the overflow OR is a no-op — bit-identical to running pass 0
    alone (the sequential early-exit this replaces)."""
    zero = jnp.zeros(imgs3.shape[0], jnp.int32)
    want = want.astype(jnp.int32)
    s0, o0, u0, n0 = embed_pass_batch(
        imgs3, msg2d, zero, want, h, w, 0, t, max_val, l2,
        interpret, buf_w=buf_w, tile_px=tile_px,
    )
    s1, o1, u1, n1 = embed_pass_batch(
        s0, msg2d, u0, want - u0, h, w, 1, t, max_val, l2,
        interpret, buf_w=buf_w, tile_px=tile_px,
    )
    over = o0 | o1
    if pack_overflow:
        from .embed import pack_bits_batch

        b = over.shape[0]
        flat = (
            over.reshape(b, h * w) if buf_w is None
            else unpad_batch(over, h, w, tile_px).reshape(b, h * w)
        )
        over = pack_bits_batch(flat)
    return s1, over, u0, n0, u1, n1


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "t", "max_val", "buf_w", "tile_px", "interpret"),
)
def extract_both_passes_batch(
    stego3: jax.Array, over3: jax.Array,
    nproc0: jax.Array, nproc1: jax.Array,
    h: int, w: int, t: int, max_val: int,
    *, buf_w: Optional[int] = None, tile_px: int = TILE_PX,
    interpret: bool = False,
):
    """Both PEE extract passes (pass 1 inverted first, then pass 0) in ONE
    dispatch. Returns ``(restored3, segs1, counts1, segs0, counts0)`` —
    feed each (segs, counts) pair to :func:`collect_bits`. Both pass
    boundaries are known from the container ext before any device work, so
    nothing forces the host sync the two eager calls used to pay."""
    r1, segs1, cnts1 = extract_pass_batch(
        stego3, over3, nproc1.astype(jnp.int32), h, w, 1, t, max_val,
        interpret, buf_w=buf_w, tile_px=tile_px,
    )
    r0, segs0, cnts0 = extract_pass_batch(
        r1, over3, nproc0.astype(jnp.int32), h, w, 0, t, max_val,
        interpret, buf_w=buf_w, tile_px=tile_px,
    )
    return r0, segs1, cnts1, segs0, cnts0


def collect_bits(segs, counts, out_len: int) -> np.ndarray:
    """Host back half: concatenate each image's per-tile bit segments
    (raster-rank order) into dense bit arrays ``(B, out_len)``."""
    segs = np.asarray(segs)
    counts = np.asarray(counts)
    b, tiles = counts.shape
    out = np.zeros((b, out_len), dtype=np.uint8)
    for i in range(b):
        off = 0
        for tt in range(tiles):
            c = int(counts[i, tt])
            if c <= 0:
                continue
            take = min(c, out_len - off)
            if take <= 0:
                break
            out[i, off : off + take] = segs[i, tt].reshape(-1)[:take]
            off += take
    return out
