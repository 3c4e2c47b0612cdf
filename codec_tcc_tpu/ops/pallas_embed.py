"""Pallas TPU kernels for the embed/extract hot path.

The XLA formulation (ops/embed.py) reaches ~640/825 MPix/s per chip for
embed/extract on v5e — bounded by ``jnp.roll``'s concat+dynamic-slice lowering
materializing full-size temporaries per plane. These kernels fuse the whole
multi-plane update into one pass over the image with explicit DMA of exactly
the message window each tile needs (SURVEY §7 stage 7: "Pallas fusion of
predict/modify/pack into single kernels").

Key idea: for a contiguous tile of raster positions ``[n0, n0+T)`` and plane
parameters ``(start, len, off)``, the message index of position ``n`` is
``off + ((n - start) mod N)`` — contiguous except for a single wrap at
``n == start``. Shifting the message by ``+N`` on host makes both branches
plain contiguous slices (``idx_hi = idx_lo + N``), so each plane needs two
DMAs and an elementwise select — no gather/scatter/roll in XLA terms.

Mosaic's layout rules shape the implementation (discovered empirically on
v5e: no 1-D vectors, no 1D<->2D reshapes, dynamic loads must be 1024-aligned,
dynamic rotate is 32-bit 2-D only, HBM row slices must be sublane-aligned):

* all arrays are ``(..., rows, 128)`` with compute on ``(TR, 128)`` tiles;
* DMA windows are aligned down to 2048 elements (16 rows), and the residual
  shift ``delta`` is applied in-register as a dynamic **lane rotate** plus a
  dynamic **row rotate** with a static +1-row carry select;
* messages / doubled stego live as flat-then-reshaped ``(rows, 128)`` HBM
  buffers indexed by aligned row windows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "embed_batch",
    "padded_flat",
    "split_windows",
    "embed_batch_padded",
    "extract_aligned_batch",
    "extract_aligned_batch_padded",
    "shift_messages_2d",
    "double_flat_2d",
    "pad_stego_flat",
    "unpad_stego",
    "pick_tile",
    "preferred_tile",
    "preplace_bits",
    "preplace_bits_device",
    "preplace_packed",
    "preplace_packed_device",
    "embed_batch_packed",
    "extract_packed_batch",
    "unpack_rows_device",
    "assemble_raster_packed",
    "embed_batch_preplaced",
    "extract_raster_batch",
    "assemble_raster",
]

_LANE = 128
_ALIGN_E = 2048                 # DMA window alignment in elements (16 rows)
_ALIGN_R = _ALIGN_E // _LANE    # ... in rows
_PAD_R = 24                     # scratch row padding (> _ALIGN_R, 8-multiple)


def pick_tile(n: int) -> int:
    """Tile size in elements: power-of-two divisor of N (>= 2048)."""
    for t in (65536, 32768, 16384, 8192, 4096, 2048):
        if n % t == 0:
            return t
    return 0  # caller falls back to the XLA path


def preferred_tile(n: int) -> int:
    """The tuned tile for these kernels: 131072 elements when it divides N,
    else the largest pick_tile divisor. The single place the constant lives
    — all backends call this. Round-3 sweeps (tools/sweep_tiles.py + the
    pe-content 2048 experiment) measured the 65536..262144 tiles within
    ±3% of each other at every size/plane-count combination, with 131072
    best under the headline's 4-plane plans; throughput is governed by
    total dispatch size (batch x pixels), not the tile."""
    return 131072 if n % 131072 == 0 else pick_tile(n)


def shift_messages_2d(msgs: np.ndarray, n_pixels: int) -> Tuple[np.ndarray, int]:
    """Host prep: per-image messages shifted by +N inside rows of one flat
    buffer, reshaped to (rows, 128). Returns ``(buffer, row-stride L2)``."""
    b, lpad = msgs.shape
    l2 = n_pixels + lpad + n_pixels
    l2 = (l2 + _ALIGN_E - 1) // _ALIGN_E * _ALIGN_E
    flat = np.zeros(b * l2 + 2 * _ALIGN_E + _PAD_R * _LANE, dtype=np.uint8)
    for i in range(b):
        flat[i * l2 + n_pixels : i * l2 + n_pixels + lpad] = msgs[i]
    rows = flat.size // _LANE
    return flat[: rows * _LANE].reshape(rows, _LANE), l2


def _rot_window(buf2, delta, tr: int):
    """Return ``out[r, c] = flatten(buf2)[delta + r*128 + c]`` for r < tr.

    ``buf2`` is an int32 (TPADR, 128) tile; ``delta`` a traced scalar in
    [0, _ALIGN_E). Implemented as dynamic lane rotate + dynamic row rotate
    with a static +1-row carry select.
    """
    rows = buf2.shape[0]
    lane = delta % _LANE
    row = delta // _LANE
    # pltpu.roll requires non-negative (forward) shifts: out[i] = in[i-shift],
    # so a backward shift by d is a forward shift by size - d
    rot = pltpu.roll(buf2, (_LANE - lane) % _LANE, 1)   # lanes
    rot = pltpu.roll(rot, (rows - row) % rows, 0)       # rows
    carry = pltpu.roll(rot, rows - 1, 0)                # +1 row where lanes wrapped
    col = jax.lax.broadcasted_iota(jnp.int32, buf2.shape, 1)
    out = jnp.where(col < _LANE - lane, rot, carry)
    return out[:tr]


# ---------------------------------------------------------------------------
# embed
# ---------------------------------------------------------------------------


def _embed_core(
    starts_ref, lens_ref, offs_ref, img_ref, msg_ref,
    buf_lo, buf_hi, sem_lo, sem_hi,
    *, np_planes: int, tsize: int, n: int, l2: int,
):
    """Shared embed tile computation; returns the int32 (TR, 128) result."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    tr = tsize // _LANE
    tpadr = tr + _PAD_R
    n0 = t * tsize
    r_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 1)
    pos = n0 + r_id * _LANE + c_id

    acc = img_ref[0].astype(jnp.int32)
    for p in range(np_planes):
        start = starts_ref[b, p]
        ln = lens_ref[b, p]
        off = offs_ref[b, p]
        base = b * l2 + n + off + n0 - start   # flat elements, >= 0
        base_al = (base // _ALIGN_E) * _ALIGN_E
        delta = base - base_al
        base2 = base + n
        base2_al = (base2 // _ALIGN_E) * _ALIGN_E
        delta2 = base2 - base2_al

        @pl.when(ln > 0)
        def _(base_al=base_al, base2_al=base2_al):
            row_lo = pl.multiple_of(base_al // _LANE, _ALIGN_R)
            row_hi = pl.multiple_of(base2_al // _LANE, _ALIGN_R)
            lo = pltpu.make_async_copy(
                msg_ref.at[pl.ds(row_lo, tpadr), :], buf_lo, sem_lo
            )
            hi = pltpu.make_async_copy(
                msg_ref.at[pl.ds(row_hi, tpadr), :], buf_hi, sem_hi
            )
            lo.start()
            hi.start()
            lo.wait()
            hi.wait()

        bits_lo = _rot_window(buf_lo[...].astype(jnp.int32), delta, tr)
        bits_hi = _rot_window(buf_hi[...].astype(jnp.int32), delta2, tr)
        rel = pos - start
        rel = jnp.where(rel < 0, rel + n, rel)
        window = rel < ln
        bit = jnp.where(pos >= start, bits_lo, bits_hi)
        keep = jnp.int32(~(1 << p))
        acc = jnp.where(window, (acc & keep) | (bit << p), acc)
    return acc


def _embed_kernel(
    starts_ref, lens_ref, offs_ref,          # scalar prefetch (B, NP) int32
    img_ref, msg_ref,                        # (1, TR, 128) block / (MR, 128) ANY
    out_ref,                                 # (1, TR, 128) block
    buf_lo, buf_hi, sem_lo, sem_hi,          # scratch (TPADR, 128) u8 + sems
    *, np_planes: int, tsize: int, n: int, l2: int,
):
    acc = _embed_core(
        starts_ref, lens_ref, offs_ref, img_ref, msg_ref,
        buf_lo, buf_hi, sem_lo, sem_hi,
        np_planes=np_planes, tsize=tsize, n=n, l2=l2,
    )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("np_planes", "tile", "l2"))
def embed_batch_padded(
    images3: jax.Array,      # (B, N//128, 128) uint8/uint16
    msg2d: jax.Array,        # (MR, 128) uint8 from shift_messages_2d
    starts: jax.Array,
    lens: jax.Array,
    offs: jax.Array,
    np_planes: int,
    tile: int,
    l2: int,
) -> jax.Array:
    """Like :func:`embed_batch` but the output is the **padded flat layout**
    the extract kernel consumes directly — ``(rows, 128)`` holding
    ``[N zero-pad][img0][img1]...[DMA slack]`` — so an embed->extract cycle
    needs no relayout pass at all (a 32 MB `concatenate` between the kernels
    costs ~8 ms, more than either kernel)."""
    b, nr, lane = images3.shape
    n = nr * lane
    tr = tile // _LANE
    # tail slack: +N because the extract kernel's no-wrap (branch A) DMA
    # window for the LAST image extends up to N elements past its region
    # when start > 0 (those lanes are select-masked, but the DMA itself
    # must stay in bounds — an OOB DMA hard-aborts the TPU)
    out_rows = (n + b * n + n + 2 * _ALIGN_E + _PAD_R * _LANE) // _LANE
    blocks_per_img = nr // tr
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, blocks_per_img),
        in_specs=[
            pl.BlockSpec(
                (1, tr, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # write each tile at its padded-flat position: N + b*N + t*tile
        out_specs=pl.BlockSpec(
            (tr, _LANE),
            lambda bb, tt, *_, _bpi=blocks_per_img: (_bpi + bb * _bpi + tt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + _PAD_R, _LANE), jnp.uint8),
            pltpu.VMEM((tr + _PAD_R, _LANE), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel2 = functools.partial(
        _embed_kernel_padded_out, np_planes=np_planes, tsize=tile, n=n, l2=l2
    )
    return pl.pallas_call(
        kernel2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, _LANE), images3.dtype),
    )(starts, lens, offs, images3, msg2d)


def _embed_kernel_padded_out(
    starts_ref, lens_ref, offs_ref,
    img_ref, msg_ref,
    out_ref,                                 # (TR, 128) block at padded pos
    buf_lo, buf_hi, sem_lo, sem_hi,
    *, np_planes: int, tsize: int, n: int, l2: int,
):
    acc = _embed_core(
        starts_ref, lens_ref, offs_ref, img_ref, msg_ref,
        buf_lo, buf_hi, sem_lo, sem_hi,
        np_planes=np_planes, tsize=tsize, n=n, l2=l2,
    )
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("np_planes", "tile", "l2"))
def embed_batch(
    images3: jax.Array,      # (B, N//128, 128) uint8/uint16
    msg2d: jax.Array,        # (MR, 128) uint8 from shift_messages_2d
    starts: jax.Array,       # (B, NP) int32
    lens: jax.Array,         # (B, NP) int32  (0 for planes >= s)
    offs: jax.Array,         # (B, NP) int32
    np_planes: int,
    tile: int,
    l2: int,
) -> jax.Array:
    b, nr, lane = images3.shape
    n = nr * lane
    tr = tile // _LANE
    kernel = functools.partial(
        _embed_kernel, np_planes=np_planes, tsize=tile, n=n, l2=l2
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, nr // tr),
        in_specs=[
            pl.BlockSpec(
                (1, tr, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, _LANE), lambda bb, tt, *_: (bb, tt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + _PAD_R, _LANE), jnp.uint8),
            pltpu.VMEM((tr + _PAD_R, _LANE), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(images3.shape, images3.dtype),
    )(starts, lens, offs, images3, msg2d)


# ---------------------------------------------------------------------------
# extract (aligned rows)
# ---------------------------------------------------------------------------


def _extract_kernel(
    starts_ref, lens_ref,                    # scalar prefetch (B, NP) int32
    stego_ref,                               # (SR, 128) doubled stego in ANY
    out_ref,                                 # (1, NP, TR, 128) block
    buf, sem,                                # scratch (TPADR, 128) stego dtype
    *, np_planes: int, tsize: int, n2: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    tr = tsize // _LANE
    tpadr = tr + _PAD_R
    m0 = t * tsize
    r_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 1)
    m = m0 + r_id * _LANE + c_id

    for p in range(np_planes):
        start = starts_ref[b, p]
        ln = lens_ref[b, p]
        base = b * n2 + start + m0
        base_al = (base // _ALIGN_E) * _ALIGN_E
        delta = base - base_al

        @pl.when(ln > 0)
        def _(base_al=base_al):
            row0 = pl.multiple_of(base_al // _LANE, _ALIGN_R)
            cp = pltpu.make_async_copy(
                stego_ref.at[pl.ds(row0, tpadr), :], buf, sem
            )
            cp.start()
            cp.wait()

        vals = _rot_window(buf[...].astype(jnp.int32), delta, tr)
        plane_bits = ((vals >> p) & 1).astype(jnp.uint8)
        out_ref[0, p] = jnp.where(m < ln, plane_bits, 0)


@functools.partial(jax.jit, static_argnames=("np_planes", "n", "tile"))
def extract_aligned_batch(
    stego2d: jax.Array,      # (SR, 128) doubled stego from double_flat_2d
    starts: jax.Array,       # (B, NP) int32
    lens: jax.Array,         # (B, NP) int32
    np_planes: int,
    n: int,
    tile: int,
) -> jax.Array:
    b = starts.shape[0]
    tr = tile // _LANE
    nr = n // _LANE
    kernel = functools.partial(
        _extract_kernel, np_planes=np_planes, tsize=tile, n2=2 * n
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nr // tr),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, np_planes, tr, _LANE),
            lambda bb, tt, *_: (bb, 0, tt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + _PAD_R, _LANE), stego2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_planes, nr, _LANE), jnp.uint8),
    )(starts, lens, stego2d)
    return out4.reshape(b, np_planes, n)


def _extract_padded_kernel(
    starts_ref, lens_ref,                    # scalar prefetch (B, NP) int32
    stego_ref,                               # (rows, 128) padded flat in ANY
    out_ref,                                 # (1, NP, TR, 128) block
    buf_a, buf_b, sem_a, sem_b,              # scratch (TPADR, 128) stego dtype
    *, np_planes: int, tsize: int, n: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    tr = tsize // _LANE
    tpadr = tr + _PAD_R
    m0 = t * tsize
    r_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 1)
    m = m0 + r_id * _LANE + c_id

    for p in range(np_planes):
        start = starts_ref[b, p]
        ln = lens_ref[b, p]
        # branch A: source pixel start+m (no wrap); branch B: start+m-N.
        # padded layout puts image b at flat offset N + b*N, so
        # baseB = baseA - N >= 0 always.
        base_a = n + b * n + start + m0
        base_b = base_a - n
        a_al = (base_a // _ALIGN_E) * _ALIGN_E
        b_al = (base_b // _ALIGN_E) * _ALIGN_E
        da = base_a - a_al
        db = base_b - b_al

        @pl.when(ln > 0)
        def _(a_al=a_al, b_al=b_al):
            ra = pl.multiple_of(a_al // _LANE, _ALIGN_R)
            rb = pl.multiple_of(b_al // _LANE, _ALIGN_R)
            ca = pltpu.make_async_copy(
                stego_ref.at[pl.ds(ra, tpadr), :], buf_a, sem_a
            )
            cb = pltpu.make_async_copy(
                stego_ref.at[pl.ds(rb, tpadr), :], buf_b, sem_b
            )
            ca.start()
            cb.start()
            ca.wait()
            cb.wait()

        vals_a = _rot_window(buf_a[...].astype(jnp.int32), da, tr)
        vals_b = _rot_window(buf_b[...].astype(jnp.int32), db, tr)
        vals = jnp.where(m < n - start, vals_a, vals_b)
        plane_bits = ((vals >> p) & 1).astype(jnp.uint8)
        out_ref[0, p] = jnp.where(m < ln, plane_bits, 0)


@functools.partial(jax.jit, static_argnames=("np_planes", "n", "tile"))
def extract_aligned_batch_padded(
    stego_padded: jax.Array,  # (rows, 128) padded flat (embed_batch_padded out)
    starts: jax.Array,
    lens: jax.Array,
    np_planes: int,
    n: int,
    tile: int,
) -> jax.Array:
    """Extraction over the padded flat layout — pairs with
    :func:`embed_batch_padded` for a relayout-free embed->extract cycle."""
    b = starts.shape[0]
    tr = tile // _LANE
    nr = n // _LANE
    kernel = functools.partial(
        _extract_padded_kernel, np_planes=np_planes, tsize=tile, n=n
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nr // tr),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, np_planes, tr, _LANE),
            lambda bb, tt, *_: (bb, 0, tt, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + _PAD_R, _LANE), stego_padded.dtype),
            pltpu.VMEM((tr + _PAD_R, _LANE), stego_padded.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_planes, nr, _LANE), jnp.uint8),
    )(starts, lens, stego_padded)
    return out4.reshape(b, np_planes, n)


# ---------------------------------------------------------------------------
# preplaced plane-bits kernels
#
# The windowed kernels above move each plane's message segment to its raster
# position at run time (two DMA windows + three rotations per plane per
# tile). Placing the bits at their raster positions ON HOST instead — two
# memcpys per plane — leaves the device kernels pure streaming arithmetic:
# no manual DMA, no rotations, no wrap logic. Costs NP x N bytes of HBM per
# image; buys ~2x cycle throughput.
# ---------------------------------------------------------------------------


def preplace_bits(
    msgs: np.ndarray,        # (B, Lpad) uint8 padded messages
    starts: np.ndarray,      # (B, NP) int32
    lens: np.ndarray,
    offs: np.ndarray,
    n_pixels: int,
) -> np.ndarray:
    """Host prep: per-plane bit buffers in raster position —
    ``out[b, p, (start + j) % n] = msgs[b, off + j]``. Returns
    ``(B, NP, n/128, 128) uint8``."""
    b, np_planes = starts.shape
    out = np.zeros((b, np_planes, n_pixels), dtype=np.uint8)
    for i in range(b):
        for p in range(np_planes):
            ln = int(lens[i, p])
            if ln <= 0:
                continue
            st = int(starts[i, p]) % n_pixels
            off = int(offs[i, p])
            seg = msgs[i, off : off + ln]
            k = min(ln, n_pixels - st)
            out[i, p, st : st + k] = seg[:k]
            if ln > k:
                out[i, p, : ln - k] = seg[k:]
    return out.reshape(b, np_planes, n_pixels // _LANE, _LANE)


@functools.partial(
    jax.jit, static_argnames=("n_pixels", "np_planes", "n_buf")
)
def preplace_bits_device(
    msgs: jax.Array,         # (B, Lpad) uint8 padded messages (device)
    starts: jax.Array,       # (B, NP) int32
    lens: jax.Array,
    offs: jax.Array,
    n_pixels: int,
    np_planes: int,
    n_buf: int = 0,
) -> jax.Array:
    """Device-side :func:`preplace_bits`: builds the ``(B, NP, n/128, 128)``
    raster-positioned bit tensor from the COMPACT message rows, so only
    ``B x Lpad`` bytes ever cross the host link (the host variant ships the
    full ``B x NP x N`` tensor — ~16x more for typical payloads, which
    dominates end-to-end time on slow host<->device links).

    ``n_buf`` (>= n_pixels, a multiple of 2048) zero-pads each plane row to
    a kernel-tileable flat length while the wrap stays LOGICAL (mod
    n_pixels) — the odd-geometry route (round-2 verdict #4); the padded
    tail holds no bits."""
    b, lpad = msgs.shape
    n_buf = n_buf or n_pixels
    msgs_p = jnp.pad(msgs, ((0, 0), (0, n_pixels)))  # slice bound: off <= Lpad

    def one(msg, st, ln, of):
        pos = jnp.arange(n_pixels, dtype=jnp.int32)

        def plane(p):
            seg = jax.lax.dynamic_slice(msg, (of[p],), (n_pixels,))
            row = jnp.roll(seg, st[p])              # seg[j] -> raster st+j
            rel = jnp.mod(pos - st[p], n_pixels)
            row = jnp.where(rel < ln[p], row, 0)
            if n_buf != n_pixels:
                row = jnp.pad(row, (0, n_buf - n_pixels))
            return row

        return jnp.stack([plane(p) for p in range(np_planes)])

    out = jax.vmap(one)(msgs_p, starts, lens, offs)
    return out.reshape(b, np_planes, n_buf // _LANE, _LANE)


def preplace_packed(
    msgs: np.ndarray,        # (B, Lpad) uint8 padded messages
    starts: np.ndarray,      # (B, NP) int32
    lens: np.ndarray,
    offs: np.ndarray,
    n_pixels: int,
    dtype=np.uint16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host prep for the PACKED preplaced tier: fold all NP plane windows
    into two per-pixel words — ``clear[pos] = OR of (1<<p)`` over planes
    whose window covers ``pos``, ``value[pos] = OR of (bit<<p)`` — so the
    device embed collapses to ``(img & ~clear) | value``: two vector ops
    per pixel instead of ~8 x NP window-mask ops. Same bytes of HBM as the
    per-plane bit tensor at NP=16, LESS below it; the per-plane loop that
    the preplaced kernels still ran per tile moves entirely into this prep.
    Returns ``(clear, value)`` as ``(B, n/128, 128)`` arrays of ``dtype``.
    """
    b, np_planes = starts.shape
    clear = np.zeros((b, n_pixels), dtype=dtype)
    value = np.zeros((b, n_pixels), dtype=dtype)
    for i in range(b):
        for p in range(np_planes):
            ln = int(lens[i, p])
            if ln <= 0:
                continue
            st = int(starts[i, p]) % n_pixels
            off = int(offs[i, p])
            seg = msgs[i, off : off + ln].astype(dtype)
            k = min(ln, n_pixels - st)
            clear[i, st : st + k] |= dtype(1 << p)
            value[i, st : st + k] |= seg[:k] << p
            if ln > k:
                clear[i, : ln - k] |= dtype(1 << p)
                value[i, : ln - k] |= seg[k:] << p
    shape3 = (b, n_pixels // _LANE, _LANE)
    return clear.reshape(shape3), value.reshape(shape3)


@functools.partial(
    jax.jit, static_argnames=("n_pixels", "np_planes", "n_buf", "dtype")
)
def preplace_packed_device(
    msgs: jax.Array,         # (B, Lpad) uint8 padded messages (device)
    starts: jax.Array,       # (B, NP) int32
    lens: jax.Array,
    offs: jax.Array,
    n_pixels: int,
    np_planes: int,
    n_buf: int = 0,
    dtype=jnp.uint16,
) -> Tuple[jax.Array, jax.Array]:
    """Device-side :func:`preplace_packed`: builds the ``(B, n/128, 128)``
    clear/value word pair from the COMPACT message rows so only ``B x Lpad``
    bytes cross the host link (serving-path requirement — the host variant
    ships 2 words/pixel). Same window math as :func:`preplace_bits_device`,
    folded across planes: ``clear |= covered << p``, ``value |= bit << p``.

    ``n_buf`` (>= n_pixels, a multiple of 128) zero-pads to a reshapeable
    flat length; the padded tail gets ``clear = value = 0``, so the fused
    embed leaves padded pixels untouched — the odd-N route needs no
    split-window bookkeeping here because the wrap stays logical (mod
    n_pixels) inside this prep."""
    b, lpad = msgs.shape
    n_buf = n_buf or n_pixels
    msgs_p = jnp.pad(msgs, ((0, 0), (0, n_pixels)))  # slice bound: off <= Lpad

    def one(msg, st, ln, of):
        pos = jnp.arange(n_pixels, dtype=jnp.int32)
        clear = jnp.zeros(n_pixels, dtype=dtype)
        value = jnp.zeros(n_pixels, dtype=dtype)
        for p in range(np_planes):
            seg = jax.lax.dynamic_slice(msg, (of[p],), (n_pixels,))
            row = jnp.roll(seg, st[p])              # seg[j] -> raster st+j
            rel = jnp.mod(pos - st[p], n_pixels)
            covered = rel < ln[p]
            clear = clear | (covered.astype(dtype) << p)
            value = value | (jnp.where(covered, row, 0).astype(dtype) << p)
        if n_buf != n_pixels:
            clear = jnp.pad(clear, (0, n_buf - n_pixels))
            value = jnp.pad(value, (0, n_buf - n_pixels))
        return clear, value

    clear, value = jax.vmap(one)(msgs_p, starts, lens, offs)
    shape3 = (b, n_buf // _LANE, _LANE)
    return clear.reshape(shape3), value.reshape(shape3)


@jax.jit
def embed_batch_packed(
    images3: jax.Array,      # (B, N/128, 128) uint8/uint16
    clear3: jax.Array,       # (B, N/128, 128) same dtype (preplace_packed)
    value3: jax.Array,
) -> jax.Array:
    """Packed-preplaced embed: one fused elementwise pass. With the window
    structure folded into ``clear``/``value`` by :func:`preplace_packed`,
    there is nothing left for a hand-written kernel to do — XLA fuses this
    to a single HBM-bound sweep (no Mosaic needed), which is exactly the
    speed-of-light shape for the op."""
    return (images3 & ~clear3) | value3


@functools.partial(jax.jit, static_argnames=("np_planes",))
def extract_packed_batch(stego3: jax.Array, np_planes: int) -> jax.Array:
    """Packed extraction: the embedded planes ARE the low ``np_planes`` bits
    of each stego word, so the device side is one masked narrowing copy —
    ``(B, N/128, 128)`` with plane p at bit p, narrowed to uint8 when
    ``np_planes <= 8`` (uint16 keeps planes 8+ for deep cut points — a
    blind uint8 narrowing silently dropped them). Window selection happens
    in :func:`assemble_raster_packed` (host) or :func:`unpack_rows_device`,
    which only ever read window ranges, so no in-kernel masking is needed.
    Writes 1-2 bytes/pixel instead of the per-plane tier's NP bytes."""
    mask = jnp.array((1 << np_planes) - 1, dtype=stego3.dtype)
    out_dtype = jnp.uint8 if np_planes <= 8 else jnp.uint16
    return (stego3 & mask).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("np_planes",))
def unpack_rows_device(packed: jax.Array, np_planes: int) -> jax.Array:
    """(B, N) packed low-bit bytes (:func:`extract_packed_batch` output,
    flattened) -> (B, NP, N) raster-order plane rows — the input shape of
    :func:`codec_tcc_tpu.ops.embed.assemble_raster_device`, so the packed
    serving path reuses the existing device assembly and only the payload
    crosses the host link."""
    sh = jnp.arange(np_planes, dtype=packed.dtype).reshape(1, np_planes, 1)
    return ((packed[:, None, :] >> sh) & 1).astype(jnp.uint8)


def assemble_raster_packed(packed, starts, lens, offs, out_len: int) -> np.ndarray:
    """Host back half for :func:`extract_packed_batch`: per plane, shift the
    packed byte window down and mask — touches only window bytes.
    ``packed`` is (N,)/(nr,128) or (B, ...) with per-image parameters."""
    packed = np.asarray(packed)
    if packed.ndim == 3 or (packed.ndim == 2 and packed.shape[-1] == _LANE):
        packed = packed.reshape(*packed.shape[:-2], -1)
    if packed.ndim == 2:
        return np.stack([
            assemble_raster_packed(packed[i], starts[i], lens[i], offs[i],
                                   out_len)
            for i in range(packed.shape[0])
        ])
    n = packed.shape[0]
    out = np.zeros(out_len, dtype=np.uint8)
    for p in range(len(starts)):
        ln = int(lens[p])
        off = int(offs[p])
        if ln <= 0 or off >= out_len:
            continue
        ln = min(ln, out_len - off)
        st = int(starts[p]) % n
        k = min(ln, n - st)
        out[off : off + k] = (packed[st : st + k] >> p) & 1
        if ln > k:
            out[off + k : off + ln] = (packed[: ln - k] >> p) & 1
    return out


def direct_ok(n: int) -> bool:
    """Whether the preplaced kernels take flat size ``n`` directly (no
    padding): some power-of-two tile divides it and rows pack evenly."""
    return pick_tile(n) > 0 and n % 128 == 0


def preplaced_ok(n: int) -> bool:
    """Single source of the preplaced-route eligibility rule (used by the
    batch planner, the single-image pipeline, and the bench): direct
    layout, or big enough (>= 65536 px) that the padded odd-N route
    amortizes."""
    return direct_ok(n) or n >= 65536


def padded_flat(n: int) -> Tuple[int, int]:
    """Odd-N route: smallest kernel-tileable flat length >= n and its tile.
    The padded tail holds no embedding windows (split_windows never emits
    one past n), so masks and bits in [n, n_buf) are identically zero."""
    n_buf = (n + _ALIGN_E - 1) // _ALIGN_E * _ALIGN_E
    return n_buf, preferred_tile(n_buf)


def split_windows(starts, lens, n: int):
    """(B, NP) plane windows with LOGICAL wrap (mod n) -> (B, 2*NP)
    non-wrapping windows for the ``wpp=2`` kernels: window ``2p`` is the
    head ``[st, min(st+len, n))``, window ``2p+1`` the wrapped tail
    ``[0, len - head)``. Non-wrapping windows inside a padded buffer are
    safe without kernel wrap logic: the kernel's ``rel + n_buf`` fixup can
    never produce a false positive because every window ends by ``n`` and
    ``n <= n_buf`` (rel + n_buf < len would need rel < len - n_buf <= 0
    while rel >= -start > -n_buf)."""
    starts = np.asarray(starts)
    lens = np.asarray(lens)
    b, np_planes = starts.shape
    out_s = np.zeros((b, 2 * np_planes), dtype=np.int32)
    out_l = np.zeros((b, 2 * np_planes), dtype=np.int32)
    for i in range(b):
        for p in range(np_planes):
            ln = int(lens[i, p])
            if ln <= 0:
                continue
            st = int(starts[i, p]) % n
            k = min(ln, n - st)
            out_s[i, 2 * p], out_l[i, 2 * p] = st, k
            if ln > k:
                out_l[i, 2 * p + 1] = ln - k
    return out_s, out_l


def _embed_preplaced_kernel(
    starts_ref, lens_ref,                    # scalar prefetch (B, WPP*NP) i32
    img_ref, bits_ref,                       # (1,TR,128), (1,NP,TR,128)
    out_ref,                                 # (1,TR,128)
    *, np_planes: int, tsize: int, n: int, wpp: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    tr = tsize // _LANE
    r_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 1)
    pos = t * tsize + r_id * _LANE + c_id
    acc = img_ref[0].astype(jnp.int32)
    for p in range(np_planes):
        # wpp windows per plane (wpp=2 carries split logical-wrap windows
        # on the odd-N padded route; windows of one plane never overlap)
        active = None
        for k in range(wpp):
            wi = p * wpp + k
            rel = pos - starts_ref[b, wi]
            rel = jnp.where(rel < 0, rel + n, rel)
            a = rel < lens_ref[b, wi]
            active = a if active is None else (active | a)
        bv = bits_ref[0, p].astype(jnp.int32)
        acc = jnp.where(active, (acc & jnp.int32(~(1 << p))) | (bv << p), acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("np_planes", "tile", "wpp"))
def embed_batch_preplaced(
    images3: jax.Array,      # (B, N/128, 128) uint8/uint16
    bits4: jax.Array,        # (B, NP, N/128, 128) uint8 from preplace_bits
    starts: jax.Array,       # (B, WPP*NP) int32 (wpp=2: split_windows form)
    lens: jax.Array,
    np_planes: int,
    tile: int,
    wpp: int = 1,
) -> jax.Array:
    b, nr, _ = images3.shape
    n = nr * _LANE
    tr = tile // _LANE
    # the kernel applies a single +n wrap to (pos - start); keep the host
    # contract (preplace_bits uses % n) and the device mask in agreement.
    # (wpp=2 windows never wrap — see split_windows — so the fixup is inert)
    starts = jnp.mod(starts, n)
    kernel = functools.partial(
        _embed_preplaced_kernel, np_planes=np_planes, tsize=tile, n=n, wpp=wpp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nr // tr),
        in_specs=[
            pl.BlockSpec((1, tr, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_planes, tr, _LANE),
                         lambda bb, tt, *_: (bb, 0, tt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(images3.shape, images3.dtype),
    )(starts, lens, images3, bits4)


def _extract_raster_kernel(
    starts_ref, lens_ref,
    stego_ref,                               # (1,TR,128)
    out_ref,                                 # (1,NP,TR,128)
    *, np_planes: int, tsize: int, n: int, wpp: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    tr = tsize // _LANE
    r_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (tr, _LANE), 1)
    pos = t * tsize + r_id * _LANE + c_id
    x = stego_ref[0].astype(jnp.int32)
    for p in range(np_planes):
        active = None
        for k in range(wpp):
            wi = p * wpp + k
            rel = pos - starts_ref[b, wi]
            rel = jnp.where(rel < 0, rel + n, rel)
            a = rel < lens_ref[b, wi]
            active = a if active is None else (active | a)
        bits = ((x >> p) & 1).astype(jnp.uint8)
        out_ref[0, p] = jnp.where(active, bits, 0)


@functools.partial(jax.jit, static_argnames=("np_planes", "tile", "wpp"))
def extract_raster_batch(
    stego3: jax.Array,       # (B, N/128, 128)
    starts: jax.Array,       # (B, WPP*NP) int32 (wpp=2: split_windows form)
    lens: jax.Array,
    np_planes: int,
    tile: int,
    wpp: int = 1,
) -> jax.Array:
    """Plane bits in RASTER order masked to their windows —
    ``(B, NP, N) uint8``; pair with :func:`assemble_raster` (two host
    memcpys per plane)."""
    b, nr, _ = stego3.shape
    n = nr * _LANE
    tr = tile // _LANE
    starts = jnp.mod(starts, n)   # see embed_batch_preplaced
    kernel = functools.partial(
        _extract_raster_kernel, np_planes=np_planes, tsize=tile, n=n, wpp=wpp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nr // tr),
        in_specs=[
            pl.BlockSpec((1, tr, _LANE), lambda bb, tt, *_: (bb, tt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_planes, tr, _LANE),
                               lambda bb, tt, *_: (bb, 0, tt, 0),
                               memory_space=pltpu.VMEM),
    )
    out4 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_planes, nr, _LANE), jnp.uint8),
    )(starts, lens, stego3)
    return out4.reshape(b, np_planes, n)


def assemble_raster(rows, starts, lens, offs, out_len: int) -> np.ndarray:
    """Host back half for :func:`extract_raster_batch`: copy each plane's
    raster window (with at most one wrap split) to its message offset.
    ``rows`` is (NP, N) or (B, NP, N) with per-image parameter arrays."""
    rows = np.asarray(rows)
    if rows.ndim == 3:
        return np.stack([
            assemble_raster(rows[i], starts[i], lens[i], offs[i], out_len)
            for i in range(rows.shape[0])
        ])
    n = rows.shape[1]
    out = np.zeros(out_len, dtype=np.uint8)
    for p in range(rows.shape[0]):
        ln = int(lens[p])
        off = int(offs[p])
        if ln <= 0 or off >= out_len:
            continue
        ln = min(ln, out_len - off)
        st = int(starts[p]) % n
        k = min(ln, n - st)
        out[off : off + k] = rows[p, st : st + k]
        if ln > k:
            out[off + k : off + ln] = rows[p, : ln - k]
    return out


def unpad_stego(stego_padded: jax.Array, b: int, n: int) -> jax.Array:
    """(rows, 128) padded flat -> (B, N) images."""
    flat = stego_padded.reshape(-1)
    return jax.lax.dynamic_slice(flat, (n,), (b * n,)).reshape(b, n)


def pad_stego_flat(stego: np.ndarray) -> np.ndarray:
    """Host: (B, ...) images -> padded flat (rows, 128) for the padded
    extract kernel (decode path, where stego comes from the codec)."""
    b = stego.shape[0]
    flat = np.ascontiguousarray(stego).reshape(b, -1)
    n = flat.shape[1]
    # +N tail slack: see embed_batch_padded (branch-A DMA windows of the
    # last image overrun by up to N for nonzero starts)
    total = n + b * n + n + 2 * _ALIGN_E + _PAD_R * _LANE
    total = (total + _LANE - 1) // _LANE * _LANE
    out = np.zeros(total, dtype=stego.dtype)
    out[n : n + b * n] = flat.reshape(-1)
    return out.reshape(-1, _LANE)


@jax.jit
def double_flat_2d(stego: jax.Array) -> jax.Array:
    """(B, ...) -> (rows, 128): each image concatenated with itself in one
    flat buffer (rotated windows become contiguous slices), plus DMA slack."""
    b = stego.shape[0]
    flat = stego.reshape(b, -1)
    doubled = jnp.concatenate([flat, flat], axis=1).reshape(-1)
    slack = jnp.zeros((2 * _ALIGN_E + _PAD_R * _LANE,), dtype=stego.dtype)
    full = jnp.concatenate([doubled, slack])
    rows = full.shape[0] // _LANE
    return full[: rows * _LANE].reshape(rows, _LANE)
