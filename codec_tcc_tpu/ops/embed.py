"""Fused multi-plane LSB embed / extract kernels.

The reference embeds one plane at a time with Python-level gather/scatter
(``/root/reference/src/codec.py:299-311`` for the raster strategy,
``:465-476`` for the hybrid wraparound variant) at ~10 MPix/s on CPU
(SURVEY §6). The TPU formulation is *dense and scatter-free* (SURVEY §7
"scatter at TPU speed"): for every plane the embedded segment is materialized
as a rotation of a masked window of the (padded) message bit array —

    payload_p = roll(mask(dynamic_slice(msg, off_p, N)), start_p)

— and the write becomes ``where(window, (img & ~2^p) | payload_p << p, img)``.
All ``nbits`` planes fuse into one elementwise XLA program over the packed
image; there is no per-plane Python, no gather, no scatter, and the runtime
cut point ``s`` is a predicate, not a shape. XOR location maps
(``orig ^ stego``, src/codec.py:309-311) fall out of the same pass for free.

Extraction is the exact mirror: rotate each plane back and mask its window on
device (:func:`extract_aligned`), then place each segment at its message
offset with host memcpys (:func:`assemble_message`) — fully-device placement
would need ``dynamic_update_slice`` accumulation, which lowers to an XLA
scatter under ``vmap`` (minutes-long TPU compiles; see CLAUDE.md).

The per-plane parameter triples ``(start, length, msg_offset)`` come from the
host-side :class:`~codec_tcc_tpu.ops.segments.PlanePlan`, which resolves all
segment-distribution edge cases (quadratic weights, shuffle, the reference's
negative-size accidents) into normalized windows before anything touches the
device.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

__all__ = [
    "embed",
    "extract_aligned",
    "assemble_message",
    "assemble_message_device",
    "assemble_raster_device",
    "xor_maps",
    "xor_maps_packed_batch",
    "restore_original",
    "pad_message",
]


def _dtype_keep_mask(dtype, plane: int):
    """All-ones except bit ``plane`` (dtype-safe ~(1 << p))."""
    full = jnp.iinfo(dtype).max
    return jnp.array(full ^ (1 << plane), dtype=dtype)


@partial(jax.jit, static_argnames=("nbits",))
def embed(
    image: jax.Array,        # (H, W) uint8/uint16
    msg_bits: jax.Array,     # (Lpad,) uint8 0/1, Lpad >= max(msg_off) + H*W
    plane_start: jax.Array,  # (nbits,) int32 raster start offset per plane
    seg_len: jax.Array,      # (nbits,) int32 embedded bits per plane (<= H*W)
    msg_off: jax.Array,      # (nbits,) int32 message bit offset per plane
    s: jax.Array,            # scalar int32 runtime cut point
    nbits: int,
) -> jax.Array:
    """Return the stego image; bit-exact with the oracle's raster strategies."""
    h, w = image.shape
    n = h * w
    flat = image.reshape(n)
    iota = jnp.arange(n, dtype=jnp.int32)
    acc = flat
    for p in range(nbits):
        seg = jax.lax.dynamic_slice(msg_bits, (msg_off[p],), (n,))
        in_seg = iota < seg_len[p]
        bits = jnp.roll(jnp.where(in_seg, seg, 0), plane_start[p])
        # window membership computed arithmetically instead of rolling the
        # mask: position n is written iff (n - start) mod N < len
        rel = iota - plane_start[p]
        rel = jnp.where(rel < 0, rel + n, rel)
        active = (rel < seg_len[p]) & (p < s)
        newv = (acc & _dtype_keep_mask(image.dtype, p)) | (
            bits.astype(image.dtype) << p
        )
        acc = jnp.where(active, newv, acc)
    return acc.reshape(h, w)


@partial(jax.jit, static_argnames=("nbits",))
def extract_aligned(
    stego: jax.Array,
    plane_start: jax.Array,
    seg_len: jax.Array,
    s: jax.Array,
    nbits: int,
) -> jax.Array:
    """Scatter-free extraction front half: ``(nbits, H*W) uint8`` where row p
    holds plane p's bits rotated back to message order and masked to its
    window. Message assembly (placing row p at its message offset) is pure
    host memcpy work — see :func:`assemble_message`.

    This formulation exists because the placement alternative
    (``dynamic_update_slice`` accumulation) lowers to an XLA scatter under
    ``vmap``, which — like the histogram scatter-add — can take minutes to
    compile on TPU (measured this session). Rolls and mod-compares vmap
    cleanly.
    """
    h, w = stego.shape
    n = h * w
    flat = stego.reshape(n)
    iota = jnp.arange(n, dtype=jnp.int32)
    rows = []
    for p in range(nbits):
        plane = ((flat >> p) & 1).astype(jnp.uint8)
        aligned = jnp.roll(plane, -plane_start[p])
        valid = (iota < seg_len[p]) & (p < s)
        rows.append(jnp.where(valid, aligned, 0))
    return jnp.stack(rows)


def assemble_message(
    aligned: "jax.Array | object",
    msg_off,
    seg_len,
    out_len: int,
):
    """Host back half of extraction: copy each plane's window to its message
    offset. ``aligned`` is the (nbits, N) result of :func:`extract_aligned`
    (or (B, nbits, N) for batches, with per-image offset/length arrays)."""
    import numpy as np

    aligned = np.asarray(aligned)
    if aligned.ndim == 3:
        return np.stack(
            [
                assemble_message(aligned[i], msg_off[i], seg_len[i], out_len)
                for i in range(aligned.shape[0])
            ]
        )
    out = np.zeros(out_len, dtype=np.uint8)
    for p in range(aligned.shape[0]):
        ln = int(seg_len[p])
        off = int(msg_off[p])
        if ln <= 0 or off >= out_len:
            continue
        ln = min(ln, out_len - off)
        out[off : off + ln] = aligned[p, :ln]
    return out


@partial(jax.jit, static_argnames=("out_len",))
def assemble_message_device(
    aligned: jax.Array,      # (P, N) or (B, P, N) uint8 aligned plane rows
    msg_off: jax.Array,      # (P,) / (B, P) int32
    seg_len: jax.Array,
    out_len: int,
) -> jax.Array:
    """Device counterpart of :func:`assemble_message`: returns only the
    ``out_len`` assembled message bits, so extraction's host pull shrinks
    from ``P x N`` bytes to the payload itself (the difference dominates
    end-to-end decode on slow host<->device links).

    Later planes OVERWRITE earlier ones where windows overlap — the host
    loop's sequential-copy semantics (real plans are disjoint, but the
    reference's negative-size distribution accident can alias two planes
    onto one offset; the bit-exact contract covers that case too). Any roll
    wrap-around lands outside the window mask, matching the host clamp."""
    if aligned.ndim == 3:
        return jax.vmap(
            lambda a, o, l: assemble_message_device(a, o, l, out_len)
        )(aligned, msg_off, seg_len)
    p_planes, n = aligned.shape
    pos = jnp.arange(out_len, dtype=jnp.int32)
    acc = jnp.zeros(out_len, dtype=jnp.uint8)
    for p in range(p_planes):
        row = aligned[p]
        seg = row[:out_len] if out_len <= n else jnp.pad(row, (0, out_len - n))
        placed = jnp.roll(seg, msg_off[p])
        rel = pos - msg_off[p]
        acc = jnp.where((rel >= 0) & (rel < seg_len[p]), placed, acc)
    return acc


@partial(jax.jit, static_argnames=("out_len",))
def assemble_raster_device(
    rows: jax.Array,         # (P, N) or (B, P, N) uint8 raster-order rows
    starts: jax.Array,
    msg_off: jax.Array,
    seg_len: jax.Array,
    out_len: int,
) -> jax.Array:
    """Device assembly for RASTER-order plane rows (the preplaced extract
    kernel's output): un-rotate each row to message-relative order, then
    place as in :func:`assemble_message_device`."""
    if rows.ndim == 3:
        return jax.vmap(
            lambda r, s, o, l: assemble_raster_device(r, s, o, l, out_len)
        )(rows, starts, msg_off, seg_len)
    p_planes, n = rows.shape
    rel_rows = jnp.stack(
        [jnp.roll(rows[p], -starts[p]) for p in range(p_planes)]
    )
    return assemble_message_device(rel_rows, msg_off, seg_len, out_len)


@partial(jax.jit, static_argnames=("nbits_planes",))
def xor_maps(original: jax.Array, stego: jax.Array, nbits_planes: int = None) -> jax.Array:  # type: ignore[assignment]
    """Per-plane XOR location maps ``(nbits, H, W) uint8`` of orig vs stego —
    the reference's ``bitmap[y, x] = orig ^ stego`` (src/codec.py:309-311),
    computed for all planes in one pass from the packed images."""
    from .bitplanes import split_planes

    diff = original ^ stego
    nbits = original.dtype.itemsize * 8 if nbits_planes is None else nbits_planes
    return split_planes(diff, nbits)


@partial(jax.jit, static_argnames=("nbits",))
def xor_maps_packed_batch(
    originals: jax.Array, stegos: jax.Array, nbits: int
) -> jax.Array:
    """``(B, nbits, N/8) uint8`` bit-packed XOR location maps, MSB-first
    within each byte so the host inverse is plain ``np.unpackbits``.

    This is the device half of the serving path's download cut: the fused
    batch encoder ships these instead of the full stego batch (8/itemsize x
    fewer bytes per plane; the dev tunnel's device->host direction measured
    ~4x slower than host->device in the round-3 breakdown) and the host
    reconstructs ``stego = orig ^ unpacked`` — the maps double as the
    container's bitmap blobs, so ``_host_xor_maps`` disappears entirely.
    Requires ``H*W % 8 == 0`` (callers fall back to a stego download
    otherwise)."""
    b = originals.shape[0]
    diff = (originals ^ stegos).reshape(b, -1)
    n = diff.shape[1]
    sh = jnp.arange(nbits, dtype=diff.dtype).reshape(1, nbits, 1)
    planes = ((diff[:, None, :] >> sh) & 1).astype(jnp.uint8)
    w = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return jnp.sum(
        planes.reshape(b, nbits, n // 8, 8) * w, axis=-1, dtype=jnp.uint8
    )


@jax.jit
def pack_bits_batch(bits: jax.Array) -> jax.Array:
    """``(B, ...)`` 0/1 -> ``(B, ceil(n/8)) uint8``, MSB-first with zero
    padding — the device twin of per-item ``np.packbits`` (bit-identical
    bytes, any trailing-length n).

    Serving paths download bit maps in this form instead of raw 0/1 bytes:
    8x fewer bytes on the tunnel's slow device->host direction and no host
    ``np.packbits`` (which runs at ~30 MB/s on the single-core serving
    host). The PEE encoders use it for the overflow location maps, whose
    packed form is byte-identical to the container blob."""
    b = bits.shape[0]
    flat = bits.reshape(b, -1).astype(jnp.uint8)
    pad = (-flat.shape[1]) % 8
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    w = jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8)
    return jnp.sum(flat.reshape(b, -1, 8) * w, axis=-1, dtype=jnp.uint8)


@jax.jit
def restore_original(stego: jax.Array, maps: jax.Array, s: jax.Array) -> jax.Array:
    """Reversibility: original = stego XOR (maps recombined over the s local
    planes). The reference stores these maps (src/codec.py:888-890) but never
    exploits them; here restoration is a first-class operation."""
    nbits = maps.shape[0]
    shifts = jnp.arange(nbits, dtype=jnp.int32).reshape(nbits, 1, 1)
    active = (jnp.arange(nbits, dtype=jnp.int32) < s).reshape(nbits, 1, 1)
    diff = jnp.sum(jnp.where(active, maps.astype(jnp.int32), 0) << shifts, axis=0)
    return stego ^ diff.astype(stego.dtype)


def _block_fill_rank(h: int, w: int, block: int, base: jax.Array) -> jax.Array:
    """Per-pixel fill rank for the block-adaptive order: pixels of the
    highest-variance tile come first (raster within tile), then the next tile,
    etc. ``base`` is the (ntiles,) per-tile base offset from
    :func:`codec_tcc_tpu.ops.blocks.block_base_offsets`. Returns (H, W) int32.
    """
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    nw = -(-w // block)
    ty = y // block
    tx = x // block
    tile_id = ty * nw + tx
    x0 = tx * block
    y0 = ty * block
    bw_real = jnp.minimum(block, w - x0)
    r = (y - y0) * bw_real + (x - x0)
    return base[tile_id] + r


def _uniform_tiling(h: int, w: int, block: int) -> bool:
    """True when every tile is full-size — the geometry where the one-hot
    MXU permutation route applies (base offsets are then multiples of
    ``block^2`` and message chunks map 1:1 onto tiles)."""
    return h % block == 0 and w % block == 0


def _tiles_of(plane2d: jax.Array, block: int) -> jax.Array:
    """(H, W) -> (ntiles, block^2): raster tile rows, raster-within-tile."""
    h, w = plane2d.shape
    nh, nw = h // block, w // block
    return (
        plane2d.reshape(nh, block, nw, block)
        .transpose(0, 2, 1, 3)
        .reshape(nh * nw, block * block)
    )


def _untile(tiles: jax.Array, h: int, w: int, block: int) -> jax.Array:
    """Inverse of :func:`_tiles_of`."""
    nh, nw = h // block, w // block
    return (
        tiles.reshape(nh, nw, block, block)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


def _permute_rows_mxu(rows: jax.Array, onehot: jax.Array) -> jax.Array:
    """Permute (ntiles, bs) 0/1 rows by an int8 one-hot matrix on the MXU.

    XLA lowers arbitrary-index row gathers on this hardware to a serialized
    per-row loop (~mu-s each: measured 2.4 s for a 128x8-plane batch of
    1024-row permutations — round-4 probe; tools/block_profile.py keeps the
    per-stage attribution methodology), while the same permutation as a
    (ntiles x ntiles) @ (ntiles x bs) one-hot matmul runs the whole batch in
    milliseconds. int8 x int8 -> int32 (round 5): exact — each output element
    is a dot of 0/1 terms with exactly one nonzero, so the accumulator holds
    0 or 1 — and the s8 MXU path runs at 2x the bf16 rate with half the
    one-hot HBM bytes and no f32 threshold pass (A/B'd on chip,
    tools/block_profile.py)."""
    if _PERMUTE_DTYPE == "bf16":
        out = jnp.dot(
            onehot.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.int32).astype(jnp.uint8)
    out = jnp.dot(onehot, rows.astype(jnp.int8),
                  preferred_element_type=jnp.int32)
    return out.astype(jnp.uint8)


# CODEC_TCC_PERMUTE_DTYPE=bf16 A/Bs the permutation matmul's MXU path on
# hardware (tools/block_profile.py; exact either way — every output is a
# 0/1 dot with one nonzero term, and f32 accumulation of 0/1 products is
# exact)
import os as _os

_PERMUTE_DTYPE = _os.environ.get("CODEC_TCC_PERMUTE_DTYPE", "int8")


@partial(jax.jit, static_argnames=("nbits", "block"))
def embed_block_adaptive(
    image: jax.Array,         # (H, W)
    msg_bits: jax.Array,      # (Lpad,) uint8
    base_offsets: jax.Array,  # (nbits, ntiles) int32 per-plane tile bases
    seg_len: jax.Array,       # (nbits,) int32
    msg_off: jax.Array,       # (nbits,) int32
    s: jax.Array,             # scalar int32
    nbits: int,
    block: int,
    msg_rows: "jax.Array | None" = None,  # (nbits, ntiles, block^2) pre-sliced
) -> jax.Array:
    """Strategy 2 (intended semantics of src/codec.py:320-410, defect B2
    fixed): variance-ranked block fill with no data-dependent shapes.

    Uniform tilings ride the MXU: the message window reshapes into fill-rank
    chunks of ``block^2`` bits and a per-plane one-hot permutation places
    chunk ``base[t]/bs`` onto tile ``t`` (:func:`_permute_rows_mxu`). The
    whole plane loop runs in TILE space — the image transposes to
    ``(ntiles, bs)`` rows once and back once, instead of one ``_untile``
    relayout per plane (round-5 restructure: the per-plane transposes were
    ~40% of the cycle's device time — tools/block_profile.py), and the
    within-tile fill rank is just the row iota, so the active mask is a
    broadcast compare with no (H, W) rank tensor at all. Edge-tile
    geometries keep the elementwise formulation (a per-pixel message
    gather), which XLA serializes but stays correct for any shape."""
    h, w = image.shape
    lpad = msg_bits.shape[0]
    acc = image
    if _uniform_tiling(h, w, block):
        n = h * w
        nh, nw = h // block, w // block
        ntiles, bs = nh * nw, block * block
        karange = jnp.arange(ntiles, dtype=jnp.int32)
        r = jnp.arange(bs, dtype=jnp.int32)[None, :]   # within-tile rank
        if msg_rows is None:
            # per-plane window slice with a TRACED offset: under vmap this
            # is a batched gather that XLA serializes (~24 ms of a 50 ms
            # B=256 cycle, tools/block_profile.py msgslice_only) — callers
            # on the hot paths pre-slice on host (block_msg_rows) and pass
            # msg_rows instead; this fallback keeps the standalone
            # single-dispatch form correct
            msg_ext = jnp.concatenate(
                [msg_bits, jnp.zeros(n, msg_bits.dtype)]
            )
            msg_rows = jnp.stack([
                jax.lax.dynamic_slice(
                    msg_ext, (msg_off[p],), (n,)
                ).reshape(ntiles, bs)
                for p in range(nbits)
            ])
        tacc = _tiles_of(image, block)
        for p in range(nbits):
            k = base_offsets[p].astype(jnp.int32) // bs
            onehot = (k[:, None] == karange[None, :]).astype(jnp.int8)
            bits_t = _permute_rows_mxu(msg_rows[p], onehot)
            base_col = base_offsets[p].astype(jnp.int32)[:, None]
            active = (base_col + r < seg_len[p]) & (p < s)
            newv = (tacc & _dtype_keep_mask(image.dtype, p)) | (
                bits_t.astype(image.dtype) << p
            )
            tacc = jnp.where(active, newv, tacc)
        return _untile(tacc, h, w, block)
    for p in range(nbits):
        rank = _block_fill_rank(h, w, block, base_offsets[p])
        active = (rank < seg_len[p]) & (p < s)
        midx = jnp.clip(msg_off[p] + rank, 0, lpad - 1)
        bits = jnp.take(msg_bits, midx, mode="clip")
        newv = (acc & _dtype_keep_mask(image.dtype, p)) | (
            bits.astype(image.dtype) << p
        )
        acc = jnp.where(active, newv, acc)
    return acc


def block_msg_rows(
    msg_bits, msg_off, nbits: int, h: int, w: int, block: int
):
    """HOST pre-slice of each plane's message window into chunk layout —
    ``(nbits, ntiles, block^2)`` with row ``j`` of plane ``p`` holding
    ``msg[msg_off[p] + j*bs : ... + bs]`` (zero-padded past the buffer).
    Pure numpy memcpys at plan time; passing the result as
    ``embed_block_adaptive``'s ``msg_rows`` removes the kernel's traced
    window slice (a batched gather XLA serializes — half the round-4 block
    cycle, tools/block_profile.py)."""
    import numpy as np

    msg_bits = np.asarray(msg_bits, dtype=np.uint8)
    nh, nw = -(-h // block), -(-w // block)
    ntiles, bs = nh * nw, block * block
    ext = np.zeros(
        int(np.max(msg_off, initial=0)) + ntiles * bs, dtype=np.uint8
    )
    ext[: msg_bits.size] = msg_bits[: ext.size]
    rows = np.zeros((nbits, ntiles * bs), dtype=np.uint8)
    for p in range(nbits):
        off = int(msg_off[p])
        rows[p] = ext[off : off + ntiles * bs]
    return rows.reshape(nbits, ntiles, bs)


@partial(jax.jit, static_argnames=("nbits", "out_len"))
def extract_message_device(
    stego: jax.Array,
    plane_start: jax.Array,
    seg_len: jax.Array,
    msg_off: jax.Array,
    s: jax.Array,
    nbits: int,
    out_len: int,
) -> jax.Array:
    """:func:`extract_aligned` + :func:`assemble_message_device` in ONE
    dispatch — the single-image decode hot path paid a fixed per-dispatch
    cost twice (~7 ms each on the dev tunnel) for what is one fused
    HBM sweep; only the ``out_len`` payload bits come back."""
    aligned = extract_aligned(stego, plane_start, seg_len, s, nbits)
    return assemble_message_device(aligned, msg_off, seg_len, out_len)


@partial(jax.jit, static_argnames=("nbits", "block", "out_len"))
def extract_block_message_device(
    stego: jax.Array,
    base_offsets: jax.Array,
    seg_len: jax.Array,
    msg_off: jax.Array,
    s: jax.Array,
    nbits: int,
    block: int,
    out_len: int,
) -> jax.Array:
    """Block-adaptive twin of :func:`extract_message_device`:
    :func:`extract_block_aligned` + :func:`assemble_message_device` fused
    into one dispatch.

    Uniform tilings take an all-MXU assembly (round 5): the roll-by-offset
    placement in :func:`assemble_message_device` is a batched dynamic op
    XLA serializes under vmap (like the embed side's window slice —
    tools/block_profile.py), but with ``msg_off[p] = q*bs + r`` the
    placement is a ROW permutation (fold ``q`` and the inverse fill
    permutation into one small one-hot) followed by a LANE shift by ``r``
    (one ``(2bs, bs)`` shift one-hot): message row ``j``, lane ``c`` reads
    fill position ``m = (j - q)*bs + (c - r)``, i.e. ``F2[j-q][c+bs-r]``
    where ``F2[u] = fill[u-1] ++ fill[u]`` with zero rows padded on both
    ends. Static shapes throughout; the only traced values live inside
    one-hot compares. Bit-exact with the roll form (property-tested),
    including the later-plane-overwrites-earlier aliasing semantics."""
    h, w = stego.shape
    if not _uniform_tiling(h, w, block):
        aligned = extract_block_aligned(
            stego, base_offsets, seg_len, s, nbits, block
        )
        return assemble_message_device(aligned, msg_off, seg_len, out_len)
    nh, nw = h // block, w // block
    ntiles, bs = nh * nw, block * block
    nrows_out = -(-out_len // bs)
    jcol = jnp.arange(nrows_out, dtype=jnp.int32)[:, None]
    crow = jnp.arange(bs, dtype=jnp.int32)[None, :]
    lane_u = jnp.arange(2 * bs, dtype=jnp.int32)[:, None]
    g = jcol * bs + crow                       # (nrows_out, bs) msg position
    tiles = _tiles_of(stego, block)
    acc = jnp.zeros((nrows_out, bs), dtype=jnp.uint8)
    for p in range(nbits):
        k = base_offsets[p].astype(jnp.int32) // bs
        plane_t = ((tiles >> p) & 1).astype(jnp.uint8)
        off = msg_off[p].astype(jnp.int32)
        q, r = off // bs, off % bs
        # fold the inverse fill permutation INTO the row placement: message
        # row j needs fill rows j-q-1 and j-q, and fill row m is the tile t
        # with k[t] == m — so two (nrows_out x ntiles) one-hots select the
        # tiles directly (out-of-range m selects nothing, giving the same
        # zero padding the two-step form built explicitly). Half the
        # matmul FLOPs and no (ntiles, 3bs) fill/F2 intermediates.
        sel = (k[None, None, :] ==
               (jcol - q)[None, :, :] - jnp.array([1, 0], jnp.int32)[:, None, None]
               ).astype(jnp.int8)              # (2, nrows_out, ntiles)
        g12 = jnp.einsum(
            "sjt,tc->sjc", sel, plane_t.astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
        gathered = jnp.concatenate([g12[0], g12[1]], axis=1)  # (nr, 2bs)
        shift = (lane_u == crow + bs - r).astype(jnp.int8)   # (2bs, bs)
        placed = jnp.dot(
            gathered.astype(jnp.int8), shift,
            preferred_element_type=jnp.int32,
        ).astype(jnp.uint8)
        m = g - off
        # the roll-form composition it replaces masks plane rows with
        # (p < s) BEFORE assembly but assembles on window membership
        # alone — so a degenerate plan giving a past-cut-point plane a
        # nonzero seg_len OVERWRITES earlier planes' bits with zeros
        # there; gating the write on (p < s) instead would silently skip
        # it (bit-exactness drift caught by review repro)
        valid = (m >= 0) & (m < seg_len[p])
        val = jnp.where(p < s, placed, jnp.zeros_like(placed))
        acc = jnp.where(valid, val, acc)
    return acc.reshape(-1)[:out_len]


@partial(jax.jit, static_argnames=("nbits", "block"))
def extract_block_aligned(
    stego: jax.Array,
    base_offsets: jax.Array,
    seg_len: jax.Array,
    s: jax.Array,
    nbits: int,
    block: int,
) -> jax.Array:
    """Inverse front half of :func:`embed_block_adaptive`: row p holds plane
    p's bits reordered into fill-rank (message) order and masked to its
    segment, ready for :func:`assemble_message`. ``base_offsets`` must be
    recomputed from the *restored original* planes (stego ^ XOR map) so the
    ranking matches the encoder's.

    The fill rank ``base[tile] + within_tile_raster`` is a structured
    permutation of ``0..N-1``, so its inverse never needs the N-element
    ``argsort`` this kernel once paid per plane per image (the round-3
    bench's 10.6 MPix/s block cycle — ~900x under the raster tier on the
    same chip): sorting the (ntiles,) base array recovers the fill ORDER of
    tiles, and each message position then maps to its source pixel with
    pure index arithmetic plus two gathers — one from the tiny order table,
    one from the plane. When the geometry tiles evenly (the common case)
    the fill-rank -> tile step is a static division; edge tiles take a
    log2(ntiles) unrolled binary search over the sorted bases instead."""
    h, w = stego.shape
    n = h * w
    flat = stego.reshape(n)
    iota = jnp.arange(n, dtype=jnp.int32)
    nh = -(-h // block)
    nw = -(-w // block)
    bs = block * block
    rows = []
    if _uniform_tiling(h, w, block):
        # MXU route (see embed_block_adaptive): tile rows permuted to fill
        # order by the inverse one-hot — onehot[chunk, tile] = 1 iff tile t
        # holds fill chunk k[t]. No gathers, no argsort; the stego tiles
        # once (not once per plane) and planes extract in tile space.
        ntiles = nh * nw
        karange = jnp.arange(ntiles, dtype=jnp.int32)
        tiles = _tiles_of(stego, block)
        for p in range(nbits):
            k = base_offsets[p].astype(jnp.int32) // bs
            onehot = (k[None, :] == karange[:, None]).astype(jnp.int8)
            plane_t = ((tiles >> p) & 1).astype(jnp.uint8)
            fill = _permute_rows_mxu(plane_t, onehot).reshape(n)
            valid = (iota < seg_len[p]) & (p < s)
            rows.append(jnp.where(valid, fill, 0))
        return jnp.stack(rows)
    for p in range(nbits):
        base = base_offsets[p].astype(jnp.int32)       # (ntiles,)
        order = jnp.argsort(base).astype(jnp.int32)    # fill rank k -> tile id
        starts_sorted = jnp.take(base, order)          # fill start of rank-k tile
        k = jnp.searchsorted(
            starts_sorted, iota, side="right", method="scan_unrolled"
        ).astype(jnp.int32) - 1
        k = jnp.clip(k, 0, nh * nw - 1)
        r = iota - jnp.take(starts_sorted, k)
        t = jnp.take(order, k)                         # (n,) from (ntiles,) table
        ty = t // nw
        tx = t - ty * nw
        bw_real = jnp.minimum(block, w - tx * block)
        dy = r // bw_real
        dx = r - dy * bw_real
        pix = (ty * block + dy) * w + (tx * block + dx)
        plane = ((flat >> p) & 1).astype(jnp.uint8)
        # mode="clip": planes past the cut point carry all-zero base rows
        # whose arithmetic can stray out of range — their rows are fully
        # masked below, the gather just has to stay in bounds
        aligned = jnp.take(plane, pix, mode="clip")
        valid = (iota < seg_len[p]) & (p < s)
        rows.append(jnp.where(valid, aligned, 0))
    return jnp.stack(rows)


def pad_message(msg_bits, n_pixels: int, max_offset: int):
    """Host helper: pad message bits so every ``dynamic_slice(msg, off, N)``
    stays in bounds. Returns a numpy uint8 array of static-friendly length."""
    import numpy as np

    msg_bits = np.asarray(msg_bits, dtype=np.uint8)
    need = max(int(max_offset), 0) + n_pixels
    lpad = max(need, msg_bits.size)
    out = np.zeros(lpad, dtype=np.uint8)
    out[: msg_bits.size] = msg_bits
    return out
