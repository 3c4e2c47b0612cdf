"""ops.host_extract — the decode serving paths' O(payload) host extraction —
must be bit-equal to the device kernels and the oracle (round-3 VERDICT
next-step #2: decode-side extraction must stop paying O(N) transfers)."""

import numpy as np
import pytest

from oracle import numpy_ref as oracle
from codec_tcc_tpu.ops import blocks as block_ops
from codec_tcc_tpu.ops import embed as embed_ops
from codec_tcc_tpu.ops import host_extract


@pytest.mark.parametrize("dtype,geometry", [
    (np.uint16, (64, 64)),
    (np.uint8, (48, 80)),
    (np.uint16, (37, 53)),     # odd geometry
])
def test_raster_host_matches_device(rng, dtype, geometry):
    h, w = geometry
    n = h * w
    stego = rng.integers(0, np.iinfo(dtype).max + 1, size=(h, w)).astype(dtype)
    nbits = 8
    s = 5
    starts = rng.integers(0, n, size=nbits).astype(np.int32)
    lengths = rng.integers(0, n + 10, size=nbits).astype(np.int32)
    offsets = rng.integers(0, 2 * n, size=nbits).astype(np.int32)
    out_len = n + 7

    dev = np.asarray(embed_ops.extract_message_device(
        stego, starts, lengths, offsets, np.int32(s), nbits, out_len
    ))
    host = host_extract.extract_raster_host(
        stego, starts, lengths, offsets, s, out_len
    )
    np.testing.assert_array_equal(host, dev)


@pytest.mark.parametrize("geometry,block", [
    ((64, 64), 16),
    ((37, 53), 8),             # edge tiles on both axes
    ((40, 64), 16),            # edge tiles on one axis
])
def test_block_host_matches_device_and_oracle(rng, geometry, block):
    h, w = geometry
    n = h * w
    img = rng.integers(0, 4096, size=(h, w)).astype(np.uint16)
    nbits, s = 8, 4
    ntiles = (-(-h // block)) * (-(-w // block))

    counts = host_extract.block_counts_host(img, s, block)
    np.testing.assert_array_equal(
        counts, np.asarray(block_ops.block_bit_counts_all(img, s, block))
    )

    bases = np.zeros((nbits, ntiles), dtype=np.int32)
    rankings = []
    for p in range(s):
        b, r = block_ops.block_base_offsets(counts[p], h, w, block)
        bases[p] = b
        rankings.append(r)

    lengths = np.zeros(nbits, np.int32)
    offsets = np.zeros(nbits, np.int32)
    acc = 0
    for p in range(s):
        lengths[p] = int(rng.integers(0, n))
        offsets[p] = acc
        acc += lengths[p]
    out_len = acc + 3

    dev = np.asarray(embed_ops.extract_block_message_device(
        img, bases, lengths, offsets, np.int32(s), nbits, block, out_len
    ))
    host = host_extract.extract_block_host(
        img, rankings, lengths, offsets, s, block, out_len
    )
    np.testing.assert_array_equal(host, dev)

    # fill positions against the oracle's variance-ranked walk
    for p in range(s):
        plane = ((img >> p) & 1).astype(np.uint8)
        want = oracle.block_fill_positions(plane, block, int(lengths[p]))
        got = host_extract.block_fill_positions_host(
            h, w, block, rankings[p], int(lengths[p])
        )
        np.testing.assert_array_equal(got, want)


def test_raster_host_overlapping_planes_overwrite_in_order(rng):
    """The reference's negative-size accidents can alias two planes onto one
    message offset; the host path must keep assemble_message_device's
    later-plane-wins semantics."""
    stego = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    nbits = 4
    starts = np.zeros(nbits, np.int32)
    lengths = np.full(nbits, 40, np.int32)
    offsets = np.zeros(nbits, np.int32)   # all planes write offset 0
    out_len = 64
    dev = np.asarray(embed_ops.extract_message_device(
        stego, starts, lengths, offsets, np.int32(nbits), nbits, out_len
    ))
    host = host_extract.extract_raster_host(
        stego, starts, lengths, offsets, nbits, out_len
    )
    np.testing.assert_array_equal(host, dev)


def test_raster_host_wraparound_window(rng):
    """start + len past N wraps to the raster origin (hybrid strategy's
    modulo walk, src/codec.py:465)."""
    stego = rng.integers(0, 65536, size=(8, 8)).astype(np.uint16)
    n = 64
    starts = np.array([60], np.int32)
    lengths = np.array([10], np.int32)
    offsets = np.array([0], np.int32)
    host = host_extract.extract_raster_host(
        stego, starts, lengths, offsets, 1, 10
    )
    flat = stego.ravel()
    want = np.concatenate([flat[60:], flat[:6]]) & 1
    np.testing.assert_array_equal(host, want.astype(np.uint8))
