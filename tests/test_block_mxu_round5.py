"""Round-5 block_adaptive MXU assembly contracts.

The uniform-tiling block kernels' dynamic pieces — the embed side's traced
message-window slice and the assemble side's roll-by-offset — are batched
dynamic ops XLA serializes under vmap (tools/block_profile.py measured
them at ~half the B=256 cycle). Round 5 replaces them with host pre-sliced
message rows (``ops.embed.block_msg_rows``) and an all-MXU row/lane
one-hot placement in ``extract_block_message_device``. These tests pin
bit-exactness of both against the original formulations across plan
shapes, including the degenerate ones the reference's negative-size
accidents can produce (aliasing offsets, zero/oversized segments, planes
past the cut point).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from codec_tcc_tpu.ops import embed as embed_ops


def _rand_plan(rng, nbits, n, lpad, aliasing=False):
    seg_len = rng.integers(0, n + 1, nbits).astype(np.int32)
    msg_off = rng.integers(0, max(lpad - n, 1), nbits).astype(np.int32)
    if aliasing:
        msg_off[1:] = msg_off[0]            # planes alias one window
    seg_len[-1] = 0                          # a zero segment
    return seg_len, msg_off


@pytest.mark.parametrize("block", [4, 8])
@pytest.mark.parametrize("aliasing", [False, True])
def test_embed_msg_rows_matches_traced_slice(block, aliasing):
    rng = np.random.default_rng(5)
    h = w = 4 * block
    n = h * w
    nbits, s = 4, 3
    lpad = 1 << 10
    img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    msg = rng.integers(0, 2, lpad).astype(np.uint8)
    ntiles = (h // block) * (w // block)
    bs = block * block
    for trial in range(4):
        seg_len, msg_off = _rand_plan(rng, nbits, n, lpad, aliasing)
        if trial == 1:
            msg_off[:] = (msg_off // bs) * bs   # r == 0 edge
        if trial == 2:
            msg_off[0] = 0
        bases = np.stack([
            rng.permutation(ntiles).astype(np.int32) * bs
            for _ in range(nbits)
        ])
        base = embed_ops.embed_block_adaptive(
            jnp.asarray(img), jnp.asarray(msg), jnp.asarray(bases),
            jnp.asarray(seg_len), jnp.asarray(msg_off), jnp.int32(s),
            nbits, block,
        )
        rows = embed_ops.block_msg_rows(msg, msg_off, nbits, h, w, block)
        fast = embed_ops.embed_block_adaptive(
            jnp.asarray(img), jnp.zeros(8, jnp.uint8), jnp.asarray(bases),
            jnp.asarray(seg_len), jnp.asarray(msg_off), jnp.int32(s),
            nbits, block, jnp.asarray(rows),
        )
        assert np.array_equal(np.asarray(base), np.asarray(fast)), trial


@pytest.mark.parametrize("block", [4, 8])
@pytest.mark.parametrize("out_len", [1000, 1024, 37])
def test_fused_block_extract_matches_roll_assembly(block, out_len):
    rng = np.random.default_rng(6)
    h = w = 4 * block
    n = h * w
    nbits, s = 4, 3
    stego = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    ntiles = (h // block) * (w // block)
    bs = block * block
    for trial in range(5):
        seg_len, msg_off = _rand_plan(
            rng, nbits, n, out_len + n, aliasing=(trial == 3)
        )
        if trial == 1:
            msg_off[:] = (msg_off // bs) * bs   # r == 0 edge
        if trial == 4:
            seg_len[0] = n                       # full-plane segment
            msg_off[0] = 0
        bases = np.stack([
            rng.permutation(ntiles).astype(np.int32) * bs
            for _ in range(nbits)
        ])
        args = (
            jnp.asarray(stego), jnp.asarray(bases), jnp.asarray(seg_len),
            jnp.asarray(msg_off), jnp.int32(s),
        )
        # reference composition: aligned rows + roll-based assembly
        aligned = embed_ops.extract_block_aligned(
            args[0], args[1], args[2], args[4], nbits, block
        )
        want = embed_ops.assemble_message_device(
            aligned, args[3], args[2], out_len
        )
        got = embed_ops.extract_block_message_device(
            args[0], args[1], args[2], args[3], args[4],
            nbits, block, out_len,
        )
        assert np.array_equal(np.asarray(got), np.asarray(want)), trial


def test_fused_extract_past_cut_plane_overwrites_with_zeros():
    """Degenerate plan: a plane AT/PAST the cut point with nonzero seg_len
    aliasing an earlier plane's window. The roll-form composition masks
    its row to zeros but still assembles it — overwriting the earlier
    plane's bits with zeros. The fused MXU path must reproduce that
    exactly (review repro: gating the write on p < s silently skipped it
    and returned plane 0's bits instead)."""
    rng = np.random.default_rng(12)
    block, h, w = 4, 16, 16
    nbits, s = 3, 1
    stego = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    ntiles = (h // block) * (w // block)
    bs = block * block
    seg_len = np.array([50, 30, 0], np.int32)
    msg_off = np.array([0, 0, 0], np.int32)
    bases = np.stack([
        rng.permutation(ntiles).astype(np.int32) * bs for _ in range(nbits)
    ])
    args = (
        jnp.asarray(stego), jnp.asarray(bases), jnp.asarray(seg_len),
        jnp.asarray(msg_off), jnp.int32(s),
    )
    aligned = embed_ops.extract_block_aligned(
        args[0], args[1], args[2], args[4], nbits, block
    )
    want = embed_ops.assemble_message_device(aligned, args[3], args[2], 64)
    got = embed_ops.extract_block_message_device(
        args[0], args[1], args[2], args[3], args[4], nbits, block, 64
    )
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # and the overwrite really happened: plane 1's aliased window zeroes
    # the first 30 bits
    assert not np.asarray(want)[:30].any()


def test_block_roundtrip_through_new_routes():
    """Embed with pre-sliced rows, extract with the MXU assembly — the
    message must round-trip exactly (end-to-end sanity on the pair)."""
    rng = np.random.default_rng(8)
    block = 8
    h = w = 40
    n = h * w
    nbits, s = 4, 3
    bs = block * block
    ntiles = (h // block) * (w // block)
    img = rng.integers(0, 4096, (h, w)).astype(np.uint16)
    payload_bits = 700
    msg = rng.integers(0, 2, payload_bits).astype(np.uint8)
    seg_len = np.array([300, 250, 150, 0], np.int32)
    msg_off = np.array([0, 300, 550, 700], np.int32)
    lpad = 1 << 11
    msg_pad = np.zeros(lpad, np.uint8)
    msg_pad[:payload_bits] = msg
    bases = np.stack([
        rng.permutation(ntiles).astype(np.int32) * bs for _ in range(nbits)
    ])
    rows = embed_ops.block_msg_rows(msg_pad, msg_off, nbits, h, w, block)
    stego = embed_ops.embed_block_adaptive(
        jnp.asarray(img), jnp.zeros(8, jnp.uint8), jnp.asarray(bases),
        jnp.asarray(seg_len), jnp.asarray(msg_off), jnp.int32(s),
        nbits, block, jnp.asarray(rows),
    )
    got = embed_ops.extract_block_message_device(
        stego, jnp.asarray(bases), jnp.asarray(seg_len),
        jnp.asarray(msg_off), jnp.int32(s), nbits, block, payload_bits,
    )
    assert np.array_equal(np.asarray(got), msg)
