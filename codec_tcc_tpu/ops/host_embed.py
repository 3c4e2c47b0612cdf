"""O(payload) host twin of the raster embed kernels (round 5).

The raster strategies (multi_plane / hybrid, src/codec.py:276-318 and
412-487 semantics with defects B1/B4 fixed) place message bits into each
plane's raster window ``[start_p, start_p + len_p) mod N`` — pure bit
placement, no per-pixel arithmetic. On a serving host that already holds
the image batch, doing this placement on the device costs a whole-image
upload plus a packed-map download for work that touches only
``payload_bits / 8`` bytes; the measured round-5 e2e split showed the link
alone (~400 ms for a 32x512^2 uint16 batch over the dev tunnel) exceeding
the CPU backend's ENTIRE pipeline. This module is the window-sliced host
form the batch encoder's ``device_policy="auto"`` routes raster batches
through: build the bit-packed XOR maps directly from the message and the
original's plane bits inside each window (everything outside a window is
zero by construction), then reconstruct the stego with the same
O(payload) window XOR the decode side uses.

Bit-exact with the device route for every plan ``parallel.batch.plan_batch``
produces — containers are byte-identical (property-tested in
tests/test_round5_serving.py). The chip keeps the strategies with real
per-pixel compute: PEE (prediction/expand), block_adaptive (rank-compare
permutations), fused device metrics, volumes, and multi-device meshes.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils import bits as bit_utils

__all__ = ["embed_raster_host_packed"]


def embed_raster_host_packed(
    image: np.ndarray,
    msg_bits: np.ndarray,
    starts,
    lengths,
    offsets,
    s: int,
    max_s: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Embed ``msg_bits`` into ``image``'s raster windows; return
    ``(stego, packed_maps)`` where ``packed_maps`` is the ``(max_s, N//8)``
    uint8 bit-packed XOR location maps (identical bytes to the device
    route's ``xor_maps_packed_batch`` download — they become the v2.1
    container bitmap blobs as-is).

    Semantics matched to ``ops.embed.embed``'s active mask: plane ``p``
    embeds ``msg_bits[offsets[p] + r]`` at raster position
    ``(starts[p] + r) mod N`` for ``r < min(lengths[p], N)``; planes at or
    past the cut point ``s`` embed nothing. The XOR map bit is
    ``orig_bit ^ msg_bit`` inside the window, zero elsewhere — so only the
    window-covering bytes are ever written (two spans when the hybrid
    window wraps, the shared boundary byte OR-accumulated: within one
    plane the wrapped spans cover disjoint BIT ranges)."""
    h, w = image.shape
    n = h * w
    if n % 8:
        raise ValueError("embed_raster_host_packed needs N % 8 == 0")
    flat = image.reshape(-1)
    packed = np.zeros((max_s, n // 8), dtype=np.uint8)
    for p in range(min(int(s), max_s)):
        raw_spans = bit_utils.raster_window_spans(starts[p], lengths[p], n)
        if not raw_spans:
            continue
        start = int(starts[p]) % n
        off = int(offsets[p])
        # annotate each span with where its bits sit in the message: the
        # wrap span continues after the first span's (n - start) bits
        spans = [
            (a, b, off if a == start else off + (n - start))
            for a, b in raw_spans
        ]
        for a, b, ma in spans:
            b0 = a // 8
            b1 = (b + 7) // 8
            width = 8 * (b1 - b0)
            seg = np.zeros(width, dtype=np.uint8)
            lo = a - 8 * b0
            count = b - a
            mseg = msg_bits[ma : ma + count]
            if mseg.shape[0] < count:  # plan guarantees coverage; stay safe
                mseg = np.concatenate(
                    [mseg, np.zeros(count - mseg.shape[0], np.uint8)]
                )
            orig = (flat[8 * b0 + lo : 8 * b0 + lo + count] >> p) & 1
            seg[lo : lo + count] = mseg ^ orig.astype(np.uint8)
            np.bitwise_or(
                packed[p, b0:b1], np.packbits(seg), out=packed[p, b0:b1]
            )
    stego = bit_utils.xor_packed_windows(image, packed, starts, lengths)
    return stego, packed
