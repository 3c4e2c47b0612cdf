"""Host-callback transport codecs inside jitted pipelines.

The north star requires the external compression stage to be "wrapped as a
host callback so the end-to-end encode->compress->decode flow survives" in a
jitted graph (SURVEY §7 hard part: "host-callback codecs inside a
jitted/sharded pipeline ... keep the callback off the critical path").

Any codec from the registry becomes a pair of ``jax.experimental.io_callback``
stages operating on fixed-size byte buffers (XLA needs static shapes, so the
compressed stream lives in a ``(capacity,) uint8`` buffer plus a length
scalar). ``ordered=True`` keeps compress/decompress serialized with their
surrounding graph. Compression happens post-embed, so the callback sits after
the device->host transfer of the stego tensor — exactly the staging the
survey prescribes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.codecs import get as get_codec

__all__ = ["compress_stage", "decompress_stage", "roundtrip_in_jit"]


def _encode_host(codec_name: str, capacity: int, image: np.ndarray):
    codec = get_codec(codec_name)
    blob = codec.encode(np.asarray(image))
    if len(blob) > capacity:
        raise ValueError(
            f"codec '{codec_name}' output ({len(blob)} B) exceeds the "
            f"reserved callback buffer ({capacity} B)"
        )
    buf = np.zeros(capacity, dtype=np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    return buf, np.int32(len(blob))


def _decode_host(codec_name: str, shape: Tuple[int, int], dtype, buf: np.ndarray, n: np.ndarray):
    codec = get_codec(codec_name)
    arr = codec.decode(bytes(np.asarray(buf)[: int(n)]))
    if arr.shape != tuple(shape):
        raise ValueError(f"decoded shape {arr.shape} != expected {tuple(shape)}")
    return arr.astype(dtype)


def compress_stage(image: jax.Array, codec_name: str, capacity: int):
    """jit-compatible compression: ``image -> (buffer[capacity] u8, length)``."""
    return jax.experimental.io_callback(
        partial(_encode_host, codec_name, capacity),
        (
            jax.ShapeDtypeStruct((capacity,), jnp.uint8),
            jax.ShapeDtypeStruct((), jnp.int32),
        ),
        image,
        ordered=True,
    )


def decompress_stage(
    buf: jax.Array, n: jax.Array, codec_name: str, shape: Tuple[int, int], dtype
):
    """jit-compatible decompression: exact inverse of :func:`compress_stage`."""
    return jax.experimental.io_callback(
        partial(_decode_host, codec_name, shape, dtype),
        jax.ShapeDtypeStruct(tuple(shape), dtype),
        buf,
        n,
        ordered=True,
    )


def roundtrip_in_jit(image: jax.Array, codec_name: str, capacity: int) -> jax.Array:
    """Compress+decompress entirely inside one jitted graph (the survey's
    encode->compress->decode flow surviving under jit)."""

    @jax.jit
    def run(img):
        buf, n = compress_stage(img, codec_name, capacity)
        return decompress_stage(buf, n, codec_name, img.shape, img.dtype)

    return run(image)
