"""On-device bit-plane split / merge.

Reference semantics: ``(image >> i) & 1`` per plane
(``/root/reference/src/codec.py:571,789-793``) and shift-OR recombination with
dtype ``uint16 iff total planes > 8`` (``src/codec.py:215-237``). Here both
directions are single fused elementwise XLA programs over a dense
``(nbits, H, W)`` plane tensor — no Python lists of ragged planes (SURVEY §7
"data-dependent shapes" hard part: ragged lists cannot translate; we carry all
``nbits`` planes and predicate on the runtime cut point ``s`` instead).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["split_planes", "merge_planes", "merge_local_global"]


@partial(jax.jit, static_argnames=("nbits",))
def split_planes(image: jax.Array, nbits: int) -> jax.Array:
    """``(H, W) uint8/uint16 -> (nbits, H, W) uint8`` LSB-first bit planes."""
    shifts = jnp.arange(nbits, dtype=jnp.int32).reshape(nbits, 1, 1)
    planes = (image.astype(jnp.int32)[None] >> shifts) & 1
    return planes.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("nbits",))
def merge_planes(planes: jax.Array, nbits: int) -> jax.Array:
    """``(nbits, H, W) -> (H, W)``; dtype uint16 iff nbits > 8 (the
    reference's rule at src/codec.py:218-221)."""
    dtype = jnp.uint16 if nbits > 8 else jnp.uint8
    shifts = jnp.arange(nbits, dtype=jnp.int32).reshape(nbits, 1, 1)
    acc = jnp.sum(planes.astype(jnp.int32) << shifts, axis=0)
    return acc.astype(dtype)


@jax.jit
def merge_local_global(image: jax.Array, local_planes: jax.Array, s: jax.Array) -> jax.Array:
    """Rebuild an image from its own global (MSB) planes and replacement local
    planes: keep bits >= s from ``image``, take bits < s from ``local_planes``
    (``(nbits, H, W)`` uint8). Equivalent to the reference's
    ``merge_modalities(global, stego_local)`` with the globals taken from the
    original image, but without materializing global planes at all."""
    nbits = local_planes.shape[0]
    shifts = jnp.arange(nbits, dtype=jnp.int32).reshape(nbits, 1, 1)
    active = (jnp.arange(nbits, dtype=jnp.int32) < s).reshape(nbits, 1, 1)
    local_bits = jnp.sum(
        jnp.where(active, local_planes.astype(jnp.int32), 0) << shifts, axis=0
    )
    keep_mask = ~((jnp.int32(1) << s) - jnp.int32(1))  # clear the s LSBs
    merged = (image.astype(jnp.int32) & keep_mask) | local_bits
    return merged.astype(image.dtype)
