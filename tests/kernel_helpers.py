"""Test-only kernel variants.

``extract_full_device`` is the fully-jitted single-program extractor (the
corrected defect-B1 semantics: deterministic positions, message-order join).
Production decode uses ``ops.embed.extract_aligned`` + host assembly instead,
because the ``dynamic_update_slice`` accumulation below lowers to an XLA
scatter under ``vmap`` — an op family that takes minutes to compile on this
TPU (see CLAUDE.md). It lives here as an independent second implementation
the oracle tests diff against.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nbits", "out_len"))
def extract_full_device(
    stego: jax.Array,
    plane_start: jax.Array,
    seg_len: jax.Array,
    msg_off: jax.Array,
    s: jax.Array,
    nbits: int,
    out_len: int,            # static padded message length (>= total bits)
) -> jax.Array:
    """Recover the message bits from a stego image in one jitted program."""
    h, w = stego.shape
    n = h * w
    flat = stego.reshape(n)
    iota = jnp.arange(n, dtype=jnp.int32)
    msg = jnp.zeros(out_len + n, dtype=jnp.uint8)
    for p in range(nbits):
        plane = ((flat >> p) & 1).astype(jnp.uint8)
        aligned = jnp.roll(plane, -plane_start[p])
        valid = (iota < seg_len[p]) & (p < s)
        contrib = jnp.where(valid, aligned, 0)
        window = jax.lax.dynamic_slice(msg, (msg_off[p],), (n,))
        msg = jax.lax.dynamic_update_slice(msg, window | contrib, (msg_off[p],))
    return msg[:out_len]
