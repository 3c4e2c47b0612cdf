"""Fused on-device quality metrics.

The reference computes MSE / PSNR / global-SSIM / diff statistics in separate
float64 NumPy passes on host (``/root/reference/src/mse.py:74-179,202-209``).
Per the north star ("mse.py's MSE/PSNR checks become on-device fused
reductions"), here all statistics for a pair of images come out of **one**
jitted program: a single traversal producing every sum the formulas need, so
the images are read from HBM once. Batch aggregation across a device mesh uses
``psum`` (see :mod:`codec_tcc_tpu.parallel`).

Beyond parity, :func:`ssim_windowed` adds standard sliding-window SSIM (the
reference's "simplified" SSIM uses one global mean/variance, src/mse.py:163-179
— kept as ``ssim_global`` for compatibility).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "analyze_pair",
    "pair_stats",
    "quality_report",
    "psnr_from_mse",
    "ssim_windowed",
]


@jax.jit
def pair_stats(a: jax.Array, b: jax.Array) -> Dict[str, jax.Array]:
    """One-pass fused sums for an image pair (float32 accumulate).

    Returns raw moments; combine with :func:`quality_report` (host) or
    ``jax.lax.psum`` across shards before finalizing.
    """
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    diff = af - bf
    adiff = jnp.abs(diff)
    return {
        "n": jnp.array(a.size, jnp.float32),
        "sum_a": jnp.sum(af),
        "sum_b": jnp.sum(bf),
        "sum_a2": jnp.sum(af * af),
        "sum_b2": jnp.sum(bf * bf),
        "sum_ab": jnp.sum(af * bf),
        "sum_sqdiff": jnp.sum(diff * diff),
        "sum_absdiff": jnp.sum(adiff),
        "max_absdiff": jnp.max(adiff),
        "changed": jnp.sum((a != b).astype(jnp.float32)),
        "max_a": jnp.max(af),
        "max_b": jnp.max(bf),
    }


def psnr_from_mse(mse: float, max_value: float) -> float:
    """``10*log10(MAX^2/MSE)``, inf when identical (src/mse.py:118-133)."""
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((max_value**2) / mse))


def quality_report(
    stats: Dict[str, jax.Array],
    max_value: float | None = None,
    *,
    range_a: float | None = None,
    range_b: float | None = None,
) -> Dict[str, float]:
    """Finalize fused sums into the reference's metric set
    (MSE src/mse.py:112-116, PSNR :126-133, global SSIM :163-179, diff stats
    :202-209).

    ``range_a``/``range_b`` are the per-image value ranges that drive the
    normalization decision (``calcular_mse``'s ``max1 != max2`` test,
    src/mse.py:100); they default to the data maxima (the array-input
    behavior). ``max_value`` is the final PSNR/SSIM range and defaults to
    ``max(range_a, range_b)``."""
    s = {k: float(v) for k, v in stats.items()}
    n = s["n"]
    # range normalization branch of calcular_mse (src/mse.py:100-110): when
    # the two images' ranges differ, both are rescaled to the larger range
    # before differencing. The normalized MSE comes from the fused moments:
    # ||a*alpha - b*beta||^2 = a2*alpha^2 + b2*beta^2 - 2ab*alpha*beta
    # (mild float32 cancellation in this branch; the common equal-range case
    # uses the directly-accumulated squared diff, which is cancellation-free).
    max_a = s["max_a"] if range_a is None else float(range_a)
    max_b = s["max_b"] if range_b is None else float(range_b)
    if max_value is None:
        max_value = max(max_a, max_b) if (max_a or max_b) else 255.0
    if max_a != max_b and max_a > 0 and max_b > 0:
        alpha = max_value / max_a
        beta = max_value / max_b
    else:
        alpha = beta = 1.0
    if alpha == beta == 1.0:
        mse = s["sum_sqdiff"] / n
    else:
        mse = max(
            0.0,
            (alpha * alpha * s["sum_a2"] + beta * beta * s["sum_b2"]
             - 2.0 * alpha * beta * s["sum_ab"]) / n,
        )
    mu1 = alpha * s["sum_a"] / n
    mu2 = beta * s["sum_b"] / n
    var1 = alpha * alpha * s["sum_a2"] / n - mu1 * mu1
    var2 = beta * beta * s["sum_b2"] / n - mu2 * mu2
    cov = alpha * beta * s["sum_ab"] / n - mu1 * mu2
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    ssim = ((2 * mu1 * mu2 + c1) * (2 * cov + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (var1 + var2 + c2)
    )
    return {
        "mse": mse,
        "psnr": psnr_from_mse(mse, max_value),
        "ssim": ssim,
        "mean_abs_diff": s["sum_absdiff"] / n,
        "max_abs_diff": s["max_absdiff"],
        "changed_pixels": s["changed"],
        "changed_percent": 100.0 * s["changed"] / n,
        "max_value": max_value,
    }


def host_pair_report(
    a,
    b,
    max_value: float | None = None,
    *,
    range_a: float | None = None,
    range_b: float | None = None,
) -> Dict[str, float]:
    """Float64 host computation of the full metric set — used for the
    reference's range-normalization branch (different ranges), where float32
    fused moments lose the signal to cancellation (sum(a^2) ~ 5e9 vs a
    normalized-MSE numerator ~ 1e5). Single images only; the fused device path
    (:func:`pair_stats`) is for batch/mesh throughput and the equal-range
    case, which is cancellation-free. ``range_a``/``range_b`` default to the
    data maxima (see :func:`quality_report` for the policy)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    max_a = float(a.max()) if range_a is None else float(range_a)
    max_b = float(b.max()) if range_b is None else float(range_b)
    if max_value is None:
        max_value = max(max_a, max_b) if (max_a or max_b) else 255.0
    raw_absdiff = np.abs(a - b)
    if max_a != max_b and max_a > 0 and max_b > 0:
        an = (a / max_a) * max_value
        bn = (b / max_b) * max_value
    else:
        an, bn = a, b
    diff = an - bn
    mse = float(np.mean(diff * diff))
    mu1, mu2 = float(np.mean(an)), float(np.mean(bn))
    var1, var2 = float(np.var(an)), float(np.var(bn))
    cov = float(np.mean((an - mu1) * (bn - mu2)))
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    ssim = ((2 * mu1 * mu2 + c1) * (2 * cov + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (var1 + var2 + c2)
    )
    changed = float(np.sum(a != b))
    return {
        "mse": mse,
        "psnr": psnr_from_mse(mse, max_value),
        "ssim": ssim,
        "mean_abs_diff": float(np.mean(raw_absdiff)),
        "max_abs_diff": float(np.max(raw_absdiff)),
        "changed_pixels": changed,
        "changed_percent": 100.0 * changed / a.size,
        "max_value": max_value,
    }


def analyze_pair(
    original,
    stego,
    *,
    range_a: float | None = None,
    range_b: float | None = None,
    max_value: float | None = None,
) -> Dict[str, float]:
    """THE metric entry point for an image pair (the reference's
    ``analisar_par_imagens`` core, src/mse.py:181-261) with an explicit range
    policy. The reference has two branches:

    * **array / data-max policy** (``calcular_psnr`` default and the operand
      maxima of ``calcular_mse``, src/mse.py:100-110): leave ``range_a``/
      ``range_b`` as ``None`` — the ranges are the data maxima;
    * **file / BitsStored policy** (``carregar_imagem``'s DICOM branch,
      src/mse.py:18-37): pass the loaded ``2^BitsStored - 1`` ranges.

    Cross-range normalization fires iff ``range_a != range_b`` (the
    reference's ``max1 != max2`` test) and rescales both images toward the
    final range before differencing. ``max_value`` overrides that final
    PSNR/SSIM range only (default ``max(range_a, range_b)``); it does not
    affect the normalization decision. All three are keyword-only — the
    per-image ranges and the final range are different policies and a
    positional float would be ambiguous.

    Routing: the fused one-pass device reduction serves the equal-range case
    (cancellation-free); the normalization branch uses exact float64 host
    math, where float32 moments would cancel.
    """
    original = np.asarray(original)
    stego = np.asarray(stego)
    # when both ranges are supplied, the branch is decidable without touching
    # the pixels — skip the device pass entirely if the host branch fires
    # (otherwise it would sweep both images twice)
    ra = None if range_a is None else float(range_a)
    rb = None if range_b is None else float(range_b)
    if ra is not None and rb is not None and ra != rb and ra > 0 and rb > 0:
        return host_pair_report(original, stego, max_value, range_a=ra, range_b=rb)
    stats = pair_stats(original, stego)
    if ra is None:
        ra = float(stats["max_a"])
    if rb is None:
        rb = float(stats["max_b"])
    if ra != rb and ra > 0 and rb > 0:
        return host_pair_report(original, stego, max_value, range_a=ra, range_b=rb)
    return quality_report(stats, max_value, range_a=ra, range_b=rb)


@partial(jax.jit, static_argnames=("window",))
def ssim_windowed(a: jax.Array, b: jax.Array, max_value: float, window: int = 8) -> jax.Array:
    """Standard mean windowed SSIM (uniform ``window x window`` patches) — a
    capability upgrade over the reference's global-statistics variant."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    k = float(window * window)

    def box(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (window, window), (window, window), "VALID"
        ) / k

    mu1, mu2 = box(af), box(bf)
    s11 = box(af * af) - mu1 * mu1
    s22 = box(bf * bf) - mu2 * mu2
    s12 = box(af * bf) - mu1 * mu2
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2)
    )
    return jnp.mean(ssim_map)
