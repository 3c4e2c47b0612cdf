"""Adaptive modalities decomposition — TPU formulation.

Reference: ``adaptive_modalities_decomposition`` (``/root/reference/src/
codec.py:561-599``) — a sequential LSB->MSB scan accumulating per-plane mutual
information until it reaches ``beta * H(image)``. As SURVEY §3.3 notes, all
per-plane MI terms are independent, so the early-exit loop becomes a
cumulative-sum compare. Here the device does one histogram pass
(:func:`codec_tcc_tpu.ops.histogram.value_histogram`); the cut point is then
evaluated on host in float64 with the reference's exact summation order, so
``s`` matches NumPy bit-for-bit (golden-tested for pe/torax at beta 0.4/0.8).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from . import histogram as hist_ops

__all__ = ["DecompositionResult", "decompose"]


@dataclass(frozen=True)
class DecompositionResult:
    s: int                       # cut point: number of local (LSB) planes
    nbits: int                   # total planes considered
    entropy: float               # H(image), float64, reference-exact
    target: float                # beta * H
    mi: np.ndarray               # per-plane MI curve, float64, (nbits,)
    cumulative: np.ndarray       # cumulative MI, (nbits,)


def decompose(
    image: jax.Array,
    beta: float = 0.8,
    nbits: Optional[int] = None,
    *,
    histogram_counts: Optional[np.ndarray] = None,
    full_curve: bool = True,
) -> DecompositionResult:
    """Find the adaptive cut point ``s``.

    ``nbits`` defaults to the dtype width like the reference (its defect B6 —
    callers that know DICOM BitsStored should pass it explicitly). Passing a
    precomputed ``histogram_counts`` (e.g. a ``psum``-ed per-shard histogram
    from the mesh pipeline) skips the device pass entirely.

    ``full_curve=False`` stops the MI scan at the cut point like the
    reference's early-exit loop — ``s``/``entropy``/``target`` and the curve
    up to ``s`` are unchanged, entries past it stay 0. Batch planners use
    this (they only consume ``s``); callers reporting the curve (the CLI's
    ``mi_curve``) keep the default.
    """
    itemsize = np.dtype(image.dtype).itemsize
    if nbits is None:
        nbits = itemsize * 8
    max_val = 255 if itemsize == 1 else 65535
    size = int(image.size)

    if histogram_counts is None:
        if isinstance(image, np.ndarray):
            # host image: np.bincount is exact and faster than a device
            # round-trip for a single image
            histogram_counts = hist_ops.host_histogram(image, max_val + 1)
        else:
            histogram_counts = np.asarray(
                hist_ops.value_histogram(image, max_val + 1)
            )

    mi, h = hist_ops.plane_mi_curve(
        histogram_counts, size, nbits, max_val,
        stop_at_beta=None if full_curve else beta,
    )

    target = beta * h
    # replay the reference's sequential float64 accumulation (codec.py:580-593)
    cumulative = np.zeros(nbits, dtype=np.float64)
    acc = 0.0
    s = 1
    found = False
    for i in range(nbits):
        acc += mi[i]
        cumulative[i] = acc
        if not found and acc >= target:
            s = i + 1
            found = True
    return DecompositionResult(
        s=s, nbits=nbits, entropy=h, target=target, mi=mi, cumulative=cumulative
    )
