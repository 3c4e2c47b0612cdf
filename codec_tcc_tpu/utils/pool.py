"""Host-shell thread-pool sizing.

The container/codec host shell (zlib, XOR-map pack, container framing) is
CPU-bound numpy/zlib work. Sizing pools by batch size alone oversubscribed
single-core serving hosts — round 3's ``batch_pack`` breakdown measured ~3x
the serial cost with 8 threads fighting one core — so pools are capped by
the cores actually available.
"""

from __future__ import annotations

import os


def host_workers(n_items: int, cap: int = 8) -> int:
    """Worker count for a host-shell pool over ``n_items`` tasks: at most
    ``cap``, never more than items or available cores, always >= 1."""
    cores = os.cpu_count() or 1
    return max(1, min(cap, n_items, cores))
