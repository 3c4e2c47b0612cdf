"""Runtime-environment probes shared by `bench.py` and the CLI `doctor`.

The chip and this host's single core are both serialized resources
(CLAUDE.md: 'never run two TPU processes concurrently'), so every
measurement artifact and health report names the other live python
processes — a deflated number is then attributable instead of silent.
"""

from __future__ import annotations

import os
from typing import List


def probe_contention() -> List[str]:
    """Other live python processes: ``pid= etime= cpu= <cmd>`` rows.

    Excludes this process, its ancestor chain (the shell / harness that
    launched us), and the axon tunnel infra (``.tpu_init.py``, which always
    runs alongside the plugin). Returns ``["probe-failed"]`` if ``ps`` is
    unavailable rather than raising — callers embed the result in reports.
    """
    import subprocess

    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,etime,pcpu,args"],
            capture_output=True, text=True, timeout=10,
        ).stdout
    except Exception:
        return ["probe-failed"]
    me = os.getpid()
    ancestors = set()
    pid = me
    for _ in range(12):
        try:
            with open(f"/proc/{pid}/stat") as f:
                # the comm field (2nd) may itself contain spaces or ')';
                # everything after the LAST ')' is the fixed-format tail,
                # whose 2nd token is the ppid
                pid = int(f.read().rsplit(")", 1)[1].split()[1])
        except Exception:
            break
        if pid <= 1:
            break
        ancestors.add(pid)
    rows = []
    for line in out.splitlines()[1:]:
        parts = line.split(None, 3)
        if len(parts) < 4 or "python" not in parts[3]:
            continue
        try:
            p = int(parts[0])
        except ValueError:
            continue
        if p == me or p in ancestors or ".tpu_init.py" in parts[3]:
            continue
        rows.append(f"pid={p} etime={parts[1]} cpu={parts[2]} {parts[3][:90]}")
    return rows
