"""Multi-host smoke test (VERDICT round-1 item 6): two coordinated processes
on a CPU cluster run the batched pipeline over a global mesh — exercising
``parallel.mesh.initialize_distributed``, cross-process histogram reduction,
and sharded kernels with gloo collectives standing in for DCN."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_pipeline_smoke():
    # bounded by communicate(timeout=240) below, with the sibling worker
    # cleaned up on any failure (pytest-timeout is not installed here, so a
    # timeout mark would be a silent no-op)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)       # never grab the real chip
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err[-2000:]}"
            verdicts = [l for l in out.splitlines() if l.startswith("VERDICT")]
            assert len(verdicts) == 1, out
            outs.append(verdicts[0])
    finally:
        for p in procs:           # no orphan worker on timeout/assert
            if p.poll() is None:
                p.kill()

    # both processes saw the full 4-device world and agree bit-for-bit
    fields = [dict(kv.split("=") for kv in v.split()[1:]) for v in outs]
    assert {f["proc"] for f in fields} == {"0", "1"}
    assert all(f["nproc"] == "2" and f["devices"] == "4" for f in fields)
    assert fields[0]["s"] == fields[1]["s"]
    assert fields[0]["chk_stego"] == fields[1]["chk_stego"]
    assert fields[0]["chk_bits"] == fields[1]["chk_bits"]

    # ... and match a single-process run of the identical flow
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.ops import decompose as decompose_ops
    from codec_tcc_tpu.ops import embed as embed_ops
    from codec_tcc_tpu.ops.histogram import host_histogram
    from codec_tcc_tpu.parallel import batch as batch_par

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 4096, size=(4, 32, 32)).astype(np.uint16)
    payloads = [rng.integers(0, 2, size=150).astype(np.uint8) for _ in range(4)]
    plan = batch_par.plan_batch(imgs, payloads, EncodeConfig(beta=0.4))
    dec = decompose_ops.decompose(
        imgs.reshape(-1, 32), beta=0.4, nbits=16,
        histogram_counts=host_histogram(imgs, 65536),
    )
    assert fields[0]["s"] == str(dec.s)

    chk_stego = 0
    chk_bits = 0
    for i in range(4):
        stego = np.asarray(
            embed_ops.embed(imgs[i], plan.msgs[i], plan.starts[i],
                            plan.lengths[i], plan.offsets[i],
                            np.int32(plan.s[i]), plan.nbits)
        )
        aligned = np.asarray(
            embed_ops.extract_aligned(stego, plan.starts[i], plan.lengths[i],
                                      np.int32(plan.s[i]), plan.nbits)
        )
        chk_stego += int(stego.astype(np.int64).sum())
        chk_bits += int(aligned.astype(np.int64).sum())
    assert fields[0]["chk_stego"] == str(chk_stego)
    assert fields[0]["chk_bits"] == str(chk_bits)
