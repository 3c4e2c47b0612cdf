"""Serving daemon tests: a real daemon subprocess on the CPU backend,
driven through the Unix-socket JSON-lines protocol (serve.py — the
beyond-parity warm-serving component; one daemon per chip in production).
"""

import os
import subprocess
import sys
import tempfile
import time

import numpy as np
import pytest

from codec_tcc_tpu.serve import request


@pytest.fixture(scope="module")
def daemon():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tempfile.mkdtemp(prefix="ct_serve_")
    sock = os.path.join(work, "ct.sock")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)       # never grab the real chip
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "codec_tcc_tpu", "serve", "--socket", sock,
         "--conn-timeout", "5"],
        env=env, cwd=work,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.monotonic() + 120
        last = None
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise RuntimeError(f"daemon died:\n{out}\n{err[-2000:]}")
            try:
                r = request(sock, {"op": "ping"}, timeout=10)
                assert r["ok"]
                break
            except (OSError, ConnectionError) as exc:
                last = exc
                time.sleep(0.5)
        else:
            raise RuntimeError(f"daemon never came up: {last}")
        yield {"sock": sock, "work": work, "proc": proc}
        r = request(sock, {"op": "shutdown"}, timeout=30)
        assert r["ok"]
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def _dcm(work: str, name: str, arr: np.ndarray) -> str:
    from codec_tcc_tpu.io import dicom

    path = os.path.join(work, name)
    dicom.save_image(arr, path)
    return path


def test_ping_reports_backend(daemon):
    r = request(daemon["sock"], {"op": "ping"})
    assert r["ok"] and r["op"] == "ping"
    assert r["backend"] == "cpu" and r["device_count"] >= 1
    assert r["pid"] == daemon["proc"].pid
    assert isinstance(r["ops_served"], dict)  # per-op counters
    assert r["requests_served"] == sum(r["ops_served"].values())


def test_encode_decode_roundtrip(daemon):
    work, sock = daemon["work"], daemon["sock"]
    rng = np.random.default_rng(10)
    img = rng.integers(0, 4096, size=(64, 64)).astype(np.uint16)
    src = _dcm(work, "in.dcm", img)
    out = os.path.join(work, "out.stgc")
    r = request(sock, {
        "op": "encode", "input": src, "output": out,
        "message": "warm serving round trip",
        "config": {"strategy": "hybrid", "codec": "deflate"},
    })
    assert r["ok"], r
    assert r["s"] >= 1 and r["container_bytes"] == os.path.getsize(out)
    assert "metrics" in r and r["metrics"]["psnr"] > 30
    assert r["wall_ms"] > 0

    prefix = os.path.join(work, "dec")
    d = request(sock, {"op": "decode", "input": out, "output_prefix": prefix})
    assert d["ok"], d
    with open(d["payload_path"], encoding="utf-8") as f:
        assert f.read() == "warm serving round trip"
    from codec_tcc_tpu.io import dicom

    restored, _ = dicom.load_image(d["original_path"])
    np.testing.assert_array_equal(restored, img)

    # no output_prefix -> payload handed back inline
    import base64

    d2 = request(sock, {"op": "decode", "input": out})
    assert d2["ok"] and base64.b64decode(d2["payload_b64"]) == \
        b"warm serving round trip"


def test_analyze_pair(daemon):
    work, sock = daemon["work"], daemon["sock"]
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4096, size=(32, 32)).astype(np.uint16)
    b = a.copy()
    b[0, 0] ^= 1
    r = request(sock, {
        "op": "analyze",
        "original": _dcm(work, "a.dcm", a),
        "stego": _dcm(work, "b.dcm", b),
    })
    assert r["ok"], r
    assert r["changed_pixels"] == 1 and "verdict" in r


def test_volume_roundtrip_over_daemon(daemon):
    work, sock = daemon["work"], daemon["sock"]
    rng = np.random.default_rng(12)
    vol = rng.integers(0, 4096, size=(3, 32, 32)).astype(np.uint16)
    src = os.path.join(work, "vol.npy")
    np.save(src, vol)
    out = os.path.join(work, "vol.stgv")
    r = request(sock, {
        "op": "encode_volume", "inputs": [src], "output": out,
        "message": "volume over the daemon",
        "config": {"strategy": "multi_plane", "codec": "deflate"},
    })
    assert r["ok"], r
    assert r["slices"] == 3 and r["s"] >= 1
    assert r["container_bytes"] == os.path.getsize(out)

    prefix = os.path.join(work, "vdec")
    d = request(sock, {
        "op": "decode_volume", "input": out,
        "output_prefix": prefix, "dicom": True,
    })
    assert d["ok"], d
    with open(d["payload_path"], "rb") as f:
        assert f.read() == b"volume over the daemon"
    np.testing.assert_array_equal(np.load(d["original_path"]), vol)
    from codec_tcc_tpu.io import dicom

    frames, _ = dicom.load_image(d["stego_dicom"])
    np.testing.assert_array_equal(frames, np.load(d["stego_path"]))


def test_capacity_over_daemon(daemon):
    work, sock = daemon["work"], daemon["sock"]
    y, x = np.mgrid[0:32, 0:32]
    arr = (60 * y + 40 * x).astype(np.uint16)
    path = _dcm(work, "cap.dcm", arr)
    r = request(sock, {"op": "capacity", "input": path})
    assert r["ok"], r

    from codec_tcc_tpu.pipeline import capacity_report

    # dicom.save_image writes BitsStored for the value range; the daemon op
    # must match the library on the same loaded pair
    from codec_tcc_tpu.io import dicom as dicom_io

    loaded, ds = dicom_io.load_image(path)
    exp = capacity_report(loaded, bits_stored=ds.bits_stored)
    for k in ("cut_point_s", "lsb_bits", "pee_bits", "reference_rule_bits"):
        assert r[k] == exp[k], k
    assert r["pee_bits"] > 0


def test_silent_connection_does_not_wedge_daemon(daemon):
    """A client that connects and never sends must be dropped after
    --conn-timeout (5 s here) so the next client gets served — the daemon
    serves one connection at a time."""
    import socket as socket_mod

    hostage = socket_mod.socket(socket_mod.AF_UNIX, socket_mod.SOCK_STREAM)
    hostage.connect(daemon["sock"])
    try:
        # wake the accept loop so the daemon is blocked reading the hostage
        time.sleep(0.2)
        t0 = time.monotonic()
        r = request(daemon["sock"], {"op": "ping"}, timeout=60)
        assert r["ok"]
        assert time.monotonic() - t0 < 30  # dropped at ~5 s, not wedged
    finally:
        hostage.close()


def test_second_daemon_refuses_live_socket(daemon):
    """Starting serve() on a socket a live daemon owns must raise instead
    of unlinking it (which would orphan the running daemon)."""
    from codec_tcc_tpu.serve import serve

    with pytest.raises(RuntimeError, match="already serving"):
        serve(daemon["sock"])
    # the live daemon is untouched
    assert request(daemon["sock"], {"op": "ping"})["ok"]


def test_sigterm_exits_cleanly(tmp_path):
    """SIGTERM (orchestrated restart) must unlink the socket and exit 0."""
    import signal

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sock = str(tmp_path / "term.sock")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "codec_tcc_tpu", "serve", "--socket", sock],
        env=env, cwd=str(tmp_path),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline and not os.path.exists(sock):
            if proc.poll() is not None:
                out, err = proc.communicate()
                raise RuntimeError(f"daemon died:\n{out}\n{err[-2000:]}")
            time.sleep(0.2)
        assert os.path.exists(sock)
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=30) == 0
        assert not os.path.exists(sock)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_errors_do_not_kill_daemon(daemon):
    sock = daemon["sock"]
    r = request(sock, {"op": "transmogrify"})
    assert not r["ok"] and "unknown op" in r["error"]
    r = request(sock, {"op": "encode", "input": "/nope.dcm",
                       "output": "/tmp/x", "message": "m"})
    assert not r["ok"] and r["error_type"] in ("FileNotFoundError", "ValueError")
    r = request(sock, {"op": "encode", "input": "/nope.dcm", "output": "/tmp/x",
                       "message": "m", "payload_b64": "bQ=="})
    assert not r["ok"] and "exactly one" in r["error"]
    r = request(sock, {"op": "encode", "input": "/nope.dcm", "output": "/tmp/x",
                       "message": "m", "config": {"bogus_knob": 1}})
    assert not r["ok"] and "bogus_knob" in r["error"]
    assert request(sock, {"op": "ping"})["ok"]    # daemon survived them all


def test_fused_batch_over_daemon(daemon):
    work, sock = daemon["work"], daemon["sock"]
    rng = np.random.default_rng(12)
    paths = [
        _dcm(work, f"b{i}.dcm",
             rng.integers(0, 4096, size=(64, 64)).astype(np.uint16))
        for i in range(3)
    ]
    # mixed geometry: buckets per shape group (round-3), items in input order
    paths.append(
        _dcm(work, "odd.dcm",
             rng.integers(0, 4096, size=(32, 48)).astype(np.uint16))
    )
    enc_dir = os.path.join(work, "enc")
    r = request(sock, {
        "op": "encode_batch", "inputs": paths, "output_dir": enc_dir,
        "message": "batched", "config": {"compute_metrics": False},
    })
    assert r["ok"], r
    assert r["fused"] and len(r["items"]) == 4
    assert [it["input"] for it in r["items"]] == paths
    assert all(os.path.getsize(it["output"]) == it["container_bytes"]
               for it in r["items"])

    dec_dir = os.path.join(work, "dec_batch")
    d = request(sock, {
        "op": "decode_batch",
        "inputs": [it["output"] for it in r["items"]],
        "output_dir": dec_dir,
    })
    assert d["ok"], d
    for it in d["items"]:
        with open(it["payload_path"], encoding="utf-8") as f:
            assert f.read() == "batched"
        assert os.path.exists(it["original_path"])
