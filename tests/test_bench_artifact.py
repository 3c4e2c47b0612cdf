"""The driver-facing bench line must survive the 2,000-char stdout tail.

The driver records only a 2,000-char tail of bench.py's stdout; round 4's
fat artifact line truncated mid-stage-dict and lost most throughput fields
(VERDICT weak #4). ``bench._slim_line`` is the fix: full object preserved
to docs/artifacts/, stdout carrying a slim line that provably fits with
every ``*_mpix_s`` figure, the e2e split, serve latencies, and the headline
LAST. The serve leg itself (``bench._bench_serve``) is exercised in-thread
on the CPU backend.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fat_obj():
    """A round-4-shaped artifact object, padded heavier than reality."""
    stage_junk = {f"stage_{i}": round(1.234 * i, 2) for i in range(40)}
    return {
        "extra": {
            "rep_times_ms": [6.99, 7.05, 6.58, 6.83, 6.72],
            "sync_floor_ms": 24.36,
            "headline_stage_s": stage_junk,
            "lsb_cycle_2048_mpix_s": 10055.4,
            "pee_cycle_mpix_s": 2454.9,
            "pee_cycle_2048_mpix_s": 3639.6,
            "pee_cycle_odd_640x480_mpix_s": 2366.0,
            "block_cycle_mpix_s": 1038.3,
            "block_cycle_detail": {"rep_ms": [64.2] * 5, "floor_ms": 24.74,
                                   "device_mpix_s": 1190.2},
            "volume_cycle_mpix_s": 1289.1,
            "volume_stage_s": {"encode_volume_s": 12.91, "floor_ms": 8.0,
                               "device_mpix_s": 9800.0,
                               "cycle_rep_ms": [12.17] * 5},
            "e2e_encode_decode_mpix_s": 4.63,
            "e2e_stage_ms_per_image": stage_junk,
            "e2e_batch_mpix_s": 10.2,
            "e2e_batch_stage_ms": {
                **stage_junk, "batch_total": 825.46,
                "split_tunnel_ms": 118.7, "split_host_shell_ms": 638.0,
                "split_device_residual_ms": 68.8,
            },
            "serve_ms": {"ping_ms": 1.2, "ping_server_ms": 0.0,
                         "encode_ms": 55.0, "encode_server_ms": 54.0,
                         "decode_ms": 25.0, "decode_server_ms": 24.0,
                         "encode_batch_4_ms": 150.0,
                         "encode_batch_4_server_ms": 149.0,
                         "decode_batch_4_ms": 80.0,
                         "decode_batch_4_server_ms": 79.0},
            "stage_wall_s": stage_junk,
            "worker_attempts": ["probe0: device init timeout (300s)"] * 3,
            "cpu_backend_e2e": {
                "note": "x" * 200, "contention": [],
                "u16_per_image_mpix_s": 12.75,
                "u16_per_image_stage_ms": stage_junk,
                "u16_batch_mpix_s": 15.43,
                "u16_batch_stage_ms": stage_junk,
                "u8_per_image_mpix_s": 24.02,
                "u8_batch_mpix_s": 21.65,
            },
            "pee_cycle_odd_error": "JaxRuntimeError: whatever",
            "fallbacks": ["packed: SomeError: " + "y" * 150],
        },
        "metric": "embed+extract throughput (512x512 uint16, batch 256)",
        "backend": "packed",
        "unit": "MPix/s/chip",
        "vs_baseline": 1002.16,
        "value": 10322.2,
    }


def test_slim_line_fits_and_is_complete():
    fat = _fat_obj()
    line = bench._slim_line(fat, "docs/artifacts/bench_x_run.json")
    assert len(line) <= 2000
    obj = json.loads(line)
    # every throughput figure survives
    for k in ("lsb_cycle_2048_mpix_s", "pee_cycle_mpix_s",
              "pee_cycle_2048_mpix_s", "pee_cycle_odd_640x480_mpix_s",
              "block_cycle_mpix_s", "block_device_mpix_s",
              "volume_cycle_mpix_s", "volume_device_mpix_s",
              "e2e_encode_decode_mpix_s", "e2e_batch_mpix_s",
              "cpu_u16_batch_mpix_s", "cpu_u16_per_image_mpix_s"):
        assert k in obj["extra"], k
    for k in ("e2e_split_tunnel_ms", "e2e_split_host_shell_ms",
              "serve_encode_ms", "artifact"):
        assert k in obj["extra"], k
    # headline fields present and LAST in the line
    assert obj["value"] == 10322.2
    assert obj["vs_baseline"] == 1002.16
    assert line.rstrip().endswith(str(obj["value"]) + "}")
    # a 2000-char tail of any surrounding output still parses the line
    assert json.loads(("x" * 5000 + "\n" + line)[-2000:].split("\n")[-1])


def test_slim_line_outage_shape():
    obj = {
        "metric": "embed+extract throughput (512x512 uint16, batch 256)",
        "value": 0.0, "unit": "MPix/s/chip", "vs_baseline": 0.0,
        "backend": "none",
        "extra": {
            "error": "TPU tunnel unreachable " + "z" * 300,
            "worker_attempts": ["probe0: timeout"] * 4,
            "last_healthy_run": {"value": 9823.1, "unit": "MPix/s/chip",
                                 "backend": "packed",
                                 "artifact": "docs/artifacts/x.json"},
            "cpu_backend_e2e": "cpu-e2e worker timeout (900s)",
        },
    }
    line = bench._slim_line(obj, None)
    assert len(line) <= 2000
    parsed = json.loads(line)
    assert parsed["value"] == 0.0
    assert "error" in parsed["extra"]
    assert parsed["extra"]["last_healthy_run"]["value"] == 9823.1


def test_bench_serve_leg_cpu(tmp_path):
    """The serve bench leg end-to-end on the CPU backend: daemon thread,
    real socket, warm request medians for every measured op."""
    rng = np.random.default_rng(0)
    image = rng.integers(0, 4096, (64, 64)).astype(np.uint16)
    out = bench._bench_serve(image, reps=2)
    for k in ("ping_ms", "encode_ms", "decode_ms", "encode_batch_4_ms",
              "decode_batch_4_ms"):
        assert k in out and out[k] > 0
        assert k.replace("_ms", "_server_ms") in out
