"""Run bench's host-boundary e2e batch leg alone on the current backend.

Standalone driver for VERDICT r3 item #2: after the decode side moved to
O(payload) host windows (a969db0), measure `_bench_e2e_batch` on the real
chip without paying the full bench's other stages.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/run_e2e_batch_tpu.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    import bench
    from codec_tcc_tpu.io import dicom

    img, _ = dicom.load_image("/root/reference/images/pe.dcm")
    img = np.ascontiguousarray(img.astype(np.uint16))
    print(f"backend={jax.default_backend()}", flush=True)
    v, bd = bench._bench_e2e_batch(img)
    print(json.dumps({"e2e_batch_mpix_s": round(v, 2),
                      "e2e_batch_stage_ms": bd}), flush=True)


if __name__ == "__main__":
    main()
