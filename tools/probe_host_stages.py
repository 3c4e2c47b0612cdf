"""On-chip probe: why are batch_plan / batch_unpack slower in the TPU process?

Separates three hypotheses for the round-4 e2e gap (BENCH healthy artifact:
batch_unpack 641 ms on TPU vs 69.5 ms CPU backend, batch_plan 277 vs 79.8):
  (a) fresh >mmap-threshold allocations fault slower in the heavyweight
      TPU-runtime process (per-image chunking would fix it — batch_restore
      already runs per-image and hits 61 ms),
  (b) axon runtime/tunnel threads steal the single core after transfers,
  (c) the stage includes an unattributed device round-trip (hybrid scan).

Prints one JSON object.  Run standalone on the real chip:
    timeout 600 python tools/probe_host_stages.py
"""
import json
import time

import numpy as np


def t(fn, reps=5):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(1e3 * (time.perf_counter() - t0), 2))
    return out


def main() -> None:
    res: dict = {}
    rng = np.random.default_rng(4)
    B, h, w = 32, 512, 512
    imgs = rng.integers(0, 65536, size=(B, h, w), dtype=np.uint16)

    # -- host stages BEFORE any device contact ------------------------------
    def bincounts():
        return np.stack([
            np.bincount(im.reshape(-1), minlength=65536) for im in imgs
        ])

    res["bincount_pre_ms"] = t(bincounts)

    from codec_tcc_tpu.utils import bits as bit_utils

    s = 6
    packed = rng.integers(0, 256, size=(B, s, h * w // 8), dtype=np.uint8)

    def unpack_whole():
        diff = bit_utils.packed_planes_to_diff(packed, np.uint16)
        return imgs ^ diff.reshape(B, h, w)

    def unpack_per_image():
        stego = np.empty_like(imgs)
        for i in range(B):
            stego[i] = imgs[i] ^ bit_utils.packed_planes_to_diff(
                packed[i], np.uint16
            ).reshape(h, w)
        return stego

    res["unpack_whole_pre_ms"] = t(unpack_whole)
    res["unpack_per_image_pre_ms"] = t(unpack_per_image)
    a = unpack_whole()
    b = unpack_per_image()
    res["unpack_equal"] = bool((a == b).all())

    # -- device init + transfers --------------------------------------------
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    res["device"] = str(dev)
    res["init_s"] = round(time.perf_counter() - t0, 1)

    def upload():
        d = jnp.asarray(imgs)
        jax.block_until_ready(d)
        return d

    t0 = time.perf_counter()
    imgs_dev = upload()
    res["upload_first_ms"] = round(1e3 * (time.perf_counter() - t0), 1)
    res["upload_16mb_ms"] = t(upload, reps=3)

    packed_dev = jnp.asarray(packed)
    jax.block_until_ready(packed_dev)

    def download_packed():
        return np.asarray(packed_dev)

    def download_imgs():
        return np.asarray(imgs_dev)

    res["download_6mb_ms"] = t(download_packed, reps=3)
    res["download_16mb_ms"] = t(download_imgs, reps=3)

    # -- the same host stages AFTER device traffic --------------------------
    res["bincount_post_ms"] = t(bincounts)
    res["unpack_whole_post_ms"] = t(unpack_whole)
    res["unpack_per_image_post_ms"] = t(unpack_per_image)

    # immediately after a fresh download (tunnel wind-down window)
    np.asarray(imgs_dev)
    res["unpack_whole_right_after_download_ms"] = t(unpack_whole, reps=2)

    # -- the hybrid scan hiding inside batch_plan ----------------------------
    from codec_tcc_tpu.parallel import batch as batch_par

    def hybrid_scan():
        return batch_par.hybrid_base_offsets(imgs_dev, h, w, 8)

    res["hybrid_scan_first_ms"] = t(hybrid_scan, reps=1)
    res["hybrid_scan_ms"] = t(hybrid_scan, reps=3)

    # -- full plan stage as the bench runs it --------------------------------
    from codec_tcc_tpu.config import EncodeConfig

    cfg = EncodeConfig(strategy="hybrid", codec="deflate",
                       compute_metrics=False)
    payloads = [rng.bytes(8_000) for _ in range(B)]

    def plan_stage():
        hists = bincounts()
        return batch_par.plan_batch(
            imgs_dev, payloads, cfg, histograms=hists, nbits=16
        )

    res["plan_stage_first_ms"] = t(plan_stage, reps=1)
    res["plan_stage_ms"] = t(plan_stage, reps=3)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
