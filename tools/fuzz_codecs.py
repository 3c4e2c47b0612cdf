"""Randomized robustness campaign over the untrusted-input decoders.

Every byte stream the framework parses can come from disk/network, so the
decoders must fail with clean Python exceptions — never a crash, hang,
``MemoryError`` (allocation bomb) or ``SystemExit`` — on arbitrary
corruption. The container/STGV formats already have such a campaign
(``tests/test_container_fuzz.py``); this tool covers the remaining parsers:

* ``jls``     — the from-scratch C++ JPEG-LS decoder (ctypes)
* ``jxl``     — the in-process libjxl shim (when available)
* ``deflate`` / ``png`` / ``j2k`` — the pure-Python/PIL codec entries
* ``dicom``   — ``io.dicom.read_bytes`` + ``pixel_array`` across all five
  written transfer syntaxes (Explicit/Implicit/Deflated VR LE,
  encapsulated JPEG-LS and JPEG 2000)

Mutations per seed blob: random 1-8 byte flips, truncations, and
magic-preserving random garbage. The process caps its own address space
(``RLIMIT_AS``) so an unbounded allocation surfaces as a fast, attributable
failure instead of an OOM kill.

Usage:  python tools/fuzz_codecs.py [target ...] [--iters N] [--seed S]
Exit 0 = campaign clean; 1 = a decoder misbehaved (details on stdout JSON).
A hard crash (segfault in native code) kills this process — run it under a
wrapper (the pytest harness does) to catch that as a nonzero return code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Outcomes that are NOT acceptable on corrupt input.
_FORBIDDEN = (MemoryError, SystemExit, KeyboardInterrupt)

# Under sanitizers (tools/fuzz_asan.sh sets CODEC_TCC_ASAN=1 and preloads
# libasan) the RLIMIT_AS cap must stay off: ASan reserves ~20 TB of virtual
# address space for shadow memory at startup, so any address-space cap
# aborts the interpreter before the first decode. The allocation-bomb
# defense is the plain -O3 campaign's job; the ASan campaign hunts memory
# errors instead.
_ASAN = os.environ.get("CODEC_TCC_ASAN") == "1"


def _limit_memory(gb: float = 2.0) -> None:
    if _ASAN:
        return
    try:
        import resource

        cap = int(gb * (1 << 30))
        soft, hard = resource.getrlimit(resource.RLIMIT_AS)
        resource.setrlimit(resource.RLIMIT_AS, (cap, hard))
    except Exception:
        pass  # best effort (not available on all platforms)


def _seed_blobs(target: str) -> list:
    """Valid encoded blobs whose mutations the campaign decodes."""
    rng = np.random.default_rng(0)
    smooth = (
        np.add.outer(np.arange(48), np.arange(64)).astype(np.uint16) * 7 % 3000
    )
    noisy8 = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    images = [smooth, noisy8]

    if target == "dicom":
        from codec_tcc_tpu.io import dicom

        blobs = []
        for img in images:
            for ts in (
                dicom.EXPLICIT_VR_LE,
                dicom.IMPLICIT_VR_LE,
                dicom.DEFLATED_EXPLICIT_VR_LE,
                dicom.JPEGLS_LOSSLESS,
                dicom.JPEG2000_LOSSLESS,
            ):
                try:
                    blobs.append(dicom.to_bytes(
                        dicom.build_secondary_capture(img), transfer_syntax=ts
                    ))
                except Exception:
                    continue  # syntax unavailable in this environment
        return blobs

    from codec_tcc_tpu.io import codecs

    codec = codecs.get(target)
    return [codec.encode(img) for img in images]


def _decode(target: str, blob: bytes) -> None:
    if target == "dicom":
        from codec_tcc_tpu.io import dicom

        ds = dicom.read_bytes(blob)
        ds.pixel_array
        return
    from codec_tcc_tpu.io import codecs

    codecs.get(target).decode(blob)


def _mutations(blob: bytes, rng: np.random.Generator, iters: int):
    n = len(blob)
    for i in range(iters):
        kind = i % 3
        if kind == 0:  # byte flips anywhere (headers included)
            b = bytearray(blob)
            for pos in rng.integers(0, n, size=int(rng.integers(1, 9))):
                b[int(pos)] ^= int(rng.integers(1, 256))
            yield bytes(b)
        elif kind == 1:  # truncation
            yield blob[: int(rng.integers(0, n))]
        else:  # valid prefix + random garbage tail
            keep = int(rng.integers(2, max(3, n // 4)))
            tail = rng.integers(0, 256, size=n - keep).astype(np.uint8)
            yield blob[:keep] + tail.tobytes()


def run_target(target: str, iters: int, seed: int) -> dict:
    rng = np.random.default_rng(seed)
    blobs = _seed_blobs(target)
    stats: dict = {"target": target, "blobs": len(blobs), "decoded_ok": 0,
                   "clean_errors": 0, "failures": [], "asan": _ASAN}
    for bi, blob in enumerate(blobs):
        _decode(target, blob)  # the unmutated blob must decode
        for mi, mut in enumerate(_mutations(blob, rng, iters)):
            try:
                _decode(target, mut)
                stats["decoded_ok"] += 1
            except _FORBIDDEN as exc:
                stats["failures"].append(
                    f"blob{bi} mut{mi}: forbidden {type(exc).__name__}: "
                    f"{exc}"[:160]
                )
            except Exception:
                stats["clean_errors"] += 1
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("targets", nargs="*",
                   default=["jls", "deflate", "png", "j2k", "dicom"],
                   help="decoders to fuzz (also: jxl)")
    p.add_argument("--iters", type=int, default=200,
                   help="mutations per seed blob")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    _limit_memory()
    results = []
    failed = False
    for target in args.targets:
        res = run_target(target, args.iters, args.seed)
        failed |= bool(res["failures"])
        results.append(res)
        print(json.dumps(res), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
