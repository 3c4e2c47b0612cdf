"""Container robustness fuzzing: random mutations/truncations of valid
containers must either decode (possibly to different-but-well-formed output)
or fail with the 'Invalid file'-style ValueError/RuntimeError contract —
never an uncaught struct/zlib/reshape/index error (what the CLI handler
catches, cli.py:main)."""

import numpy as np
import pytest

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.pipeline import decode_container, encode_array


@pytest.fixture(scope="module")
def containers():
    rng = np.random.default_rng(5)
    img8 = rng.integers(0, 256, size=(48, 48)).astype(np.uint8)
    img16 = rng.integers(0, 4096, size=(48, 48)).astype(np.uint16)
    out = []
    for img, strat, ver in [
        (img16, "hybrid", 2),
        (img8, "multi_plane", 1),
        (img16, "block_adaptive", 2),
        (img8, "pee", 2),
    ]:
        cfg = EncodeConfig(strategy=strat, codec="deflate" if ver == 2 else "png",
                           container_version=ver, compute_metrics=False)
        payload = rng.integers(0, 2, size=200).astype(np.uint8)
        out.append(encode_array(img, payload, cfg).container)
    return out


_OK = (ValueError, RuntimeError)


def test_truncations_fail_cleanly(containers):
    for blob in containers:
        for cut in (0, 3, 8, 9, 40, len(blob) // 3, len(blob) - 7):
            try:
                decode_container(blob[:cut])
            except _OK:
                pass


def test_random_byte_flips_fail_cleanly(containers):
    rng = np.random.default_rng(6)
    for blob in containers:
        arr = np.frombuffer(blob, dtype=np.uint8)
        for _ in range(40):
            mutated = arr.copy()
            k = rng.integers(1, 4)
            idx = rng.integers(0, arr.size, size=k)
            mutated[idx] ^= rng.integers(1, 256, size=k).astype(np.uint8)
            try:
                decode_container(mutated.tobytes())
            except _OK:
                pass


def test_random_garbage_fails_cleanly():
    rng = np.random.default_rng(7)
    for size in (0, 1, 9, 64, 4096):
        blob = rng.integers(0, 256, size=size).astype(np.uint8).tobytes()
        with pytest.raises(_OK):
            decode_container(blob)


def test_unmutated_containers_decode(containers):
    """Sanity anchor for this module: the pristine containers must decode
    successfully (guards against hardening changes breaking the happy path,
    which the mutation tests alone would not notice)."""
    for blob in containers:
        res = decode_container(blob)
        assert res.payload_bits.size == 200


def test_batch_and_volume_decode_fail_cleanly(rng):
    """The batched/volume decode surfaces keep the 'Invalid file' ValueError
    contract: empty batches, corrupt PEE ext blocks inside an STGV, and
    mixed-strategy batches all fail (or fall back) without raw tracebacks."""
    from codec_tcc_tpu.config import EncodeConfig
    from codec_tcc_tpu.parallel import volume as volume_par
    from codec_tcc_tpu.parallel.batch import decode_batch_containers

    with pytest.raises(_OK):
        decode_batch_containers([])

    # PEE volume with one slice's ext truncated -> clean ValueError
    yy, xx = np.mgrid[0:32, 0:32]
    base = (300 + 60 * np.sin(yy / 5.0) * np.cos(xx / 7.0)).astype(np.int64)
    vol = np.stack([
        (base + rng.integers(-1, 2, size=(32, 32))).clip(0, 500).astype(np.uint16)
        for _ in range(2)
    ])
    cfg = EncodeConfig(strategy="pee", codec="deflate", compute_metrics=False)
    res = volume_par.encode_volume(vol, np.ones(64, np.uint8), cfg)
    blob = bytearray(volume_par.pack_volume(vol, res, cfg))
    # the PEE ext bytes live near each slice's header; flip a length field in
    # the ext region of every slice by brute force: any mutation must either
    # decode or raise _OK, never anything else
    for off in rng.integers(20, len(blob), size=200):
        mutated = bytearray(blob)
        mutated[off] ^= 0xFF
        try:
            volume_par.unpack_volume(bytes(mutated))
        except _OK:
            pass


def test_stgv_mutations_fail_cleanly():
    """STGV volume blobs under truncation and random byte flips: decode
    either succeeds (mutation hit a don't-care byte) or fails with the
    'Invalid file' contract — never a raw struct/zlib/reshape error."""
    import os

    from codec_tcc_tpu.parallel import volume as volume_par

    path = os.path.join(os.path.dirname(__file__), "data",
                        "golden_block_volume.stgv")
    with open(path, "rb") as f:
        blob = f.read()
    for cut in (0, 3, 4, 20, 21 + 8, len(blob) // 2, len(blob) - 5):
        try:
            volume_par.unpack_volume(blob[:cut])
        except _OK:
            pass
    rng = np.random.default_rng(8)
    arr = np.frombuffer(blob, dtype=np.uint8)
    for _ in range(40):
        mutated = arr.copy()
        idx = rng.integers(0, arr.size, size=int(rng.integers(1, 4)))
        mutated[idx] ^= rng.integers(1, 256, size=idx.size).astype(np.uint8)
        try:
            volume_par.unpack_volume(mutated.tobytes())
        except _OK:
            pass
