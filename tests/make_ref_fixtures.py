"""Generate genuine reference-written v1 containers (``tests/data/ref_v1_*``).

Runs ``/root/reference/src/codec.py``'s OWN encode path unmodified against the
bundled DICOMs: its decomposition, hybrid embedding, header packing, and
container writing produce every byte of the fixtures' steganographic content.
pydicom is unavailable in this environment, so a minimal shim supplies the
only two things the reference's 'png' codec branch needs from it — a
``FileDataset`` attribute bag and a deflated-DICOM ``save_as`` (delegated to
:mod:`codec_tcc_tpu.io.dicom`; the DICOM wrapper byte layout is independent
of the steganographic content under test).

Reference ``main()`` hardcodes ``start_offset=0`` in the header (defect B4,
src/codec.py:903), which loses the variance-chosen offset and makes its own
hybrid files unrecoverable. The primary fixtures therefore pass the true
offset to ``create_header`` (the field the format reserves, codec.py:630),
computed by the same strict-max scan the embedder runs — so the interop test
can assert exact payload recovery. ``ref_v1_pe_b4.bin`` keeps the B4 behavior
for parse-level compatibility coverage.

Run from the repo root: ``python tests/make_ref_fixtures.py``
"""

from __future__ import annotations

import importlib.util
import io
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from codec_tcc_tpu.io import dicom as our_dicom  # noqa: E402

DEFLATED_UID = "1.2.840.10008.1.2.1.99"


def _install_pydicom_shim() -> None:
    class FileMetaDataset(types.SimpleNamespace):
        pass

    class FileDataset:
        def __init__(self, _name, _dataset, file_meta=None, preamble=b""):
            self.file_meta = file_meta or FileMetaDataset()
            self.preamble = preamble

        def save_as(self, target, write_like_original=None):
            dtype = np.uint16 if self.BitsAllocated == 16 else np.uint8
            arr = np.frombuffer(self.PixelData, dtype=dtype).reshape(
                self.Rows, self.Columns
            )
            ds = our_dicom.build_secondary_capture(arr, bits_stored=self.BitsStored)
            deflated = (
                getattr(self.file_meta, "TransferSyntaxUID", None) == DEFLATED_UID
            )
            blob = our_dicom.to_bytes(ds, deflated=deflated)
            if hasattr(target, "write"):
                target.write(blob)
            else:
                with open(target, "wb") as f:
                    f.write(blob)

    uid_counter = [0]

    def generate_uid():
        uid_counter[0] += 1
        return f"1.2.826.0.1.3680043.8.498.{uid_counter[0]}"

    def dcmread(fp, force=False):
        # the reference's 'png' decompress path reads a deflated DICOM from a
        # BytesIO (src/codec.py:203-206); serve it with our own parser
        data = fp.read() if hasattr(fp, "read") else open(fp, "rb").read()
        return our_dicom.read_bytes(data)

    pydicom = types.ModuleType("pydicom")
    pydicom.config = types.SimpleNamespace(image_handlers=[])
    pydicom.dcmread = dcmread
    dataset_mod = types.ModuleType("pydicom.dataset")
    dataset_mod.FileDataset = FileDataset
    dataset_mod.FileMetaDataset = FileMetaDataset
    uid_mod = types.ModuleType("pydicom.uid")
    uid_mod.ExplicitVRLittleEndian = "1.2.840.10008.1.2.1"
    uid_mod.DeflatedExplicitVRLittleEndian = DEFLATED_UID
    uid_mod.JPEGLSLossless = "1.2.840.10008.1.2.4.80"
    uid_mod.JPEG2000Lossless = "1.2.840.10008.1.2.4.90"
    uid_mod.PYDICOM_IMPLEMENTATION_UID = "1.2.826.0.1.3680043.8.498.1"
    uid_mod.generate_uid = generate_uid
    encaps_mod = types.ModuleType("pydicom.encaps")
    encaps_mod.encapsulate = lambda frags: b"".join(frags)
    handlers_mod = types.ModuleType("pydicom.pixel_data_handlers")
    handlers_mod.pylibjpeg_handler = object()
    pydicom.uid = uid_mod
    pydicom.dataset = dataset_mod

    pandas = types.ModuleType("pandas")  # imported by the reference, unused

    sys.modules.update({
        "pydicom": pydicom,
        "pydicom.dataset": dataset_mod,
        "pydicom.uid": uid_mod,
        "pydicom.encaps": encaps_mod,
        "pydicom.config": types.ModuleType("pydicom.config"),
        "pydicom.pixel_data_handlers": handlers_mod,
        "pandas": pandas,
    })


def _load_reference():
    _install_pydicom_shim()
    spec = importlib.util.spec_from_file_location(
        "ref_codec", "/root/reference/src/codec.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


MESSAGE = "Mensagem de teste para esteganografia!"


def make_fixture(ref, image: np.ndarray, *, keep_b4_zero_offset: bool) -> bytes:
    """The reference main() flow (src/codec.py:847-913) with codec='png'."""
    import tempfile

    message_bits = ref.message_to_bits(MESSAGE)
    global_planes, local_planes = ref.adaptive_modalities_decomposition(
        image, beta=0.4
    )
    s = len(local_planes)
    stego_planes, bitmaps, total_used, seg_lengths, seg_indices = (
        ref.lsb_embed_block_then_multiplane(
            local_planes, message_bits, search_block_size=16
        )
    )
    stego = ref.merge_modalities(global_planes, stego_planes)
    compressed = ref.compress_image(stego, "png")
    import zlib

    blob = zlib.compress(np.stack(bitmaps, axis=0).tobytes())

    if keep_b4_zero_offset:
        start_offset = 0                      # the reference main()'s B4 bug
    else:
        # the variance-chosen offset the embedder used (never returned —
        # defect B4); recomputed with the strict-> scan semantics of
        # codec.py:441-453, which ops.blocks reproduces oracle-exactly
        from codec_tcc_tpu.ops import blocks as block_ops

        counts = np.asarray(block_ops.block_bit_counts(image, 0, 16))
        start_offset = block_ops.best_offset_from_counts(counts, *image.shape, 16)

    header = ref.create_header(
        codec="png", s=s, segments_lengths=seg_lengths,
        segments_indices=seg_indices, bitmaps_blob_size=len(blob),
        width=stego.shape[1], height=stego.shape[0],
        start_offset=start_offset, align_across_planes=False,
    )
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        path = f.name
    try:
        ref.create_binary_file(path, header, compressed, blob)
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def main() -> None:
    ref = _load_reference()
    data_dir = os.path.join(REPO, "tests", "data")
    pe, _ = our_dicom.load_image("/root/reference/images/pe.dcm")
    torax, _ = our_dicom.load_image("/root/reference/images/torax.dcm")

    out = {
        "ref_v1_pe.bin": make_fixture(ref, pe, keep_b4_zero_offset=False),
        "ref_v1_torax.bin": make_fixture(ref, torax, keep_b4_zero_offset=False),
        "ref_v1_pe_b4.bin": make_fixture(ref, pe, keep_b4_zero_offset=True),
    }
    for name, blob in out.items():
        with open(os.path.join(data_dir, name), "wb") as f:
            f.write(blob)
        print(f"wrote tests/data/{name} ({len(blob)} bytes)")
    with open(os.path.join(data_dir, "ref_v1_meta.json"), "w") as f:
        json.dump({"message": MESSAGE, "beta": 0.4, "codec": "png",
                   "strategy": "hybrid", "search_block_size": 16}, f, indent=1)


if __name__ == "__main__":
    main()
