"""codec_tcc_tpu — a TPU-native reversible-steganography framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference codec
``wesleyfn/codec-tcc`` (see SURVEY.md for the structural analysis it follows):
adaptive bit-plane decomposition, multi-strategy LSB embedding with XOR
location maps, a true PEE (prediction-error expansion) embedder, a versioned
STGC container, symmetric lossless transport codecs, exact payload extraction
and original-image restoration, fused on-device quality metrics, and
data-parallel batch/volume pipelines over a device mesh.
"""

from .analyze import QualityAnalyzer
from .config import EncodeConfig
from .errors import CapacityError
from .models import get_embedder
from .pipeline import (
    DecodeResult,
    EncodeResult,
    analyze_pair,
    decode_container,
    decode_file,
    encode_array,
    encode_dicom,
)

__version__ = "0.1.0"

__all__ = [
    "CapacityError",
    "EncodeConfig",
    "EncodeResult",
    "DecodeResult",
    "QualityAnalyzer",
    "encode_array",
    "encode_dicom",
    "decode_container",
    "decode_file",
    "analyze_pair",
    "get_embedder",
    "__version__",
]
