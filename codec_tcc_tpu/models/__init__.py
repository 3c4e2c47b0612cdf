"""Embedder model registry.

The reference exposes its three embedding strategies as bare functions
(``lsb_embed_multi_plane`` / ``lsb_embed_block_adaptive`` /
``lsb_embed_block_then_multiplane``, ``/root/reference/src/codec.py:276-487``)
selected by editing ``main()``. Here each strategy is a model class with a
uniform ``encode``/``decode`` surface plus the PEE model the north star names.
"""

from .lsb import (
    BlockAdaptiveEmbedder,
    Embedder,
    HybridEmbedder,
    MultiPlaneEmbedder,
    PeeEmbedder,
    get_embedder,
)

__all__ = [
    "Embedder",
    "MultiPlaneEmbedder",
    "BlockAdaptiveEmbedder",
    "HybridEmbedder",
    "PeeEmbedder",
    "get_embedder",
]
