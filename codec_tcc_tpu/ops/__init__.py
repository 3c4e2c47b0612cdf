"""Device kernels and host planning for the compute path.

Modules:

* :mod:`.bitplanes`      — bit-plane split/merge (fused elementwise)
* :mod:`.histogram`      — scatter-free value histograms + exact host
                           entropy/MI replay
* :mod:`.decompose`      — adaptive cut point (bit-identical to NumPy)
* :mod:`.segments`       — host segment distribution and plane plans
* :mod:`.embed`          — fused XLA embed/extract kernels + XOR maps
* :mod:`.pallas_embed`   — Pallas TPU kernels (~2.4 GPix/s/chip cycle)
* :mod:`.blocks`         — tile popcounts + exact variance ranking
* :mod:`.pee`            — prediction-error-expansion kernels
* :mod:`.metrics`        — fused quality reductions
* :mod:`.callback_codec` — host-callback codec stages inside jit
"""
