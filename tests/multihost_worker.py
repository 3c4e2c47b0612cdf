"""Worker process for the multi-host (DCN-analog) smoke test.

Runs the actual pipeline math on a 2-process CPU cluster (gloo collectives):
``parallel.mesh.initialize_distributed`` bring-up, a global dp mesh spanning
both processes, the volume cut point from a cross-process histogram
reduction, and the batched embed+extract kernels over globally-sharded
images with a psum'd payload checksum. Prints one verdict line the spawning
test asserts on.
"""

import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np

from codec_tcc_tpu.parallel import mesh as mesh_par

mesh_par.initialize_distributed(f"127.0.0.1:{port}", nproc, proc_id)
assert jax.process_count() == nproc, jax.process_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.ops import decompose as decompose_ops
from codec_tcc_tpu.ops import embed as embed_ops
from codec_tcc_tpu.parallel import batch as batch_par

mesh = mesh_par.make_mesh(axes=("dp",))
D = jax.device_count()

rng = np.random.default_rng(0)
imgs = rng.integers(0, 4096, size=(D, 32, 32)).astype(np.uint16)
payloads = [rng.integers(0, 2, size=150).astype(np.uint8) for _ in range(D)]
plan = batch_par.plan_batch(imgs, payloads, EncodeConfig(beta=0.4))

# global cut point: per-slice histograms summed ACROSS processes
imgs_g = jax.make_array_from_callback(
    imgs.shape, NamedSharding(mesh, P("dp", None, None)), lambda idx: imgs[idx]
)
hists = batch_par.batched_histograms(imgs_g, 65536)
total = jax.jit(
    lambda h: jnp.sum(h, axis=0), out_shardings=NamedSharding(mesh, P())
)(hists)
dec = decompose_ops.decompose(
    imgs.reshape(-1, 32), beta=0.4, nbits=16,
    histogram_counts=np.asarray(total),
)

# batched embed + extract over the global mesh; payload checksum reduced to
# a replicated scalar (stego itself is not host-gatherable across processes)
rep = NamedSharding(mesh, P())
msgs_d = jax.device_put(jnp.asarray(plan.msgs), NamedSharding(mesh, P("dp", None)))
starts_d = jax.device_put(jnp.asarray(plan.starts), NamedSharding(mesh, P("dp", None)))
lengths_d = jax.device_put(jnp.asarray(plan.lengths), NamedSharding(mesh, P("dp", None)))
offsets_d = jax.device_put(jnp.asarray(plan.offsets), NamedSharding(mesh, P("dp", None)))
s_d = jax.device_put(jnp.asarray(plan.s), NamedSharding(mesh, P("dp")))


@jax.jit
def cycle(im, ms, st, ln, of, sv):
    stego = jax.vmap(embed_ops.embed, in_axes=(0, 0, 0, 0, 0, 0, None))(
        im, ms, st, ln, of, sv, plan.nbits
    )
    aligned = jax.vmap(embed_ops.extract_aligned, in_axes=(0, 0, 0, 0, None))(
        stego, st, ln, sv, plan.nbits
    )
    chk_stego = jnp.sum(stego.astype(jnp.int64))
    chk_bits = jnp.sum(aligned.astype(jnp.int64))
    return chk_stego, chk_bits


chk_stego, chk_bits = jax.jit(
    cycle, out_shardings=(rep, rep)
)(imgs_g, msgs_d, starts_d, lengths_d, offsets_d, s_d)

print(
    f"VERDICT proc={jax.process_index()} nproc={jax.process_count()} "
    f"devices={D} s={dec.s} chk_stego={int(chk_stego)} chk_bits={int(chk_bits)}",
    flush=True,
)
