"""Distributed usage: mesh-parallel pipeline on however many devices exist.

Single host: runs on all local devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual mesh without hardware).

Multi-host pod: call jax.distributed.initialize() first; the same code
runs unchanged with the mesh spanning processes — the histogram psum rides
ICI within a slice and DCN across hosts (see scripts/multihost_sim.py for
a runnable two-process simulation).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

# Some TPU plugins force-set the platform at interpreter start, so the
# documented JAX_PLATFORMS=cpu env alone silently loses the virtual mesh
# (you get the 1 real chip). Pin the CPU backend in-process whenever the
# virtual-device flag is present, before any backend initializes.
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp

from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.container import sharded
from huffman_tpu.ops.tables import device_tables
from huffman_tpu.parallel import pipeline as pp

mesh = pp.data_mesh()
n_dev = len(mesh.devices.reshape(-1))
print(f"mesh: {n_dev} devices, axes {mesh.axis_names}")

rng = np.random.default_rng(0)
data = (rng.zipf(1.4, size=1 << 20) % 250).astype(np.uint8).tobytes()

# 1. Distributed histogram: each device histograms its shard, one psum.
symbols = np.frombuffer(data, np.uint8)[: len(data) & ~1].view("<u2")
hist = pp.distributed_histogram(mesh, jnp.asarray(symbols.astype(np.int32)))
print(f"histogram: {int(np.asarray(hist).sum()):,} pairs counted across the mesh")

# 2. The full distributed compress/verify step (psum + all_gather + pmin).
cb = Codebook.from_frequencies(np.asarray(hist).astype(np.int64))
t = device_tables(cb)
B = 256
nblocks = (symbols.size + B - 1) // B
nblocks += (-nblocks) % n_dev
padded = np.zeros(nblocks * B, np.int32)
padded[: symbols.size] = symbols
valid = np.arange(nblocks * B) < symbols.size
step = pp.compress_decompress_step(mesh)
_, slab, bits, ok = jax.jit(step, static_argnames=("W", "B"))(
    jnp.asarray(padded).reshape(nblocks, B),
    jnp.asarray(valid).reshape(nblocks, B),
    t.enc_codes, t.enc_lens, t.lj_limit, t.base, t.sym_order,
    jnp.asarray(t.max_len, jnp.int32), W=B, B=B,
)
print(f"distributed step: roundtrip ok={bool(ok)}, payload {int(np.asarray(bits).sum()):,} bits")

# 3. Sharded archive with the mesh-built global codebook.
blob = sharded.compress(data, n_shards=n_dev, codebook_mode="global", mesh=mesh)
assert sharded.decompress(blob) == data
print(f"sharded archive: {len(data):,} -> {len(blob):,} bytes over {n_dev} shards")
