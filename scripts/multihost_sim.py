"""Two-process multi-host simulation of the distributed pipeline.

Spawned once per simulated host (see tests/test_multihost.py, or run
manually: `python scripts/multihost_sim.py <process_id> <num_processes>
<coordinator_port>`). Each process drives jax.distributed over the CPU
backend with 4 local virtual devices; the mesh spans both processes, so
psum/all_gather actually cross a process boundary (TCP), exercising the
same code path that rides DCN on a real pod (parallel/pipeline.py).

Each process:
1. builds the global mesh over all 8 devices;
2. runs the full distributed compress/verify step (psum histogram, sharded
   encode, all_gather of block bits, sharded decode, pmin correctness);
3. process 0 prints MULTIHOST_OK with the payload bit count.
"""

import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp

from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops.tables import device_tables
from huffman_tpu.parallel import pipeline as pp

assert len(jax.devices()) == 4 * nprocs, jax.devices()
mesh = pp.data_mesh()  # spans all processes

nblocks = 16
B = 128
rng = np.random.default_rng(0)  # same seed everywhere: replicated input
alphabet = rng.choice(MAX_SYMBOLS, size=90, replace=False)
n_pairs = nblocks * B - 11
symbols = rng.choice(alphabet, size=n_pairs).astype(np.int32)
padded = np.zeros(nblocks * B, dtype=np.int32)
padded[:n_pairs] = symbols
valid = np.arange(nblocks * B) < n_pairs
cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
t = device_tables(cb)

step = pp.compress_decompress_step(mesh)
hist, slab, bits, ok = jax.jit(step, static_argnames=("W", "B"))(
    jnp.asarray(padded).reshape(nblocks, B),
    jnp.asarray(valid).reshape(nblocks, B),
    t.enc_codes,
    t.enc_lens,
    t.lj_limit,
    t.base,
    t.sym_order,
    jnp.asarray(t.max_len, jnp.int32),
    W=B,
    B=B,
)
assert int(ok) == 1, "distributed roundtrip mismatch"
assert int(np.asarray(hist).sum()) == n_pairs
if proc_id == 0:
    print(f"MULTIHOST_OK {int(np.asarray(bits).sum())}")
jax.distributed.shutdown()
