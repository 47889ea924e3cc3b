"""Quickstart: compress/decompress through every surface.

Run from the repo root: python examples/quickstart.py [file]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import huffman_tpu as ht

path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference/romeo.txt")
data = path.read_bytes()
print(f"input: {path} ({len(data):,} bytes)")

# Native HTPU container: TPU-parallel decode, CRC integrity, stored-mode
# fallback for incompressible data.
t0 = time.perf_counter()
blob = ht.compress(data)
t1 = time.perf_counter()
assert ht.decompress(blob) == data
t2 = time.perf_counter()
print(
    f"native container : {len(blob):,} bytes ({100*len(blob)/len(data):.1f}%)"
    f"  encode {1e3*(t1-t0):.1f} ms, decode {1e3*(t2-t1):.1f} ms"
)

# Sharded archive: the scale-out unit (independent shards, one global
# codebook stored once).
blob = ht.compress(data, n_shards=4)
assert ht.decompress(blob) == data
print(f"sharded (4)      : {len(blob):,} bytes")

# Reference-interop format: byte-exact with the CUDA reference's
# .compressed files; its extract binary decodes our output and vice versa.
blob = ht.compress_reference(data)
assert ht.decompress_reference(blob) == data
print(f"reference format : {len(blob):,} bytes")
