"""huffman_tpu — a TPU-native Huffman compression framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the CUDA
reference archiver (yechuan51/huffman): 16-bit byte-pair Huffman coding with
a fully parallel encoder — plus the pieces the reference lacks: a parallel
block decoder, a scalable multi-chip/multi-host distribution layer, a native
host runtime, tests and benchmarks.

Public API:
    compress / decompress            — native block container (TPU path)
    compress_reference / decompress_reference — reference-format interop
    Codebook                         — canonical Huffman codebook
"""

from .codebook import Codebook, code_lengths_from_frequencies
from .api import (
    compress,
    decompress,
    compress_reference,
    decompress_reference,
)

__all__ = [
    "Codebook",
    "code_lengths_from_frequencies",
    "compress",
    "decompress",
    "compress_reference",
    "decompress_reference",
]

__version__ = "0.1.0"
