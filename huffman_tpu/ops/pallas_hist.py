"""Pallas TPU kernel: 65,536-bin byte-pair histogram on the MXU.

The XLA formulation (ops/histogram.histogram_matmul) computes the same
one-hot outer products but pays scan-iteration overhead and materializes
per-chunk one-hots through HBM (15.6 ms / 16 MiB measured at its best
chunk size). Here the (256, C) TRANSPOSED one-hots are built directly in
VMEM — symbols naturally sit along lanes, class ids along sublanes, so no
transpose exists anywhere — as int8, and an int8 lane-contracting
(256,C)x(256,C)->(256,256) matmul accumulates into a VMEM int32 scratch
across grid cells (int8 measured 1.45x the bf16 variant; int32
accumulation is exact to 2^31 counts, beyond the container's 4 GiB
bound, so no input splitting is needed).

The one-hot COMPARE dtype is a knob (``cmp_dtype``): the byte values map
bijectively into int16 (directly) and int8 (wrapping 0..255 ->
-128..127), so equality survives the cast, and narrower lanes pack 2x/4x
denser on the VPU — the compare stage was the measured VPU floor
(CLAUDE.md: ~512 compare-ops/symbol in int32). MEASURED (r3/r4, v5e):
int8 vector cmpi FAILS Mosaic compile on this target ("Target does not
support this comparison"), so "int8" exists for the perf harness to
probe future toolchains only; "int16" is the candidate tier. ``cell``
(symbols per grid step) is the other knob; defaults are the shipping
config (scripts/perf_hist.py sweeps both, surviving per-variant compile
failures).

Replaces the reference's global-memory atomicAdd loop
(Compressor.cu:38-48); a TPU has no atomics — the MXU IS the accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_SYMBOLS
from .pallas_decode import LANES

# Symbols per grid cell. MEASURED (r4 perf_hist, 16 MiB): 4096/8192/16384
# = 5.16/5.01/4.91 ms — wider cells amortize grid overhead slightly; the
# (256, C) int8 one-hot pair at C=16384 (8 MiB) still fits VMEM.
_C = 16384


def _hist_kernel(sym_ref, out_ref, acc_ref, *, cells: int, C: int,
                 cmp_dtype):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sym = sym_ref[:].reshape(1, C)
    if cmp_dtype in ("int8_arith", "int16_arith"):
        # Narrow-lane one-hot WITHOUT cmpi (vector int8/int16 compares do
        # not legalize on the v5e): in the wrapped narrow domain,
        # y = x - i is 0 iff x == i, and (y | -y) has the sign bit set iff
        # y != 0 (including y = MIN_INT, where -y wraps to MIN_INT), so
        # ((y | -y) >> (bits-1)) + 1 is the 0/1 one-hot — five arithmetic
        # ops on 4x/2x-packed lanes instead of one compare on int32 lanes.
        dt = jnp.int8 if cmp_dtype == "int8_arith" else jnp.int16
        sh = 7 if cmp_dtype == "int8_arith" else 15
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, C), 0).astype(dt)
        planes = []
        for v in (sym >> 8, sym & 0xFF):
            y = jnp.broadcast_to(v.astype(dt), (256, C)) - ids
            planes.append(((y | -y) >> sh) + dt(1))
        hi, lo = planes
    elif jnp.dtype(cmp_dtype) != jnp.dtype(jnp.int32):
        # Byte values land bijectively in the narrow domain (int8 wraps
        # 0..255 onto -128..127; int16 holds them directly): equality
        # survives the cast, and the compares run on 2x/4x-packed lanes.
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, C), 0).astype(cmp_dtype)
        hi = jnp.broadcast_to((sym >> 8).astype(cmp_dtype), (256, C)) == ids
        lo = jnp.broadcast_to((sym & 0xFF).astype(cmp_dtype), (256, C)) == ids
    else:
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, C), 0)
        hi = jnp.broadcast_to(sym >> 8, (256, C)) == ids
        lo = jnp.broadcast_to(sym & 0xFF, (256, C)) == ids
    acc_ref[:] += jax.lax.dot_general(
        hi.astype(jnp.int8),
        lo.astype(jnp.int8),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(g == cells - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("interpret", "cell", "cmp_dtype")
)
def histogram_pallas(
    symbols: jax.Array,
    interpret: bool = False,
    cell: int = _C,
    cmp_dtype: str = "int32",
) -> jax.Array:
    """Dense (MAX_SYMBOLS,) int32 histogram of int32 byte-pair symbols.

    ``cmp_dtype`` in {"int32", "int16", "int8"} selects the one-hot
    compare domain (see module docstring; "int8" does not compile on the
    v5e and exists only for the perf harness to re-probe)."""
    flat = symbols.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    if n == 0:
        return jnp.zeros((MAX_SYMBOLS,), jnp.int32)
    pad = (-n) % cell
    if pad:
        # Padding routes to symbol 0; corrected below.
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int32)])
    cells = flat.shape[0] // cell
    grid_sym = flat.reshape(cells * (cell // LANES), LANES)
    kernel = functools.partial(
        _hist_kernel, cells=cells, C=cell, cmp_dtype=cmp_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[pl.BlockSpec((cell // LANES, LANES), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((256, 256), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.int32)],
        interpret=interpret,
    )(grid_sym)
    hist = out.reshape(MAX_SYMBOLS)
    if pad:
        hist = hist.at[0].add(-pad)
    return hist
