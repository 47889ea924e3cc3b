"""Wheel build for huffman-tpu, including the native C++ host runtime.

The reference ships only a Makefile (reference: Makefile:17-29); this build
compiles native/htpu_native.cpp into a shared object INSIDE the wheel so
``pip install huffman-tpu`` keeps the native backend (two-queue codebook,
reference codec, threaded block encode) without a source checkout. The
extension exports a plain C ABI and is loaded with ctypes — it is never
imported as a Python module, so no PyInit symbol is needed.

Source checkouts keep the lazy ``make native`` path (runtime/native.py); a
missing compiler at install time degrades to the NumPy backends exactly as
before.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Build the native runtime if a toolchain exists; otherwise ship a
    pure-Python wheel (every native path has a NumPy twin)."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            print(f"WARNING: native runtime not built ({exc}); "
                  "wheel falls back to NumPy backends")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # pragma: no cover - toolchain-dependent
            print(f"WARNING: native runtime not built ({exc}); "
                  "wheel falls back to NumPy backends")


setup(
    ext_modules=[
        Extension(
            "huffman_tpu._libhtpu_native",
            sources=["native/htpu_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
