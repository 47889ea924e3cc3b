# Build + test entry points, mirroring the reference's Makefile surface
# (all / clean / test, reference Makefile:17-29) for the TPU framework.

CXX      ?= g++
CXXFLAGS ?= -O3 -std=c++17 -fPIC -Wall
PY       ?= python

NATIVE_SRC := native/htpu_native.cpp
NATIVE_LIB := build/libhtpu_native.so

.PHONY: all native test roundtrip bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	@mkdir -p build
	$(CXX) $(CXXFLAGS) -shared $< -o $@

# Unit + integration suite (runs on CPU with an 8-device virtual mesh).
test: native
	$(PY) -m pytest tests/ -q

# The reference's own definition of correctness: compress a file, extract
# it, diff against the original (reference Makefile:17-29) — here through
# the CLI in both container formats.
roundtrip: native
	@rm -rf build/roundtrip && mkdir -p build/roundtrip
	$(PY) -m huffman_tpu archive /root/reference/romeo.txt -o build/roundtrip/romeo.compressed
	$(PY) -m huffman_tpu extract build/roundtrip/romeo.compressed -o build/roundtrip/romeo.out
	cmp /root/reference/romeo.txt build/roundtrip/romeo.out
	$(PY) -m huffman_tpu compress /root/reference/romeo.txt -o build/roundtrip/romeo.htpu
	$(PY) -m huffman_tpu decompress build/roundtrip/romeo.htpu -o build/roundtrip/romeo.out2
	cmp /root/reference/romeo.txt build/roundtrip/romeo.out2
	@echo "roundtrip OK"

bench: native
	$(PY) bench.py

clean:
	rm -rf build __pycache__ huffman_tpu/__pycache__ .pytest_cache
