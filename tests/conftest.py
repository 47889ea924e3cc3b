"""Test configuration.

Tests run on CPU with 8 virtual devices so that mesh/sharding logic is
exercised without TPU hardware (SURVEY.md §4 test plan). Must be set before
JAX initializes its backends.
"""

import os
import subprocess
from pathlib import Path

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin force-overrides JAX_PLATFORMS at interpreter
# start (sitecustomize), so the env var alone is not enough — update the
# config after import, before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
BUILD = REPO / ".build"


@pytest.fixture(scope="session")
def romeo_bytes() -> bytes:
    return (REFERENCE / "romeo.txt").read_bytes()


@pytest.fixture(scope="session")
def jpeg_bytes() -> bytes:
    return (REFERENCE / "pexels-vlad-alexandru-popa-1402787.jpg").read_bytes()


def _build_ref_binary(src: Path, out: Path) -> Path | None:
    """Compile one of the reference's CPU-compilable tools (both are plain
    C++ despite the .cu suffix — SURVEY.md §2 rows 13-14)."""
    if out.exists():
        return out
    out.parent.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-x", "c++", str(src), "-o", str(out)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return None
    return out


@pytest.fixture(scope="session")
def ref_archive() -> Path | None:
    """Compiled reference CPU compressor (ground truth for format/size)."""
    return _build_ref_binary(REFERENCE / "baseline" / "Compressor.cu", BUILD / "ref_archive")


@pytest.fixture(scope="session")
def ref_extract() -> Path | None:
    """Compiled reference decompressor."""
    return _build_ref_binary(REFERENCE / "Decompressor.cu", BUILD / "ref_extract")
