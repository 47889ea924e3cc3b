"""Wheel packaging: ``pip install`` must keep the native backend.

VERDICT r1 #4/#5: the C++ runtime used to auto-build only from a source
checkout; a wheel silently degraded to NumPy. setup.py now compiles
native/htpu_native.cpp into the wheel (huffman_tpu/_libhtpu_native*.so) and
runtime/native.py loads it when no source tree is present. This test builds
the wheel, installs it into a scratch prefix, and runs a native-backend
roundtrip from the installed copy in a clean subprocess.
"""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def test_wheel_install_keeps_native_backend(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    wheel_dir = tmp_path / "dist"
    r = subprocess.run(
        [
            sys.executable, "-m", "pip", "wheel", "--no-deps",
            "--no-build-isolation", "-w", str(wheel_dir), str(REPO),
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = list(wheel_dir.glob("huffman_tpu-*.whl"))
    assert len(wheels) == 1, [w.name for w in wheels]

    target = tmp_path / "site"
    r = subprocess.run(
        [
            sys.executable, "-m", "pip", "install", "--no-deps",
            "--target", str(target), str(wheels[0]),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert list((target / "huffman_tpu").glob("_libhtpu_native*.so")), (
        "wheel is missing the compiled native runtime"
    )

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from huffman_tpu.runtime import native\n"
        "assert native.available(), 'native backend unavailable from wheel'\n"
        "data = bytes(range(256)) * 201 + b'x'\n"
        "blob = native.compress_reference(data)\n"
        "assert native.decompress_reference(blob) == data\n"
        "print('WHEEL_NATIVE_OK')\n"
    )
    import os

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", probe, str(target)],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path),  # away from the repo so _SRC does not resolve
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "WHEEL_NATIVE_OK" in r.stdout
