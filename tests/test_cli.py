"""CLI tests: the framework's archive/extract surface (reference parity,
Compressor.cu:315 / Decompressor.cu:47) plus the native container commands."""

import numpy as np
import pytest

from huffman_tpu import cli


@pytest.fixture()
def sample(tmp_path):
    rng = np.random.default_rng(11)
    p = tmp_path / "sample.bin"
    # Compressible with an odd tail (exercises isOdd).
    data = (rng.zipf(1.5, size=20001) % 200).astype(np.uint8).tobytes()
    p.write_bytes(data)
    return p, data


def test_archive_extract_roundtrip(sample, tmp_path, monkeypatch):
    src, data = sample
    monkeypatch.chdir(tmp_path)
    assert cli.main(["archive", str(src)]) == 0
    comp = src.with_name(src.name + ".compressed")
    assert comp.exists()
    assert cli.main(["extract", str(comp)]) == 0
    assert (tmp_path / "DECOMPRESSED_FILE").read_bytes() == data


def test_extract_collision_rename(sample, tmp_path, monkeypatch):
    """Reference behavior: DECOMPRESSED_FILE, then DECOMPRESSED_FILE(1)."""
    src, data = sample
    monkeypatch.chdir(tmp_path)
    cli.main(["archive", str(src)])
    comp = str(src.with_name(src.name + ".compressed"))
    cli.main(["extract", comp])
    cli.main(["extract", comp])
    assert (tmp_path / "DECOMPRESSED_FILE(1)").read_bytes() == data


def test_compress_decompress_native_container(sample, tmp_path):
    src, data = sample
    out = tmp_path / "x.htpu"
    assert cli.main(["compress", str(src), "-o", str(out), "--backend", "numpy"]) == 0
    dec = tmp_path / "x.out"
    assert cli.main(["decompress", str(out), "-o", str(dec), "--backend", "numpy"]) == 0
    assert dec.read_bytes() == data


def test_decompress_strips_htpu_suffix(sample, tmp_path):
    src, data = sample
    out = tmp_path / "y.htpu"
    cli.main(["compress", str(src), "-o", str(out), "--backend", "numpy"])
    assert cli.main(["decompress", str(out), "--backend", "numpy"]) == 0
    assert (tmp_path / "y").read_bytes() == data


def test_missing_file_error_code(tmp_path):
    assert cli.main(["archive", str(tmp_path / "nope")]) == 1


def test_corrupt_container_error_code(tmp_path):
    bad = tmp_path / "bad.htpu"
    bad.write_bytes(b"not a container")
    assert cli.main(["decompress", str(bad)]) == 2


def test_info_and_verify(sample, tmp_path, capsys):
    src, data = sample
    out = tmp_path / "x.htpu"
    cli.main(["compress", str(src), "-o", str(out), "--backend", "numpy"])
    assert cli.main(["info", str(out)]) == 0
    cap = capsys.readouterr().out
    assert "HTPU" in cap and "crc32" in cap
    assert cli.main(["verify", str(out), "--backend", "numpy"]) == 0
    assert "CRC32 verified" in capsys.readouterr().out

    ref = tmp_path / "x.compressed"
    cli.main(["archive", str(src), "-o", str(ref)])
    assert cli.main(["info", str(ref)]) == 0
    assert "reference" in capsys.readouterr().out
    assert cli.main(["verify", str(ref)]) == 0

    shx = tmp_path / "x.htpx"
    cli.main(["compress", str(src), "-o", str(shx), "--shards", "3", "--backend", "numpy"])
    assert cli.main(["info", str(shx)]) == 0
    assert "HTPX" in capsys.readouterr().out
    assert cli.main(["verify", str(shx), "--backend", "numpy"]) == 0


def test_verify_corrupt_fails(sample, tmp_path):
    src, data = sample
    out = tmp_path / "x.htpu"
    cli.main(["compress", str(src), "-o", str(out), "--backend", "numpy"])
    blob = bytearray(out.read_bytes())
    blob[45] ^= 0xFF
    bad = tmp_path / "bad.htpu"
    bad.write_bytes(bytes(blob))
    assert cli.main(["verify", str(bad), "--backend", "numpy"]) == 2


def test_transcode_reference_to_native(tmp_path, monkeypatch):
    """The migration path: a reference-produced .compressed converts to the
    native container and back, bit-exact."""
    import numpy as np

    rng = np.random.default_rng(77)
    data = (rng.zipf(1.5, size=30001) % 200).astype(np.uint8).tobytes()
    src = tmp_path / "f.bin"
    src.write_bytes(data)
    cli.main(["archive", str(src), "-o", str(tmp_path / "f.compressed")])
    assert cli.main([
        "transcode", str(tmp_path / "f.compressed"),
        "-o", str(tmp_path / "f.htpu"), "--backend", "numpy",
    ]) == 0
    assert cli.main([
        "decompress", str(tmp_path / "f.htpu"),
        "-o", str(tmp_path / "f.out"), "--backend", "numpy",
    ]) == 0
    assert (tmp_path / "f.out").read_bytes() == data
    # and back to reference format
    assert cli.main([
        "transcode", str(tmp_path / "f.htpu"), "--to", "reference",
        "-o", str(tmp_path / "f2.compressed"), "--backend", "numpy",
    ]) == 0
    assert (tmp_path / "f2.compressed").read_bytes() == (
        tmp_path / "f.compressed"
    ).read_bytes()  # canonical writers are deterministic


def test_stream_mb_roundtrip(sample, tmp_path):
    src, data = sample
    out = tmp_path / "s.htps"
    assert cli.main([
        "compress", str(src), "-o", str(out), "--stream-mb", "1",
        "--backend", "numpy",
    ]) == 0
    dec = tmp_path / "s.out"
    assert cli.main([
        "decompress", str(out), "-o", str(dec), "--backend", "numpy",
    ]) == 0
    assert dec.read_bytes() == data
    assert cli.main(["info", str(out)]) == 0
    assert cli.main(["verify", str(out), "--backend", "numpy"]) == 0


def test_stream_mb_rejects_conflicting_flags(sample, tmp_path):
    src, _ = sample
    assert cli.main([
        "compress", str(src), "-o", str(tmp_path / "x"), "--stream-mb", "1",
        "--shards", "3",
    ]) == 2


def test_stream_decompress_preserves_output_on_corruption(sample, tmp_path):
    """A corrupt stream must not clobber an existing output file."""
    src, data = sample
    out = tmp_path / "c.htps"
    cli.main(["compress", str(src), "-o", str(out), "--stream-mb", "1",
              "--backend", "numpy"])
    dst = tmp_path / "keep.bin"
    dst.write_bytes(b"precious")
    bad = tmp_path / "bad.htps"
    bad.write_bytes(out.read_bytes()[: out.stat().st_size // 2])
    assert cli.main(["decompress", str(bad), "-o", str(dst),
                     "--backend", "numpy"]) == 2
    assert dst.read_bytes() == b"precious"


def test_compile_cache_env_wiring(tmp_path):
    """HTPU_COMPILE_CACHE attaches the persistent jax compilation cache
    before the first compute-module jit (README: cold-start costs)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, HTPU_COMPILE_CACHE=str(tmp_path / "xlacache"),
               JAX_PLATFORMS="cpu")
    probe = (
        "import huffman_tpu.ops, jax\n"
        "import os\n"
        "assert jax.config.jax_compilation_cache_dir == "
        "os.environ['HTPU_COMPILE_CACHE'], jax.config.jax_compilation_cache_dir\n"
        "print('CACHE_CFG_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True,
        env=env, timeout=120, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CACHE_CFG_OK" in r.stdout
