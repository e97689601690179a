"""Build + run the language examples that the environment can execute.

The C example links against libtfqmrgpu_tpu.so (embedded CPython) and
exercises the one-call C ABI end-to-end; the Python example runs as a
subprocess.  Fortran and Julia examples ship as source (no gfortran/julia in
this image) -- their C-ABI surface is covered by test_native.py.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_c_example(tmp_path):
    lib = os.path.join(REPO, "native", "lib", "libtfqmrgpu_tpu.so")
    if not os.path.exists(lib):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("native build unavailable")
    exe = str(tmp_path / "c_example")
    r = subprocess.run(
        ["gcc", "-std=c99", os.path.join(REPO, "examples",
                                         "tfqmrgpu_c_example.c"),
         "-I" + os.path.join(REPO, "native", "include"),
         "-L" + os.path.join(REPO, "native", "lib"),
         "-ltfqmrgpu_tpu", "-o", exe],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               LD_LIBRARY_PATH=os.path.join(REPO, "native", "lib"),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([exe], capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "tfqmrgpu_c_example: OK" in r.stdout


def test_python_example():
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "tfqmrgpu_python_example.py")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "tfqmrgpu_python_example: OK" in r.stdout


def test_sharded_example():
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "tfqmrgpu_sharded_example.py")],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "tfqmrgpu_sharded_example: OK" in r.stdout
