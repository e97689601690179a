"""Verification of the source-only language bindings (F90 module, Julia
example).

When the toolchains exist (gfortran / julia) the sources are COMPILED and
RUN against the real C library.  In this CI image neither is installed, so
the fallback is a symbol-level cross-check: every C symbol the Fortran
module binds (``bind(c, name='...')``) and every symbol the Julia example
``ccall``s must actually be exported by the built ``libtfqmrgpu_tpu.so``
-- this catches the classic source-only-binding rot (renamed or missing C
entry points) without a compiler.

Reference surface: tfqmrgpu_Fortran_module.F90:294-462,
tfqmrgpu_Julia_example.jl:93-121.
"""

import ctypes
import os
import re
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
F90_MODULE = os.path.join(REPO, "native", "fortran", "tfqmrgpu.F90")
F90_EXAMPLE = os.path.join(REPO, "examples", "tfqmrgpu_fortran_example.F90")
JULIA_EXAMPLE = os.path.join(REPO, "examples", "tfqmrgpu_julia_example.jl")


def _capi_lib():
    from tfqmrgpu_tpu import native

    lib = native.load_capi()
    if lib is None:
        pytest.skip("native C API library unavailable (no compiler?)")
    return lib


def _bound_names(path):
    text = open(path).read()
    return sorted(set(re.findall(r"bind\(c,\s*name='([A-Za-z0-9_]+)'",
                                 text, re.IGNORECASE)))


def test_f90_module_binds_real_symbols():
    names = _bound_names(F90_MODULE)
    assert len(names) >= 10, "F90 module lost its C bindings?"
    lib = _capi_lib()
    missing = [n for n in names if not hasattr(lib, n)]
    assert not missing, f"F90 module binds non-exported symbols: {missing}"


def test_julia_example_calls_real_symbols():
    text = open(JULIA_EXAMPLE).read()
    names = sorted(set(re.findall(r"ccall\(\(:([A-Za-z0-9_]+)", text)))
    assert names, "Julia example has no ccalls?"
    lib = _capi_lib()
    missing = [n for n in names if not hasattr(lib, n)]
    assert not missing, f"Julia example ccalls missing symbols: {missing}"


C_HEADER = os.path.join(REPO, "native", "include", "tfqmrgpu_tpu.h")


def _c_prototype_arity(path):
    """Parse ``tfqmrgpuStatus_t NAME(args...);`` prototypes -> {name: nargs}."""
    text = re.sub(r"/\*.*?\*/", "", open(path).read(), flags=re.DOTALL)
    text = re.sub(r"//[^\n]*", "", text)
    out = {}
    for m in re.finditer(
            r"tfqmrgpuStatus_t\s+(\w+)\s*\(([^;]*?)\)\s*;", text,
            re.DOTALL):
        args = m.group(2).strip()
        out[m.group(1)] = 0 if args in ("", "void") else args.count(",") + 1
    return out


def _f90_interface_arity(path):
    """Parse the module's bind(c) interfaces -> {c_name: ndummy_args}."""
    # join Fortran continuation lines (trailing & [+ leading &])
    joined = re.sub(r"&\s*\n\s*&?", " ", open(path).read())
    out = {}
    for m in re.finditer(
            r"(?:function|subroutine)\s+\w+\s*\(([^)]*)\)\s*"
            r"bind\(c,\s*name='(\w+)'\)", joined, re.IGNORECASE):
        args = m.group(1).strip()
        out[m.group(2)] = 0 if not args else args.count(",") + 1
    return out


def test_f90_interface_arity_matches_c_header():
    """Beyond symbol presence: every bind(c) interface in the F90 module
    must declare the SAME number of arguments as the C prototype it binds
    (bind(c) passes by value/reference positionally, so an arity mismatch
    corrupts the stack even when the symbol resolves)."""
    c_arity = _c_prototype_arity(C_HEADER)
    f_arity = _f90_interface_arity(F90_MODULE)
    assert len(f_arity) >= 10, "F90 interface parse came up short"
    missing = sorted(set(f_arity) - set(c_arity))
    assert not missing, f"F90 binds names absent from the C header: {missing}"
    bad = {n: (f_arity[n], c_arity[n]) for n in f_arity
           if f_arity[n] != c_arity[n]}
    assert not bad, f"F90/C argument-count mismatches (f90, c): {bad}"


def test_f90_program_units_balanced():
    """Cheap structural sanity of the F90 sources: every subroutine/
    function/module opens and closes (a truncated file would silently
    pass the symbol check)."""
    for path in (F90_MODULE, F90_EXAMPLE):
        text = open(path).read().lower()
        for unit in ("module", "subroutine", "function", "program"):
            opens = len(re.findall(
                rf"^\s*(?:pure\s+|elemental\s+)?(?:integer[^\n]*?|real[^\n]*?)?\b{unit}\b\s+\w+",
                text, re.MULTILINE))
            closes = len(re.findall(rf"^\s*end\s*{unit}\b", text,
                                    re.MULTILINE))
            assert closes <= opens, (path, unit, opens, closes)
            if unit in ("module", "program"):
                assert opens == closes, (path, unit, opens, closes)


@pytest.mark.skipif(shutil.which("gfortran") is None,
                    reason="gfortran not installed in this image")
def test_f90_compiles_and_runs(tmp_path):
    """Full compile + run of the F90 module and example (runs only where
    gfortran exists; the CI image has none -- reproducible skip)."""
    from tfqmrgpu_tpu import native

    assert native.build()
    libdir = os.path.join(REPO, "native", "lib")
    exe = tmp_path / "f90_example"
    subprocess.run(
        ["gfortran", "-o", str(exe), F90_MODULE, F90_EXAMPLE,
         f"-L{libdir}", "-ltfqmrgpu_tpu", f"-Wl,-rpath,{libdir}",
         "-J", str(tmp_path)],
        check=True)
    r = subprocess.run([str(exe)], capture_output=True, text=True,
                       timeout=600,
                       env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr


@pytest.mark.skipif(shutil.which("julia") is None,
                    reason="julia not installed in this image")
def test_julia_example_runs():
    from tfqmrgpu_tpu import native

    assert native.build()
    r = subprocess.run(
        ["julia", JULIA_EXAMPLE], capture_output=True, text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": REPO,
             "TFQ_LIB": os.path.join(REPO, "native", "lib",
                                     "libtfqmrgpu_tpu.so")})
    assert r.returncode == 0, r.stderr
