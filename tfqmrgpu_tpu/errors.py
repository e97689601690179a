"""Status codes and error taxonomy.

Mirrors the reference C API's integer status codes and their
line/char-payload encoding (reference: tfQMRgpu/include/tfqmrgpu.h:160-181 and
tfQMRgpu/source/tfqmrgpu_error_tool.cxx:33-65) so that a user of the
reference library finds the same error vocabulary here.
"""

from __future__ import annotations

import enum


class Status(enum.IntEnum):
    SUCCESS = 0
    LAUNCH_FAILED = 2
    NO_INFO_PASSED = 3
    ALLOCATION_FAILED = 4
    RANDOM_GEN_FAILED = 5
    BREAKDOWN = 6
    POINTER_INVALID = 7
    MAX_ITERATIONS = 9
    B_HAS_A_ZERO_COLUMN = 11
    BLOCKSIZE_MISSING = 12
    B_IS_NOT_SUBSET_OF_X = 13
    UNDOCUMENTED_ERROR = 14
    DATALAYOUT_UNKNOWN = 15
    PRECISION_MISSMATCH = 16
    TANSPOSITION_UNKNOWN = 17
    VARIABLENAME_UNKNOWN = 18
    NO_IMPLEMENTATION = 19


# Encoding constants (tfqmrgpu.h:179-181): the lowest 3 decimal digits carry
# the error code, the middle 4 a source line, the upper 3 an ASCII char.
CODE_LINE = 1000
CODE_CHAR = 10000 * 1000

_MESSAGES = {
    Status.SUCCESS: "success",
    Status.LAUNCH_FAILED: "kernel launch failed",
    Status.NO_INFO_PASSED: "no info passed",
    Status.ALLOCATION_FAILED: "allocation failed",
    Status.RANDOM_GEN_FAILED: "random number generation failed",
    Status.BREAKDOWN: "all right-hand sides broke down",
    Status.POINTER_INVALID: "pointer invalid",
    Status.MAX_ITERATIONS: "max iterations reached without convergence",
    Status.B_HAS_A_ZERO_COLUMN: "B has a zero column",
    Status.BLOCKSIZE_MISSING: "block size not in the allowed list",
    Status.B_IS_NOT_SUBSET_OF_X: "sparsity pattern of B is not a subset of X",
    Status.UNDOCUMENTED_ERROR: "undocumented error",
    Status.DATALAYOUT_UNKNOWN: "unknown data layout",
    Status.PRECISION_MISSMATCH: "precision mismatch",
    Status.TANSPOSITION_UNKNOWN: "unknown transposition",
    Status.VARIABLENAME_UNKNOWN: "unknown variable name",
    Status.NO_IMPLEMENTATION: "not implemented",
}


def encode_status(code: int, line: int = 0, char: str | int = 0) -> int:
    """Pack (code, source line, char payload) into one int, reference-style."""
    ch = ord(char) if isinstance(char, str) else int(char)
    return int(code) + CODE_LINE * int(line) + CODE_CHAR * ch


def decode_status(status: int) -> tuple[int, int, int]:
    """Unpack a packed status into (code, line, char)."""
    status = int(status)
    code = status % CODE_LINE
    line = (status // CODE_LINE) % 10000
    char = status // CODE_CHAR
    return code, line, char


def get_error_string(status: int) -> str:
    """Human-readable decoding (tfqmrgpu_error_tool.cxx:33-65)."""
    code, line, char = decode_status(status)
    try:
        msg = _MESSAGES[Status(code)]
    except ValueError:
        msg = f"unknown status code {code}"
    parts = [msg]
    if line:
        parts.append(f"(source line {line})")
    if char:
        parts.append(f"(payload {chr(char)!r})")
    return " ".join(parts)


class TfqmrgpuError(RuntimeError):
    """Raised by the Python API where the C API would return a nonzero status."""

    def __init__(self, status: int, detail: str = ""):
        self.status = int(status)
        self.code, self.line, self.char = decode_status(self.status)
        msg = get_error_string(self.status)
        if detail:
            msg = f"{msg}: {detail}"
        super().__init__(msg)


def main(argv=None):
    """Standalone status decoder CLI (reference: tfqmrgpu_error_tool.cxx
    under __MAIN__): ``python -m tfqmrgpu_tpu.errors 13013 ...``."""
    import sys

    args = sys.argv[1:] if argv is None else argv
    if not args:
        print("usage: python -m tfqmrgpu_tpu.errors <status> [<status> ...]")
        return 1
    for a in args:
        status = int(a)
        code, line, char = decode_status(status)
        print(f"{status}: code={code} line={line} char={char!r} -> "
              f"{get_error_string(status)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
