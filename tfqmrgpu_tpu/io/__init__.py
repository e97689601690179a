"""Problem I/O: XML problems, legacy text dumps, and SpMM pair-plan files."""

from .planfile import PlanFile, read_plan_file

__all__ = ["PlanFile", "read_plan_file"]
