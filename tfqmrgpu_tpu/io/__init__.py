"""Problem I/O: XML problems, legacy text dumps, and SpMM pair-plan files."""

from .planfile import PlanFile, read_plan_file
from .xmlio import XmlProblem, read_xml, write_xml

__all__ = ["PlanFile", "read_plan_file", "XmlProblem", "read_xml",
           "write_xml"]
