from .grid import LoadTestGrid, expand_range
from .metrics import TestResult, TestResultsHandler
from .variants import variant_id

__all__ = ["LoadTestGrid", "TestResult", "TestResultsHandler", "expand_range", "variant_id"]
