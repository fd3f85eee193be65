from pvderx.diag.plots import SimulationResults
from pvderx.diag.metrics import MetricsLogger
from pvderx.diag.profiler import Stopwatch, compile_report, device_op_summary, trace

__all__ = ["SimulationResults", "MetricsLogger", "Stopwatch",
           "compile_report", "device_op_summary", "trace"]
