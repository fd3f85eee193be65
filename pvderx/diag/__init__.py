from pvderx.diag.plots import SimulationResults
from pvderx.diag.metrics import MetricsLogger

__all__ = ["SimulationResults", "MetricsLogger"]
