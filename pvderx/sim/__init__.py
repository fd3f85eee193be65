from pvderx.sim.dynamic import DynamicSimulation, simulate, init_from_schedule

__all__ = ["DynamicSimulation", "simulate", "init_from_schedule"]
