from pvderx.ode.rk4 import rk4_window
from pvderx.ode.newton import newton_solve

__all__ = ["rk4_window", "newton_solve"]
