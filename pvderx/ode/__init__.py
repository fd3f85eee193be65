from pvderx.ode.rk4 import rk4_window
from pvderx.ode.newton import newton_solve
from pvderx.ode.implicit import backward_euler_window, trapezoid_window

__all__ = ["rk4_window", "newton_solve", "trapezoid_window",
           "backward_euler_window"]
