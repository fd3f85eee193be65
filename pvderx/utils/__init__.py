from pvderx.utils.logging import get_logger, set_verbosity
from pvderx.utils.printing import show_states

__all__ = ["get_logger", "set_verbosity", "show_states"]
