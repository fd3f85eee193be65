from pvderx.oracle import scipy_ref

__all__ = ["scipy_ref"]
