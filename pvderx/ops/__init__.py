from pvderx.ops.window import rk4_window_batch, pack_struct, unpack_struct

__all__ = ["rk4_window_batch", "pack_struct", "unpack_struct"]
