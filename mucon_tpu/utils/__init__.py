from mucon_tpu.utils.sizing import make_same_size, make_same_size_interpolate

__all__ = ["make_same_size", "make_same_size_interpolate"]
