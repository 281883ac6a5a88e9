from .yuv import Clip, read_y4m, write_y4m, synthetic_clip  # noqa: F401
