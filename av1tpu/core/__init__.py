from .frame import FrameBatch, pad_to_multiple, from_clip  # noqa: F401
from .scenes import scene_scores, split_scenes  # noqa: F401
