from .packer import Packer, encode_keyframe_tpu  # noqa: F401
