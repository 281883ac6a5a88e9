from .mesh import (  # noqa: F401
    chunk_mesh, encode_batch, encode_chunks_sharded, shard_frames,
)
