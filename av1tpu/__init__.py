"""av1tpu — a TPU-native distributed AV1 encoding framework.

Re-implements the capability surface of the av1-base reference daemon
(media-library scan -> stability -> probe/gate -> classify -> job queue ->
chunked encode -> validate -> size-gate -> atomic replace) with the encode
plane running on TPU via JAX/XLA/Pallas instead of external av1an/ffmpeg
worker processes.

Package layout (see SURVEY.md section 7 for the design rationale):

- ``av1tpu.core``     frame model, ingest, padding, scene detection, chunking
- ``av1tpu.spec``     integer-exact AV1 spec model (transforms, quantizers,
                      range coder, CDF handling) used as the correctness
                      reference for every kernel
- ``av1tpu.ops``      jitted XLA implementations of the encode operators
- ``av1tpu.kernels``  Pallas TPU kernels for the hot operators
- ``av1tpu.models``   assembled encoders (intra pipeline, inter pipeline, VMAF)
- ``av1tpu.coding``   host-side entropy coding / OBU + IVF packing
- ``av1tpu.parallel`` device mesh setup and chunk-batch sharding
- ``av1tpu.utils``    YUV/y4m IO, synthetic clips, config helpers
"""

__version__ = "0.1.0"
