"""Integer-exact AV1 spec model (pure Python/numpy).

This subpackage is the correctness reference for the whole framework: every
TPU kernel and every byte of the C++ entropy coder is validated against it.
The reference repo contains no codec internals at all (it shells out to
av1an/SVT-AV1; reference crates/daemon/src/encode/av1an.rs), so everything
here is implemented from the AV1 bitstream specification and validated
against the system AV1 decoders (dav1d/libaom via libavcodec).
"""
