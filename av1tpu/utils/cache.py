"""Persistent XLA compilation cache.

The encoder's jitted pipelines lower to ~45k-instruction HLO modules
(normative integer transforms, the select-chain motion search, in-loop
filters); compiling one from scratch takes minutes on the remote-compile
path.  Every production entry point (CLI, bench, driver contract) enables
a repo-local persistent cache so each (program, shape) pair compiles once
per machine and loads in milliseconds afterwards.

The reference gets the equivalent for free from SVT-AV1 being an AOT
binary (crates/daemon/src/encode/av1an.rs); this is the JIT-world
counterpart.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jaxcache")


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently point JAX's persistent compilation cache at `path`
    (default: <repo>/.jaxcache, created on demand)."""
    import jax

    target = path or os.environ.get("AV1TPU_COMPILE_CACHE", _DEFAULT)
    os.makedirs(target, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
