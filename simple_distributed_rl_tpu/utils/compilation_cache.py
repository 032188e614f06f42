"""Persistent XLA compilation cache (TPU-native; no reference analog).

On this target, compiling one engine chunk costs ~16 s on the TPU backend and
every fresh process pays it again. JAX ships a persistent on-disk cache keyed by
(HLO, compile options, backend version); enabling it makes the SECOND process's
warmup drop from minutes to seconds. The reference has nothing comparable — its
torch/tf graphs are eager — so this is a pure win of the XLA compilation model.

Opt-in two ways:
- ``srl.enable_compilation_cache(path)`` (or ``Runner(...,
  compilation_cache_dir=path)``) anywhere before the first compile;
- env var ``SRL_TPU_COMPILATION_CACHE=/path`` — the Runner enables it
  automatically at construction.

Entries compiled AFTER enabling are cached; flags are set so even small CPU
test graphs (<1 s compiles) are written, which is what makes the test suite's
repeat wall time drop too.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_ENV_VAR = "SRL_TPU_COMPILATION_CACHE"
_enabled_dir: Optional[str] = None


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` and drop the
    write thresholds so every traced graph is cached. Idempotent; returns the
    directory in use. Call before the first jit compile (later calls still help
    subsequent compiles)."""
    global _enabled_dir
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get(_ENV_VAR)
        or os.path.join(os.path.expanduser("~"), ".cache", "srl_tpu_xla_cache")
    )
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    if _enabled_dir == cache_dir:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default min_compile_time (1 s) would skip most CPU test graphs; cache all
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = cache_dir
    logger.info("persistent XLA compilation cache: %s", cache_dir)
    return cache_dir


def maybe_enable_from_env() -> Optional[str]:
    """Enable iff ``SRL_TPU_COMPILATION_CACHE`` is set (Runner calls this)."""
    if os.environ.get(_ENV_VAR):
        return enable_compilation_cache()
    return None
