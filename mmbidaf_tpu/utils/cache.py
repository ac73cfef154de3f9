"""Persistent-compilation-cache plumbing (single-sourced; round-3 review).

The axon TPU backend supports executable serialization, so JAX's persistent
compilation cache turns the ~10-min remote server compile of VGG-sized
programs into a local-disk deserialize. Used by ``bench.py``,
``__graft_entry__.py`` and the test conftest — one helper so cache-policy
changes happen once.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Caches every entry regardless of compile time/size (the driver's
    end-of-round runs must hit whatever the builder's warm-up populated).
    Call before the first compilation.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def enable_cli_cache(cache_dir: str | None) -> str | None:
    """CLI cache policy for train.py / infer.py / tools/serve.py.

    ``cache_dir`` is the ``--jax_cache`` flag value:
      * a path — enable the cache there unconditionally;
      * ``""`` — explicitly off;
      * ``None`` (flag omitted) — enable the repo-local ``.jax_cache`` only
        when the process is on a non-CPU backend, where it turns the ~10-min
        axon server compile of VGG-sized programs into a local deserialize.
        CPU stays uncached by default: compiles are cheap there and XLA:CPU
        AOT reload can in principle SIGILL on a machine-feature change
        (same policy as ``__graft_entry__``'s CPU dry run).

    Returns the directory enabled, or ``None`` if the cache stayed off.
    """
    import jax

    if cache_dir == "":
        return None
    if cache_dir is None:
        if jax.default_backend() == "cpu":
            return None
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    enable_compilation_cache(cache_dir)
    return os.path.abspath(cache_dir)


def disable_compilation_cache() -> None:
    """Turn the persistent cache off (e.g. the CPU dry run: XLA:CPU AOT
    reload warns about machine-feature mismatches and binary driver signals
    must not risk a SIGILL from a stale cached executable)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
