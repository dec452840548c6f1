"""Timing / tracing utilities.

The reference ships a print-based wall-clock timer
(reference: tinyknn/utils.py:34-41). Here the same context manager also
blocks on async dispatch so TPU timings are honest, and an optional
``jax.profiler`` trace wrapper covers the "real" tracing story.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def timer(verbose, text):
    """Wall-clock timer context manager; prints when ``verbose``."""
    if verbose:
        print(text)
        start = time.time()
    yield
    if verbose:
        print(f"Took {time.time() - start:.1f}s")


def block(tree):
    """Block until every array in a pytree is computed (for timing)."""
    return jax.block_until_ready(tree)


@contextmanager
def profile_trace(logdir=None):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(str(logdir)):
        yield


def enable_compilation_cache(path=".jax_cache", min_compile_secs=1.0):
    """Persist XLA compilations to disk (large-shape compiles through a
    remote TPU compile service can take minutes; the cache makes repeat
    benchmark runs start hot)."""
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
