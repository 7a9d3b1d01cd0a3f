"""Workarounds for environment quirks.

The axon PJRT relay in this environment occasionally returns a stale/mismatched
executable for a cached program, surfacing as
    ValueError: INVALID_ARGUMENT: Execution supplied N buffers but compiled
    program expected M buffers
on a *re-execution* of a previously-working program (nondeterministic; not
reproducible on plain CPU/TPU backends). `flaky_backend_retry` retries the
call after clearing JAX's caches, which forces a fresh trace/compile.
"""

from __future__ import annotations

import functools
import time


def _is_flaky_backend_error(e: Exception) -> bool:
    msg = str(e)
    if "INVALID_ARGUMENT" not in msg:
        return False
    # two observed relay failure modes, both on RE-execution of previously
    # working programs: a stale-executable buffer-count mismatch, and a
    # generic "TPU backend error (InvalidArgument)" on the output fetch
    # (seen mid-study after an impossibly-instant cached dispatch)
    return ("buffers but compiled program expected" in msg
            or "TPU backend error" in msg)


def flaky_backend_retry(fn=None, *, attempts: int = 5, delay: float = 0.5):
    """Retry `fn` on the relay's stale-executable errors. Delays escalate
    (0.5, 1, 2, 4 s ...): the generic backend-error mode can persist for
    seconds; if it outlives the retries the process-level resume contract
    (file-per-experiment artifacts, skip-if-exists) is the recovery path."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            import jax

            last = None
            for i in range(attempts):
                try:
                    return f(*args, **kwargs)
                except Exception as e:
                    if not _is_flaky_backend_error(e):
                        raise
                    last = e
                    jax.clear_caches()
                    time.sleep(delay * (2 ** i))
            raise last

        return wrapper

    return deco(fn) if fn is not None else deco
