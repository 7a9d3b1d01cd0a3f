"""Does the axon relay serve CONCURRENT XLA compiles? Gates the cold-start
prewarm design (VERDICT r3 next #7): if two distinct programs compile in
~max(t1, t2) from two threads, background prewarm of later pipeline stages
can hide their compile latency behind stage 1; if it serializes (~t1 + t2),
prewarm buys nothing and the cold tax needs a different attack.

Method: build N structurally-distinct programs (different static shapes so
neither the in-process nor the persistent cache can hit), compile serially,
then build N more and compile from N threads; compare wall times.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def make_program(n: int, tag: int):
    """A compile-heavy-ish program with a distinct shape per (n, tag)."""
    def fn(x):
        y = x
        for i in range(8):
            y = jnp.tanh(y @ y.T[: y.shape[0], : y.shape[1]] + i)
            y = jnp.sort(y, axis=-1)
        return y.sum()

    shape = jax.ShapeDtypeStruct((128 + 8 * n + tag, 256), jnp.float32)
    return jax.jit(fn), shape


def compile_one(args):
    fn, shape = args
    t0 = time.perf_counter()
    fn.lower(shape).compile()
    return time.perf_counter() - t0


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev}")
    # warm the client with one tiny op
    jnp.arange(4.0).sum().block_until_ready()

    N = 3
    serial = [make_program(i, 0) for i in range(N)]
    t0 = time.perf_counter()
    ts = [compile_one(p) for p in serial]
    t_serial = time.perf_counter() - t0
    log(f"serial: {t_serial:.1f} s total, per-program {[round(t,1) for t in ts]}")

    parallel = [make_program(i, 1) for i in range(N)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=N) as ex:
        ts = list(ex.map(compile_one, parallel))
    t_par = time.perf_counter() - t0
    log(f"parallel: {t_par:.1f} s total, per-program {[round(t,1) for t in ts]}")
    log(f"speedup: {t_serial / t_par:.2f}x "
        f"({'CONCURRENT' if t_par < 0.7 * t_serial else 'SERIALIZED'})")


if __name__ == "__main__":
    main()
