import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

LOG = open("studies/prof_buf.log", "w", buffering=1)
def log(*a): print(*a, file=LOG)

def bench(name, f, reps=3):
    out = f(); np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps): out = f()
    np.asarray(out).ravel()[:1]
    log(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")

N = 4096 * 100000
V = 131072
idx = jnp.asarray(np.random.default_rng(0).integers(0, N, V).astype(np.int32))
vals8 = jnp.asarray(np.random.default_rng(1).integers(0, 4, V).astype(np.uint8))
vals32 = vals8.astype(jnp.int32)

f1 = jax.jit(lambda: jnp.full(N, 255, jnp.uint8).sum())
bench("full(4e8 u8) + sum", f1)
f2 = jax.jit(lambda i, v: jnp.full(N, 255, jnp.uint8).at[i].set(v, mode="drop")[:128].astype(jnp.int32).sum())
bench("full + scatter 131k u8, fetch 128", lambda: f2(idx, vals8))
f3 = jax.jit(lambda i, v: jnp.full(N, 2**30, jnp.int32).at[i].set(v, mode="drop")[:128].sum())
bench("full + scatter 131k i32, fetch 128", lambda: f3(idx, vals32))
f4 = jax.jit(lambda i, v: jnp.zeros(N, jnp.uint8).at[i].set(v, mode="drop")[:128].astype(jnp.int32).sum())
bench("zeros + scatter 131k u8", lambda: f4(idx, vals8))
# 3 sequential scatters on the same buffer
def chain(i, v):
    b = jnp.full(N, 255, jnp.uint8)
    b = b.at[i].set(v, mode="drop")
    b = b.at[i + 1].set(v, mode="drop")
    b = b.at[i + 2].set(v, mode="drop")
    return b[:128].astype(jnp.int32).sum()
f5 = jax.jit(chain)
bench("full + 3 scatters u8", lambda: f5(idx, vals8))
# 2D DUS prefix write
def dus(i, v):
    b = jnp.full((4096, 100000), 255, jnp.uint8)
    b = b.at[:, :30].set(7)
    b = b.reshape(-1).at[i].set(v, mode="drop")
    return b[:128].astype(jnp.int32).sum()
f6 = jax.jit(dus)
bench("full + 2D DUS + scatter u8", lambda: f6(idx, vals8))
