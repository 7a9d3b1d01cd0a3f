import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from genomeassembler_dev_tpu.ops.pallas.doubling_kernel import doubling_chase
from genomeassembler_dev_tpu.ops.mxu import permutation_gather_mxu

LOG = open("studies/prof_chase.log", "w", buffering=1)
def log(*a): print(*a, file=LOG)

rng = np.random.default_rng(0)
B, M, n_iters = 256, 1024, 10
uptr = np.minimum(np.arange(M), rng.integers(0, M, (B, M))).astype(np.int32)
uoff = (uptr != np.arange(M)).astype(np.float32)
up, uo = jnp.asarray(uptr), jnp.asarray(uoff)

@jax.jit
@jax.vmap
def xla_loop(uptr, uoff):
    for _ in range(n_iters):
        gu = permutation_gather_mxu(jnp.stack([uptr.astype(jnp.float32), uoff], -1), uptr)
        uoff = uoff + gu[:, 1]
        uptr = gu[:, 0].astype(jnp.int32)
    return uptr, uoff

@jax.jit
@jax.vmap
def pallas_vmap(uptr, uoff):
    p, o = doubling_chase(uptr[None], uoff[None], n_iters)
    return p[0], o[0]

pallas_batched = jax.jit(lambda p, o: doubling_chase(p, o, n_iters))

def timeit(name, f):
    out = f(); np.asarray(out[0].ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10): out = f()
        np.asarray(out[0].ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/10)
    log(f"{name}: {best*1e3:.2f} ms")
    return out

a = timeit("xla loop", lambda: xla_loop(up, uo))
b = timeit("pallas vmapped", lambda: pallas_vmap(up, uo))
c = timeit("pallas batched", lambda: pallas_batched(up, uo))
assert (np.asarray(a[0]) == np.asarray(b[0])).all() and (np.asarray(a[1]) == np.asarray(b[1])).all()
assert (np.asarray(a[0]) == np.asarray(c[0])).all() and (np.asarray(a[1]) == np.asarray(c[1])).all()
log("all equal ok")
