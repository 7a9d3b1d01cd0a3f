"""A/B the doubling-chase inner gather at the bench shape: packed f32
(HIGHEST two-level) vs packed 8-bit bf16 limbs, in one process."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

LOG = open("studies/prof_chase_ab.log", "w", buffering=1)
def log(*a):
    print(*a, file=LOG)
    print(*a, file=sys.stderr, flush=True)

def timeit(fn, reps=10):
    out = fn(); np.asarray(out[0].ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps): out = fn()
        np.asarray(out[0].ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/reps)
    return best * 1e3

from genomeassembler_dev_tpu.ops.mxu import permutation_gather_mxu


def _gather_limbs24_mxu(vals: jnp.ndarray, idx: jnp.ndarray, M: int) -> jnp.ndarray:
    """out[i] = vals[idx[i]] for int32 vals in [0, 2^24), via a two-level
    one-hot contraction over three 8-bit bf16 limb channels — every operand
    is bf16-exact, so the MXU needs a single pass (an f32 values operand
    would force HIGHEST multi-pass lowering). idx in [0, M), M a power of
    two with M >= 256 lanes-friendly."""
    bits = M.bit_length() - 1
    lo_bits = bits // 2
    H, L = M >> lo_bits, 1 << lo_bits
    hi = (idx >> lo_bits).astype(jnp.int32)
    lo = (idx & (L - 1)).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)).astype(jnp.bfloat16)
    limbs = jnp.stack(
        [(vals >> 16) & 255, (vals >> 8) & 255, vals & 255], axis=-1
    ).astype(jnp.bfloat16)  # [M, 3]
    v2 = limbs.reshape(H, L * 3)
    tmp = jnp.einsum("mh,hd->md", oh_hi, v2,
                     preferred_element_type=jnp.float32).reshape(M, L, 3)
    oh_lo = (lo[:, None] == jnp.arange(L, dtype=jnp.int32)).astype(jnp.float32)
    g = (tmp * oh_lo[..., None]).sum(axis=-2)  # [M, 3] exact f32
    return (g[:, 0].astype(jnp.int32) << 16) | (g[:, 1].astype(jnp.int32) << 8) \
        | g[:, 2].astype(jnp.int32)


dev = jax.devices()[0]
log(f"device: {dev.platform} {dev}")
B, M, n_iters = 256, 1024, 10
rng = np.random.default_rng(0)
uptr0 = np.minimum(np.arange(M), rng.integers(0, M, (B, M))).astype(np.int32)
uoff0 = (uptr0 != np.arange(M)).astype(np.int32)
up, uo = jnp.asarray(uptr0), jnp.asarray(uoff0)

@jax.jit
@jax.vmap
def chase_f32(uptr, uoff):
    uofff = uoff.astype(jnp.float32)
    fM = float(M)
    for _ in range(n_iters):
        pk = uptr.astype(jnp.float32) * fM + uofff
        g = permutation_gather_mxu(pk[:, None], uptr)[:, 0]
        gp = jnp.floor(g / fM)
        uofff = uofff + (g - gp * fM)
        uptr = gp.astype(jnp.int32)
    return uptr, uofff.astype(jnp.int32)

@jax.jit
@jax.vmap
def chase_limbs(uptr, uoff):
    for _ in range(n_iters):
        pk = uptr * M + uoff
        g = _gather_limbs24_mxu(pk, uptr, M)
        uoff = uoff + (g & (M - 1))
        uptr = g >> (M.bit_length() - 1)
    return uptr, uoff

a = chase_f32(up, uo)
b = chase_limbs(up, uo)
assert (np.asarray(a[0]) == np.asarray(b[0])).all()
assert (np.asarray(a[1]) == np.asarray(b[1])).all()
log(f"chase packed f32:   {timeit(lambda: chase_f32(up, uo)):.2f} ms")
log(f"chase bf16 limbs:   {timeit(lambda: chase_limbs(up, uo)):.2f} ms")
log("done")
