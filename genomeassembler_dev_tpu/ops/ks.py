"""Batched two-sample Kolmogorov-Smirnov statistic on device.

The reference calls R's ks.test per solution against the genome's octamer
probability track (lib/DeNovoAssembler.R:419-426). Here all solutions are
evaluated at once: sort each sample row, evaluate both right-continuous ECDFs
on the pooled points, take the max gap. Exact for ties (both ECDFs jump
together at shared values), matching R's statistic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _searchsorted_right(sorted_rows: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Rowwise searchsorted(side='right'): [B, N] sorted, [B, Q] -> [B, Q]."""
    return jax.vmap(lambda a, q: jnp.searchsorted(a, q, side="right"))(sorted_rows, queries)


@jax.jit
def batched_ks_2samp_masked(
    x_rows: jnp.ndarray, x_valid: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """KS statistic of the *valid* entries of each row vs shared sample y.

    Ragged rows are handled by masking: invalid entries sort to +inf and are
    excluded from both the ECDF denominator and the pooled evaluation
    points. Rows with no valid entries return NaN.
    """
    B, N = x_rows.shape
    n_valid = x_valid.sum(axis=1)  # [B]
    xm = jnp.where(x_valid, x_rows, jnp.inf)
    x_sorted = jnp.sort(xm, axis=1)
    y_sorted = jnp.sort(y)
    pooled = jnp.concatenate(
        [x_sorted, jnp.broadcast_to(y_sorted, (B, y.shape[0]))], axis=1
    )
    cdf_x = _searchsorted_right(x_sorted, pooled) / jnp.maximum(n_valid, 1)[:, None]
    cdf_y = jax.vmap(lambda q: jnp.searchsorted(y_sorted, q, side="right"))(pooled) / y.shape[0]
    gaps = jnp.where(jnp.isfinite(pooled), jnp.abs(cdf_x - cdf_y), 0.0)
    d = gaps.max(axis=1)
    return jnp.where(n_valid > 0, d, jnp.nan)


@jax.jit
def batched_ks_2samp(x_rows: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """KS statistic of each row of x_rows [B, N] vs shared sample y [M].

    Rows containing NaN (the no-matched-reads case, see
    spec.calc_breakscore) return NaN, mirroring the undefined statistic.
    """
    B, N = x_rows.shape
    y_sorted = jnp.sort(y)
    x_sorted = jnp.sort(x_rows, axis=1)
    pooled = jnp.concatenate(
        [x_sorted, jnp.broadcast_to(y_sorted, (B, y.shape[0]))], axis=1
    )
    cdf_x = _searchsorted_right(x_sorted, pooled) / N
    cdf_y = jax.vmap(lambda q: jnp.searchsorted(y_sorted, q, side="right"))(pooled) / y.shape[0]
    d = jnp.abs(cdf_x - cdf_y).max(axis=1)
    bad = jnp.isnan(x_rows).any(axis=1)
    return jnp.where(bad, jnp.nan, d)
