"""Small fixed-size dense linear solves in pure arithmetic ops.

XLA's TPU LuDecomposition only supports f32/c64, so ``jnp.linalg.solve``
cannot run the f64 (emulated) path needed for reference-parity numerics.
These helpers implement Gaussian elimination with partial pivoting using
only mul/add/select ops, which lower fine to the TPU VPU in f64.

Sizes are static (8x8 for the evptn system), so loops unroll at trace
time; everything vmaps cleanly over batches of points.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_dense(A, b):
    """Solve A x = b for one small system.

    A: (n, n), b: (n,) or (n, k).  Partial pivoting via soft row swaps
    (select by argmax of |column|), fully unrolled for static n.
    """
    n = A.shape[0]
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    M = jnp.concatenate([A, B], axis=1)  # (n, n+k) augmented
    for col in range(n):
        # partial pivot: pick the row (>= col) with max |M[row, col]|
        column = jnp.abs(M[:, col])
        mask = jnp.arange(n) >= col
        piv = jnp.argmax(jnp.where(mask, column, -1.0))
        # swap rows col <-> piv (gather-based, static shapes)
        idx = jnp.arange(n)
        idx = idx.at[col].set(piv).at[piv].set(col)
        M = M[idx]
        # eliminate below and above (Gauss-Jordan keeps it branch-free)
        pivval = M[col, col]
        pivrow = M[col] / pivval
        factors = M[:, col]
        elim = M - factors[:, None] * pivrow[None, :]
        M = jnp.where((jnp.arange(n) == col)[:, None], pivrow[None, :], elim)
    x = M[:, n:]
    return x[:, 0] if vec else x
