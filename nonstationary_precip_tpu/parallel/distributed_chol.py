"""Mesh-distributed blocked Cholesky: N×N factorisation sharded over
devices (the TP row SURVEY.md §2.6 marks optional, built on the
streaming-Cholesky work of ops/pallas_chol.py).

Layout: block-rows of A are sharded over a 1-D mesh (each device owns an
(N/ndev, N) strip).  Right-looking algorithm with left-looking reads:

  per block-column j:
    1. every device contributes its rows of column block j; ONE
       ``all_gather`` assembles the (N, B) column — the only collective,
       so total ICI traffic is N² elements for the whole factorisation;
    2. every device redundantly factors the (B, B) diagonal block and
       forms the full scaled panel P = col · L_jj⁻ᵀ (O(N·B²) — cheap,
       and redundancy beats a broadcast round-trip on ICI);
    3. each device subtracts P_mine · Pᵀ from its strip, full-width:
       the unmasked update over-subtracts only entries that are never
       read again (columns < jB live in the separate L accumulator),
       which buys fully static shapes — the same trade the single-chip
       streaming kernel makes with full-height panels.

This scales the factorisation's memory N²/ndev per device and its FLOPs
2N³/ndev per device; use it when a Gram matrix exceeds one chip's HBM
(the single-chip cap is 8192² f32 ≈ 268 MB working set in the streaming
kernel; 32k² needs 4 GB spread over the slice).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from nonstationary_precip_tpu.parallel.mesh import DATA_AXIS


def sharded_cholesky(mesh, block: int = 256):
    """Build chol(A) for row-sharded A over ``mesh``.

    Returns ``fn(a)`` taking the (N, N) PSD matrix (rows sharded over the
    mesh's axis, or unsharded — shard_map partitions it) and returning
    the lower factor with the same sharding.  N must be divisible by
    ndev·block.
    """
    axis = DATA_AXIS
    ndev = mesh.devices.size

    def per_shard(a_strip):
        rows_per, n = a_strip.shape
        nb = n // block
        dev = jax.lax.axis_index(axis)
        eye = jnp.eye(block, dtype=a_strip.dtype)

        rowid = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
        colid = jax.lax.broadcasted_iota(jnp.int32, (n, block), 1)

        def body(j, carry):
            a_s, l_s = carry
            jb = j * block
            col = jax.lax.dynamic_slice(a_s, (0, jb), (rows_per, block))
            col_full = jax.lax.all_gather(col, axis, axis=0, tiled=True)  # (n, B)

            d = jax.lax.dynamic_slice(col_full, (jb, 0), (block, block))
            l_jj = jnp.linalg.cholesky(d)
            l_inv = jax.lax.linalg.triangular_solve(
                l_jj, eye, left_side=True, lower=True
            )
            p_full = jnp.dot(col_full, l_inv.T, precision=jax.lax.Precision.HIGHEST)
            # rows above the diagonal block are stale (over-subtracted);
            # inside the diagonal block keep only the lower triangle
            keep = (rowid >= jb) & jnp.logical_not(
                (rowid < jb + block) & (rowid - jb < colid)
            )
            p_full = jnp.where(keep, p_full, 0.0)

            p_mine = jax.lax.dynamic_slice(
                p_full,
                (dev * rows_per, jnp.zeros((), dev.dtype)),
                (rows_per, block),
            )
            l_s = jax.lax.dynamic_update_slice(l_s, p_mine, (0, jb))
            a_s = a_s - jnp.dot(
                p_mine, p_full.T, precision=jax.lax.Precision.HIGHEST
            )
            return a_s, l_s

        _, l_s = jax.lax.fori_loop(
            0, nb, body, (a_strip, jnp.zeros_like(a_strip))
        )
        return l_s

    fn = shard_map(per_shard, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis))

    def chol(a):
        n = a.shape[-1]
        assert n % (ndev * block) == 0, (
            f"N={n} must be divisible by ndev*block={ndev * block}"
        )
        return fn(a)

    return chol


def sharded_cholesky_2d(mesh, block: int = 256):
    """chol(A) for A sharded over BOTH axes of a 2-D mesh (each device
    owns an (N/R, N/C) tile) — the SUMMA-style generalisation of
    ``sharded_cholesky``.

    Vs the 1-D row layout, the trailing update each device performs is
    (N/R × N/C) instead of (N/R × N): update FLOPs AND resident memory
    scale 1/(R·C), so the same per-chip HBM admits √(R·C)-larger N.  Per
    block column the collectives are one (N/R, B) ``psum`` over the
    column axis (propagating the owner column group's panel slice) and
    one ``all_gather`` over the row axis (assembling the (N, B) panel) —
    both ride their own torus dimension on real hardware
    (``make_mesh_2d``).

    The (B, B) diagonal factor + panel scaling are redundantly computed
    on every device, same trade as the 1-D variant.  Requires N divisible
    by R·block and C·block so each block column lives in exactly one
    column group.
    """
    from nonstationary_precip_tpu.parallel.mesh import COL_AXIS, ROW_AXIS

    nrow, ncol = mesh.shape[ROW_AXIS], mesh.shape[COL_AXIS]

    def per_shard(a_tile):
        rows_per, cols_per = a_tile.shape
        n = rows_per * nrow
        nb = n // block
        ri = jax.lax.axis_index(ROW_AXIS)
        ci = jax.lax.axis_index(COL_AXIS)
        eye = jnp.eye(block, dtype=a_tile.dtype)
        row0 = ri * rows_per
        col0 = ci * cols_per

        rowid = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
        colid = jax.lax.broadcasted_iota(jnp.int32, (n, block), 1)

        def body(j, carry):
            a_t, l_t = carry
            jb = j * block
            owner = jb // cols_per  # column group holding block column j
            # my (rows_per, B) slice of the global block column (zeros if
            # another column group owns it), propagated by ONE psum over
            # the column axis — clamp keeps the slice start in range on
            # non-owners, whose contribution is masked to zero anyway
            off = jnp.clip(jb - col0, 0, cols_per - block)
            zero = jnp.zeros((), off.dtype)
            piece = jax.lax.dynamic_slice(a_t, (zero, off), (rows_per, block))
            piece = jnp.where(ci == owner, piece, 0.0)
            piece = jax.lax.psum(piece, COL_AXIS)
            col_full = jax.lax.all_gather(
                piece, ROW_AXIS, axis=0, tiled=True
            )  # (n, B)

            d = jax.lax.dynamic_slice(col_full, (jb, 0), (block, block))
            l_jj = jnp.linalg.cholesky(d)
            l_inv = jax.lax.linalg.triangular_solve(
                l_jj, eye, left_side=True, lower=True
            )
            p_full = jnp.dot(col_full, l_inv.T, precision=jax.lax.Precision.HIGHEST)
            keep = (rowid >= jb) & jnp.logical_not(
                (rowid < jb + block) & (rowid - jb < colid)
            )
            p_full = jnp.where(keep, p_full, 0.0)

            p_rows = jax.lax.dynamic_slice(
                p_full, (row0, jnp.zeros((), row0.dtype)), (rows_per, block)
            )
            p_cols = jax.lax.dynamic_slice(
                p_full, (col0, jnp.zeros((), col0.dtype)), (cols_per, block)
            )
            a_t = a_t - jnp.dot(
                p_rows, p_cols.T, precision=jax.lax.Precision.HIGHEST
            )
            l_t = jnp.where(
                ci == owner,
                jax.lax.dynamic_update_slice(l_t, p_rows, (zero, off)),
                l_t,
            )
            return a_t, l_t

        _, l_t = jax.lax.fori_loop(0, nb, body, (a_tile, jnp.zeros_like(a_tile)))
        return l_t

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(ROW_AXIS, COL_AXIS),),
        out_specs=P(ROW_AXIS, COL_AXIS),
    )

    def chol(a):
        n = a.shape[-1]
        assert n % (nrow * block) == 0 and n % (ncol * block) == 0, (
            f"N={n} must be divisible by R*block={nrow * block} "
            f"and C*block={ncol * block}"
        )
        return fn(a)

    return chol


def sharded_mvn_logpdf(mesh, block: int = 256):
    """−½(yᵀK⁻¹y + logdet K + N log 2π) with K row-sharded: the sharded
    factorisation above plus a replicated-triangular-solve of the
    gathered factor is overkill for the quad term — instead solve via the
    sharded factor locally per block column.  Provided as the composition
    entry point for multi-chip exact-GP MLL work."""
    chol = sharded_cholesky(mesh, block=block)

    def logpdf(a, y):
        l = chol(a)
        # gather the factor once for the (sequential) triangular solve —
        # the solve is O(N²), negligible next to the O(N³) factorisation
        alpha = jax.lax.linalg.triangular_solve(
            l, y[:, None], left_side=True, lower=True
        )[:, 0]
        quad = alpha @ alpha
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))
        n = y.shape[-1]
        return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(y.dtype))

    return logpdf
