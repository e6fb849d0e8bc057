"""Fused Gram·v Pallas kernels: (K(x1, x2) @ v) without K in HBM.

The matrix-free CG paths (``ops/lazy_cg.py``, reference regime:
GPyTorch's LazyTensor BBMM at /root/reference/experiments/
spatial_exp.py:199) rebuild a (block, N) Gram panel per matvec.  XLA
computes that panel at the HBM *write* roofline and then reads it back
for the contraction — ≈ 2·N²·4 bytes of HBM traffic per CG iteration
that exists only because the panel round-trips through HBM.  These
kernels fuse the two (the KeOps trick, TPU-shaped): each (TM, TN) Gram
tile is built in VMEM and immediately contracted into a (TM, R) output
block on the MXU, accumulated across the column grid.  HBM traffic
collapses to the O(N) inputs per tile row/column — the matvec becomes
compute-bound instead of bandwidth-bound.

Two tile constructions:

* ``gibbs_gram_matvec`` — the diagonal Gibbs nonstationary form
  (kernels/gibbs.py, reference models/gibbs_kernels.py:154-162), per-dim
  VPU loop identical to ops/pallas_gram.py's; per-point (N, D)
  lengthscales.  With constant lengthscales this *is* the RBF
  (2ℓ²/(ℓ²+ℓ²) = 1), but the specialised kernel below is cheaper.
* ``rbf_gram_matvec`` — SE-ARD via the ‖a‖²+‖b‖²−2ab matmul identity:
  the quadratic form itself rides the MXU ((TM, 8) @ (8, TN)), leaving
  ~4 VPU ops + one exp per element.

Both are FORWARD-ONLY (no VJP): their call sites sit inside
``lazy_cg_mll``'s custom-VJP forward, whose backward never
differentiates the matvec (the rank-(1+R) trace-identity pullback
rebuilds panels through the jnp path).  Differentiating through these
directly raises, by design.

Layout: row payloads are lane-packed into (N, 128) buffers — x at lanes
0..D, lengthscales at 8..8+D (the pallas_fused convention) — and the
column side is pre-transposed to (128, N) so every BlockSpec is
lane-aligned.  v is lane-padded (N, R≤128); padded v rows are zero so
padded Gram columns contribute nothing, and padded output rows are
sliced off.  The σ²I ridge is NOT applied here — (K + σ²I)v = Kv + σ²v,
one cheap elementwise add at the caller.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (512, 2048) measured best on v5e at N=16384 — 3.49 ms/matvec vs 3.78
# (512×1024), 4.46 (256×512); 1024×1024 VMEM-OOMs (scoped 19.1M > 16M,
# temporaries scale with the sublane dim).  DESIGN.md §15 sweep; env
# overrides are for re-probing only.
TILE_M = int(os.environ.get("NSGP_MATVEC_TM", "512"))
TILE_N = int(os.environ.get("NSGP_MATVEC_TN", "2048"))
_FEAT = 128
_MAX_D = 8
_MAX_R = 128
# 'vpu' contraction cost is ~2·R full-tile ops vs HIGHEST's fixed 6 MXU
# passes — only sensible at small R (mBCG rhs = 1 + num_probes)
_VPU_R_MAX = 32


def _ceil_to(n, t):
    return -(-n // t) * t


def _pack_rows(x, ell, n_pad):
    """(N, D) x + (N, D) ell → (n_pad, 128): x at lanes 0..D, ell at
    8..8+D.  Padded rows carry ell = 1 so 1/(ℓᵢ²+ℓⱼ²) stays finite."""
    n, d = x.shape
    xp = jnp.zeros((n_pad, 8), x.dtype).at[:n, :d].set(x)
    lp = jnp.ones((n_pad, 8), x.dtype).at[:n, :d].set(ell)
    return jnp.concatenate(
        [xp, lp, jnp.zeros((n_pad, _FEAT - 16), x.dtype)], axis=1
    )


def _pad_v(v, n_pad):
    n, r = v.shape
    return jnp.zeros((n_pad, _MAX_R), v.dtype).at[:n, :r].set(v)


# ---------------------------------------------------------------------------
# Gibbs (per-point lengthscales)
# ---------------------------------------------------------------------------


def _contract(tile, v, precision):
    """tile (TM, TN) f32 · v (TN, R) f32 → (TM, R) f32 under the chosen
    contraction mode.  'high3' is the manual bf16 hi/lo 3-pass split
    (hi·hi + hi·lo + lo·hi ≈ XLA's 'high', which Mosaic cannot lower):
    per-element error ~1e-5 vs HIGHEST's exact-f32 six passes — enough
    for CG at the shipped iteration budgets (tools/
    probe_matvec_precision.py), NOT for exact Gram algebra."""
    if precision == "high3":
        f32 = jnp.float32
        th = tile.astype(jnp.bfloat16)
        tl = (tile - th.astype(f32)).astype(jnp.bfloat16)
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(f32)).astype(jnp.bfloat16)
        dflt = jax.lax.Precision("default")
        return (
            jnp.dot(th, vh, preferred_element_type=f32, precision=dflt)
            + jnp.dot(th, vl, preferred_element_type=f32, precision=dflt)
            + jnp.dot(tl, vh, preferred_element_type=f32, precision=dflt)
        )
    return jnp.dot(
        tile, v, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision(precision),
    )


def _gibbs_tile_parts(p1_ref, p2t_ref, *, d: int):
    """Build the (TM, TN) Gibbs tile; also return the per-dim diffs and
    squared-sum fields the backward kernel reuses ([d_k], [ss_k])."""
    if d == 2:
        # flagship fast path: factor the two per-dim reciprocals and the
        # full-tile sqrt into ONE rsqrt.  With p = ss₁·ss₂,
        #   √ratio = √(∏ 2ℓ₁ℓ₂) · p^(−½)          (numerator separates
        #            into a (TM,1)·(1,TN) outer product — small-axis work)
        #   quad   = (diff₁²·ss₂ + diff₂²·ss₁) · p⁻¹,  p⁻¹ = (p^(−½))².
        # Same estimand to f32 rounding; saves ~25% of the tile-build VPU
        # ops that bound this kernel (DESIGN §17 roofline).
        a0, a1 = p1_ref[:, 0:1], p1_ref[:, 1:2]
        b0, b1 = p2t_ref[0:1, :], p2t_ref[1:2, :]
        l10, l11 = p1_ref[:, 8:9], p1_ref[:, 9:10]
        l20, l21 = p2t_ref[8:9, :], p2t_ref[9:10, :]
        ss0 = l10 * l10 + l20 * l20  # (TM, TN)
        ss1 = l11 * l11 + l21 * l21
        p = ss0 * ss1
        rs = jax.lax.rsqrt(p)
        inv_p = rs * rs
        num_row = 2.0 * jnp.sqrt(l10 * l11)  # (TM, 1): √ on the small axis
        num_col = jnp.sqrt(l20 * l21)  # (1, TN)
        d0 = a0 - b0
        d1 = a1 - b1
        quadnum = (d0 * d0) * ss1 + (d1 * d1) * ss0
        tile = (num_row * num_col) * rs * jnp.exp(-quadnum * inv_p)
        return tile, [d0, d1], [ss0, ss1]
    ratio = None
    quad = None
    ds, sss = [], []
    for k in range(d):
        a = p1_ref[:, k : k + 1]  # (TM, 1)
        b = p2t_ref[k : k + 1, :]  # (1, TN)
        l1 = p1_ref[:, 8 + k : 9 + k]
        l2 = p2t_ref[8 + k : 9 + k, :]
        ss = l1 * l1 + l2 * l2  # (TM, TN)
        inv_ss = 1.0 / ss
        r = 2.0 * (l1 * l2) * inv_ss
        diff = a - b
        q = (diff * diff) * inv_ss
        ratio = r if ratio is None else ratio * r
        quad = q if quad is None else quad + q
        ds.append(diff)
        sss.append(ss)
    tile = jnp.sqrt(ratio) * jnp.exp(-quad)
    return tile, ds, sss


def _gibbs_tile(p1_ref, p2t_ref, *, d: int):
    return _gibbs_tile_parts(p1_ref, p2t_ref, d=d)[0]


def _accumulate(out_ref, acc):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        out_ref[:] += acc


def _gibbs_kernel(p1_ref, p2t_ref, v_ref, out_ref, *, d: int, precision):
    tile = _gibbs_tile(p1_ref, p2t_ref, d=d)
    _accumulate(out_ref, _contract(tile, v_ref[:], precision))


def _contract_vpu(tile, vt_ref, r: int):
    """Exact-f32 small-R contraction on the VPU: per-column broadcast
    multiply + lane reduction, scattered into the padded output lanes via
    one-hot masks (Mosaic-legal; jnp.concatenate of (TM, 1) strips is
    not).  Everything stays in f32 (8, 128) tiles — none of the
    f32→bf16 relayouts that dominate the manual 'high3' split — and the
    arithmetic is the same estimand as 'highest' up to summation order.
    Cost ~2·R ops/element vs the 6 MXU passes of HIGHEST, so it wins
    only at small R (mBCG's 1+probes right-hand sides)."""
    tm = tile.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _MAX_R), 1)
    acc = jnp.zeros((tm, _MAX_R), jnp.float32)
    for i in range(r):
        s = jnp.sum(tile * vt_ref[i : i + 1, :], axis=1, keepdims=True)
        acc = acc + jnp.where(lane == i, s, 0.0)
    return acc


def _gibbs_kernel_vpu(p1_ref, p2t_ref, vt_ref, out_ref, *, d: int, r: int):
    tile = _gibbs_tile(p1_ref, p2t_ref, d=d)
    _accumulate(out_ref, _contract_vpu(tile, vt_ref, r))


def _matvec_call(kernel_body, p1, p2t, vp, n1p, n2p):
    grid = (n1p // TILE_M, n2p // TILE_N)
    return pl.pallas_call(
        kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FEAT, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, _MAX_R), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, _MAX_R), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1p, _MAX_R), jnp.float32),
    )(p1, p2t, vp)


def _matvec_call_vpu(kernel_body, p1, p2t, vt, n1p, n2p):
    rp = vt.shape[0]
    grid = (n1p // TILE_M, n2p // TILE_N)
    return pl.pallas_call(
        kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FEAT, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_M, _MAX_R), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1p, _MAX_R), jnp.float32),
    )(p1, p2t, vt)


def make_gibbs_matvec(x1, ell1, x2, ell2, precision: str = "highest"):
    """Pack the row payloads ONCE and return ``matvec(v) = K(x1, x2) @ v``.

    Packing + the (N, 128) → (128, N) column-side transpose are the only
    O(N) host-tensor work; hoisting them out of the closure keeps them
    out of CG's iteration loop (XLA does not reliably move them out of a
    ``lax.scan`` body on its own).

    ``precision`` controls the tile·v MXU contraction only (the Gram
    tile itself is exact f32 VPU work): 'highest' = six bf16 passes
    (matches the package's pinned default — the f32-exact choice),
    'default' = one pass (tile rounded to bf16 — measured DIVERGENT
    inside preconditioned mBCG: the ~4e-3·√N operator perturbation
    exceeds σ², tools/probe_matvec_precision.py), 'high3' = manual
    3-pass bf16 hi/lo split (~1e-5 — CG-safe at the shipped budgets,
    wrong for exact Gram algebra).  Mosaic has no 'high' lowering.
    'vpu' = exact-f32 per-column VPU contraction (same estimand as
    'highest' up to summation order), R ≤ 32 — wins when R is small
    enough that ~2·R VPU ops/element undercut the 6 MXU passes."""
    n1, d = x1.shape
    n2 = x2.shape[0]
    if d > _MAX_D:
        raise ValueError(f"gibbs matvec: D ≤ {_MAX_D}")
    if precision not in ("highest", "default", "high3", "vpu"):
        raise ValueError(
            f"precision must be highest/default/high3/vpu, got {precision!r}"
        )
    n1p, n2p = _ceil_to(n1, TILE_M), _ceil_to(n2, TILE_N)
    p1 = _pack_rows(x1, ell1, n1p)
    p2t = _pack_rows(x2, ell2, n2p).T

    def matvec(v):
        r = v.shape[-1]
        if r > _MAX_R:
            # column-chunk a wide block rhs (e.g. lazy_cg_posterior's
            # 1+N* columns): ⌈R/128⌉ kernel launches, identical results
            # per column — the lane dimension is the hard per-launch cap,
            # and the Gram tile build is re-paid once per group
            return jnp.concatenate(
                [matvec(v[:, i:i + _MAX_R]) for i in range(0, r, _MAX_R)],
                axis=1,
            )
        if precision == "vpu":
            if r > _VPU_R_MAX:
                raise ValueError(f"gibbs matvec vpu: R ≤ {_VPU_R_MAX}")
            rp = _ceil_to(r, 8)
            vt = jnp.zeros((rp, n2p), v.dtype).at[:r, :n2].set(v.T)
            body = functools.partial(_gibbs_kernel_vpu, d=d, r=r)
            out = _matvec_call_vpu(body, p1, p2t, vt, n1p, n2p)
        else:
            body = functools.partial(_gibbs_kernel, d=d, precision=precision)
            out = _matvec_call(body, p1, p2t, _pad_v(v, n2p), n1p, n2p)
        return out[:n1, :r]

    return matvec


def gibbs_gram_matvec(x1, ell1, x2, ell2, v, precision: str = "highest"):
    """One-shot K(x1, x2) @ v for the diagonal Gibbs kernel, K never in
    HBM.  x1 (N1, D), ell1 (N1, D) per-point lengthscales (D ≤ 8),
    x2/ell2 (N2, D), v (N2, R); R > 128 runs as ⌈R/128⌉ column-chunked
    launches.  f32.  Forward-only (no VJP).  Inside an iteration loop
    use :func:`make_gibbs_matvec` so the payload packing happens once."""
    return make_gibbs_matvec(x1, ell1, x2, ell2, precision)(v)


# ---------------------------------------------------------------------------
# Fused backward panel sweep for lazy_cg_mll's custom VJP
# ---------------------------------------------------------------------------

# the backward tile keeps ~5 (TM, TN) f32 fields live (K, Ŵ, P, d_k,
# ss_k), so it runs at a smaller tile than the forward matvec to stay
# inside the 16 MB scoped-VMEM budget; env overrides for re-probing
TILE_BM = int(os.environ.get("NSGP_MATVEC_BTM", "256"))
TILE_BN = int(os.environ.get("NSGP_MATVEC_BTN", "1024"))


def _gibbs_panel_bwd_kernel(p1_ref, p2t_ref, f1_ref, f2t_ref, out_ref, *, d, fw):
    """Row-side gradients of sum(Ŵ ⊙ K) for the Gibbs Gram, one tile at
    a time: K built in VMEM (shared tile algebra), the rank-(1+2R)
    cotangent Ŵ assembled ON the MXU from the lane-packed factor
    buffers (never in HBM), and the per-dim x/ℓ pullbacks reduced
    in-register.  Output lanes (TM, 128): k → ∂/∂x_k, 8+k → ∂/∂ℓ_k
    (raw ℓ, chain rules live at the caller), 16 → rowsum(Ŵ ⊙ K) (the
    outputscale pullback).  Accumulated across the column grid."""
    tile, ds, sss = _gibbs_tile_parts(p1_ref, p2t_ref, d=d)
    w = jnp.dot(
        f1_ref[:, 0:fw], f2t_ref[0:fw, :],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pmat = w * tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _FEAT), 1)
    sp = jnp.sum(pmat, axis=1, keepdims=True)  # (TM, 1)
    acc = jnp.where(lane == 16, sp, 0.0)
    for k in range(d):
        inv_ss = 1.0 / sss[k]
        dk = ds[k]
        gx = -2.0 * jnp.sum(pmat * (dk * inv_ss), axis=1, keepdims=True)
        l1 = p1_ref[:, 8 + k : 9 + k]  # (TM, 1)
        # ∂logK/∂ℓ₁ₖ = 1/(2ℓ₁ₖ) + ℓ₁ₖ·inv_ss·(2d²·inv_ss − 1)
        t = jnp.sum(
            pmat * (inv_ss * (2.0 * (dk * dk) * inv_ss - 1.0)),
            axis=1, keepdims=True,
        )
        gl = sp / (2.0 * l1) + l1 * t
        acc = acc + jnp.where(lane == k, gx, 0.0) + jnp.where(lane == 8 + k, gl, 0.0)
    _accumulate(out_ref, acc)


def packed_gibbs_panel_grads(x, ell, alpha, solves, rights):
    """One fused sweep of the BBMM backward over the UNSCALED Gibbs Gram:
    row-side pullbacks of sum(Ŵ ⊙ K(x,x)) where

        Ŵ = ½ααᵀ − (¼/R)(S Zᵀ + Z Sᵀ),   S = solves, Z = rights

    (``ops/lazy_cg.py::core_bwd``'s kbar, exactly).  Returns
    ``(gx (N, d), gell (N, d), sp (N,))`` with sp the rowsums of Ŵ ⊙ K
    (so ``sp.sum()`` is the outputscale pullback).  Because K(x,x) and Ŵ
    are both symmetric, the caller's TOTAL gradient is 2× the row-side
    one — no transposed sweep needed.  Raw-ℓ, unscaled, un-g'd: all
    chain rules (exp(log ℓ), s², the scalar loss cotangent) live at the
    caller.  Forward-only by design (this IS a backward)."""
    n, d = x.shape
    r = solves.shape[-1]
    n1p, n2p = _ceil_to(n, TILE_BM), _ceil_to(n, TILE_BN)
    p1 = _pack_rows(x, ell, n1p)
    p2t = _pack_rows(x, ell, n2p).T
    c = 0.25 / r
    f1 = (
        jnp.zeros((n1p, _FEAT), x.dtype)
        .at[:n, 0].set(0.5 * alpha)
        .at[:n, 1 : 1 + r].set(-c * solves)
        .at[:n, 1 + r : 1 + 2 * r].set(-c * rights)
    )
    f2 = (
        jnp.zeros((n2p, _FEAT), x.dtype)
        .at[:n, 0].set(alpha)
        .at[:n, 1 : 1 + r].set(rights)
        .at[:n, 1 + r : 1 + 2 * r].set(solves)
    )
    fw = min(_ceil_to(1 + 2 * r, 8), _FEAT)
    body = functools.partial(_gibbs_panel_bwd_kernel, d=d, fw=fw)
    grid = (n1p // TILE_BM, n2p // TILE_BN)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_BM, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FEAT, TILE_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BM, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FEAT, TILE_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_BM, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1p, _FEAT), jnp.float32),
    )(p1, p2t, f1, f2.T)
    return out[:n, 0:d], out[:n, 8 : 8 + d], out[:n, 16]


def packed_gibbs_panel_grads_rows(
    x_rows, ell_rows, alpha_rows, solves_rows, rights_rows,
    x, ell, alpha, solves, rights,
):
    """Row-BLOCK slice of :func:`packed_gibbs_panel_grads`: the same
    fused sweep restricted to ``x_rows`` on the row side (full x on the
    column side).  Exists for the host-chunked backward past the ~60–90 s
    program-execution wall (DESIGN §27): at N = 2M the full sweep is one
    ~75 s device program — fatal — while ⌈N/nr⌉ row-block programs each
    stay well under it.  Concatenating the row blocks reproduces the full
    sweep exactly (each output row only ever sums over columns).
    Returns ``(gx (nr, d), gell (nr, d), sp (nr,))``."""
    nr, d = x_rows.shape
    n = x.shape[0]
    r = solves.shape[-1]
    n1p, n2p = _ceil_to(nr, TILE_BM), _ceil_to(n, TILE_BN)
    p1 = _pack_rows(x_rows, ell_rows, n1p)
    p2t = _pack_rows(x, ell, n2p).T
    c = 0.25 / r
    f1 = (
        jnp.zeros((n1p, _FEAT), x.dtype)
        .at[:nr, 0].set(0.5 * alpha_rows)
        .at[:nr, 1 : 1 + r].set(-c * solves_rows)
        .at[:nr, 1 + r : 1 + 2 * r].set(-c * rights_rows)
    )
    f2 = (
        jnp.zeros((n2p, _FEAT), x.dtype)
        .at[:n, 0].set(alpha)
        .at[:n, 1 : 1 + r].set(rights)
        .at[:n, 1 + r : 1 + 2 * r].set(solves)
    )
    fw = min(_ceil_to(1 + 2 * r, 8), _FEAT)
    body = functools.partial(_gibbs_panel_bwd_kernel, d=d, fw=fw)
    grid = (n1p // TILE_BM, n2p // TILE_BN)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_BM, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FEAT, TILE_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BM, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_FEAT, TILE_BN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_BM, _FEAT), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1p, _FEAT), jnp.float32),
    )(p1, p2t, f1, f2.T)
    return out[:nr, 0:d], out[:nr, 8 : 8 + d], out[:nr, 16]


@functools.lru_cache(maxsize=8)
def packed_gibbs_panel_vjp(d: int):
    """Fused replacement for ``lazy_cg_mll``'s backward panel scan, for
    the packed-payload Gibbs convention (``kernels.gibbs.
    packed_gibbs_cross(d)``'s operator, scaled or not — branches on
    ``kernel is None`` exactly as the cross does).  Contract (see
    ``ops/lazy_cg.py::core_bwd``):

        panel_vjp(kernel, aug, sigma2, alpha, solves, rights, g)
            -> (kernel_grad, aug_grad, sigma2_grad)

    Valid ONLY for the symmetric K(aug, aug) MLL pullback (which is the
    only way core_bwd is ever invoked): total = 2× the row-side sweep.
    σ²'s pullback is the trace identity g·tr(Ŵ) — O(N·R) host algebra,
    no panel needed."""
    from nonstationary_precip_tpu.utils.transforms import positive

    def panel_vjp(kernel, aug, sigma2, alpha, solves, rights, g):
        x, le = aug[:, :d], aug[:, d:]
        ell = jnp.exp(le)
        gx, gl, sp = packed_gibbs_panel_grads(x, ell, alpha, solves, rights)
        gaug = 2.0 * g * jnp.concatenate([gx, gl * ell], axis=1)
        r = solves.shape[-1]
        s2g = g * (
            0.5 * jnp.dot(alpha, alpha)
            - (0.5 / r) * jnp.sum(solves * rights)
        )
        if kernel is None:
            return None, gaug, s2g
        s2, pullback = jax.vjp(positive, kernel)
        (kg,) = pullback(g * jnp.sum(sp))
        return kg, s2 * gaug, s2g

    return panel_vjp


# ---------------------------------------------------------------------------
# SE-ARD (RBF) — quadratic form on the MXU
# ---------------------------------------------------------------------------


def _rbf_kernel(p1_ref, p2t_ref, v_ref, out_ref, *, precision):
    # payload: lanes 0..8 = x/ℓ (zero-padded past D), lane 8 = ‖x/ℓ‖²
    a = p1_ref[:, 0:8]  # (TM, 8)
    bt = p2t_ref[0:8, :]  # (8, TN)
    # the quadratic form stays at full precision regardless of the
    # contraction setting — exp() amplifies its error
    ab = jnp.dot(
        a, bt, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TM, TN)
    a2 = p1_ref[:, 8:9]
    b2 = p2t_ref[8:9, :]
    quad = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    tile = jnp.exp(-0.5 * quad)
    acc = _contract(tile, v_ref[:], precision)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        out_ref[:] += acc


def _pack_scaled(xs, n_pad):
    n, d = xs.shape
    xp = jnp.zeros((n_pad, 8), xs.dtype).at[:n, :d].set(xs)
    sq = jnp.zeros((n_pad, 1), xs.dtype).at[:n, 0].set(jnp.sum(xs * xs, -1))
    return jnp.concatenate(
        [xp, sq, jnp.zeros((n_pad, _FEAT - 9), xs.dtype)], axis=1
    )


def make_rbf_matvec(x1, x2, ell, precision: str = "highest"):
    """Pack once, return ``matvec(v) = exp(−½‖(x1−x2)/ℓ‖²) @ v``.

    ell (D,) ARD lengthscales.  Padded rows have x = 0 ⇒ benign
    exp(−½‖a‖²) columns, annihilated by the zero-padded v rows.
    ``precision`` as in :func:`make_gibbs_matvec` (tile·v contraction
    only — the quadratic-form matmul is always exact)."""
    if x1.shape[-1] > _MAX_D:
        raise ValueError(f"rbf matvec: D ≤ {_MAX_D}")
    if precision not in ("highest", "default", "high3"):
        raise ValueError(f"precision must be highest/default/high3, got {precision!r}")
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p, n2p = _ceil_to(n1, TILE_M), _ceil_to(n2, TILE_N)
    p1 = _pack_scaled(x1 / ell, n1p)
    p2t = _pack_scaled(x2 / ell, n2p).T
    body = functools.partial(_rbf_kernel, precision=precision)

    def matvec(v):
        r = v.shape[-1]
        if r > _MAX_R:
            # column-chunk wide block rhs — see make_gibbs_matvec
            return jnp.concatenate(
                [matvec(v[:, i:i + _MAX_R]) for i in range(0, r, _MAX_R)],
                axis=1,
            )
        out = _matvec_call(body, p1, p2t, _pad_v(v, n2p), n1p, n2p)
        return out[:n1, :r]

    return matvec


def rbf_gram_matvec(x1, x2, ell, v, precision: str = "highest"):
    """One-shot SE-ARD Gram·v (see :func:`make_rbf_matvec`; use that
    inside iteration loops so packing happens once)."""
    return make_rbf_matvec(x1, x2, ell, precision)(v)


# ---------------------------------------------------------------------------
# matvec builders for ops/lazy_cg.py (stable identities — machinery is
# lru-cached on the builder object, like cross_fn)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def packed_gibbs_panel_vjp_rows(d: int):
    """Row-block form of :func:`packed_gibbs_panel_vjp` for HOST-chunked
    backwards (the full sweep is one device program whose runtime grows
    O(N²); past ~1.5M rows it crosses the ~60–90 s execution wall).

        rows(kernel, aug, sigma2, alpha, solves, rights, g, i0, nr)
            -> (gaug_rows_raw (nr, 2d), sp_sum (scalar partial))

    ``nr`` static, ``i0`` traced — one compiled program serves every
    block.  The caller concatenates ``gaug_rows_raw`` over blocks, scales
    by s² = positive(kernel) if scaled, chains the outputscale pullback
    through Σ sp_sum, and computes the (global, O(N·R)) σ² trace-identity
    gradient separately — exactly the algebra of the one-shot vjp."""

    def rows(kernel, aug, sigma2, alpha, solves, rights, g, i0, nr):
        xr_aug = jax.lax.dynamic_slice_in_dim(aug, i0, nr)
        ar = jax.lax.dynamic_slice_in_dim(alpha, i0, nr)
        sr = jax.lax.dynamic_slice_in_dim(solves, i0, nr)
        rr = jax.lax.dynamic_slice_in_dim(rights, i0, nr)
        x, le = aug[:, :d], aug[:, d:]
        ell_r = jnp.exp(xr_aug[:, d:])
        gx, gl, sp = packed_gibbs_panel_grads_rows(
            xr_aug[:, :d], ell_r, ar, sr, rr,
            x, jnp.exp(le), alpha, solves, rights,
        )
        gaug_r = 2.0 * g * jnp.concatenate([gx, gl * ell_r], axis=1)
        return gaug_r, jnp.sum(sp)

    return rows


@functools.lru_cache(maxsize=8)
def packed_gibbs_matvec_builder(d: int, precision: str = "highest"):
    """Builder for the packed-payload Gibbs convention used by the lazy
    and sharded paths: x_aug = concat([x, log_ell], 1).  Returns
    builder(kernel, x_aug, sigma2) -> matvec; ``kernel`` (the stateless
    GibbsKernel) is unused — all state rides x_aug.  ``precision`` as in
    :func:`make_gibbs_matvec` ('high3' halves the contraction's MXU
    passes; never pass 'default' for CG — measured divergent)."""

    def builder(kernel, x_aug, sigma2):
        x, le = x_aug[:, :d], x_aug[:, d:]
        ell = jnp.exp(le)
        mv = make_gibbs_matvec(x, ell, x, ell, precision)  # packed once

        def matvec(v):
            return mv(v) + sigma2 * v

        return matvec

    return builder


@functools.lru_cache(maxsize=8)
def scaled_packed_gibbs_matvec_builder(d: int, precision: str = "highest"):
    """Like :func:`packed_gibbs_matvec_builder` but honours ``kernel`` as
    the RAW outputscale (softplus raw scalar): v ↦ s²·K_gibbs v + σ²v.
    Forward-only counterpart of ``kernels.gibbs.packed_gibbs_cross(d)`` —
    the lazy custom-VJP backward rebuilds panels through that cross_fn,
    which is where the s² (and lengthscale) gradients come from."""
    from nonstationary_precip_tpu.utils.transforms import positive

    def builder(raw_s2, x_aug, sigma2):
        x, le = x_aug[:, :d], x_aug[:, d:]
        ell = jnp.exp(le)
        mv = make_gibbs_matvec(x, ell, x, ell, precision)  # packed once
        s2 = positive(raw_s2)

        def matvec(v):
            return s2 * mv(v) + sigma2 * v

        return matvec

    return builder


def stationary_matvec_builder(kernel, x, sigma2):
    """Builder for ``ExactGP``'s default kernels: RBF or Scale(RBF)
    pytrees (kernels/stationary.py).  Module-level, so its identity is
    stable across calls."""
    from nonstationary_precip_tpu.kernels.base import Scale
    from nonstationary_precip_tpu.kernels.stationary import RBF

    scale = None
    base = kernel
    if isinstance(kernel, Scale):
        scale = kernel.outputscale
        base = kernel.base
    if not isinstance(base, RBF):
        raise TypeError(
            "stationary_matvec_builder supports RBF / Scale(RBF); got "
            f"{type(base).__name__} — use cross_fn panels or "
            "packed_gibbs_matvec_builder instead"
        )
    xs = base._slice(x)
    mv = make_rbf_matvec(xs, xs, base.lengthscale)  # packed once per loss eval

    def matvec(v):
        kv = mv(v)
        if scale is not None:
            kv = scale * kv
        return kv + sigma2 * v

    return matvec
