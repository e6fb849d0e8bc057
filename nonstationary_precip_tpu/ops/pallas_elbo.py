"""Fused DSVI ELBO data term for the flagship DeepGP topology.

The round-2 step anatomy (tools/profile_dsvi.py, DESIGN.md §12) left
~0.2 ms of the 0.58 ms value-and-grad in "diffuse small fusions": the
per-sample layer chains forward (0.033 ms) and their autodiff backward
plus the precompute VJP GEMMs (0.17 ms) — ~30 ops with no single op
above 20 µs, i.e. pure per-op latency.  This module collapses the whole
data term (everything downstream of the fused K_zz precompute) into a
``jax.custom_vjp`` primitive whose forward and hand-derived backward
each run as ONE Pallas launch on TPU (`elbo_data_term_fused`), with the
pure-jnp forms (`_reference_fwd`, `_reference_bwd`) as oracle and
off-TPU fallback.

Topology covered (the benchmark flagship, reference
``experiments/deepgp_spatial_bench.py:80-92`` / ``models/dgps.py``):
2 hidden SVGP layers (Din→2→2, linear means) + scalar head (constant
mean), marginal-sample DSVI with S samples.  ``eligible`` gates to it;
everything else keeps the composed XLA path.

Sampling parity: the DSVI noise ``eps`` is drawn OUTSIDE (same key
schedule as ``DeepGP.propagate``) and passed in, so the fused path is
bit-identical in distribution to the composed path for the same key.

Gradient flow: returns cotangents for W (the precompute's packed
product — flows into ``svgp_precompute_fused``'s VJP), z, ell, s2 of
every layer, the mean parameters, the likelihood noise, and y.  The KL
term stays outside (tiny, exact autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FEAT = 128  # lane padding for feature dims
BLOCK = 128


def _rbf_cross(x, z, ell, s2):
    """K_xz for one output dim: x (B, D), z (M, D) → (B, M)."""
    xs = x / ell
    zs = z / ell
    x_sq = jnp.sum(xs * xs, axis=-1)
    z_sq = jnp.sum(zs * zs, axis=-1)
    quad = jnp.maximum(x_sq[:, None] + z_sq[None, :] - 2.0 * xs @ zs.T, 0.0)
    return s2 * jnp.exp(-0.5 * quad)


def _layer_marginals(h, z, ell, s2, w):
    """Marginals of an O-dim layer at inputs h (B, D).

    z (O, M, D), ell (O, D), s2 (O,), w (O, M, P=2M+1) →
    (mean_noprior (O, B), var (O, B), k_xz (O, B, M), out (O, B, P))."""
    o, m, _ = z.shape
    k_xz = jax.vmap(lambda z_o, e_o, s_o: _rbf_cross(h, z_o, e_o, s_o))(z, ell, s2)
    out = jnp.einsum("obm,omp->obp", k_xz, w)
    mean = out[..., 0]
    a_s = out[..., 1 : m + 1]
    a = out[..., m + 1 : 2 * m + 1]
    var = s2[:, None] - jnp.sum(a * a, axis=-1) + jnp.sum(a_s * a_s, axis=-1)
    return mean, jnp.clip(var, 1e-10, None), k_xz, out


def _reference_fwd(x, y, eps1, eps2, params, noise):
    """Pure-jnp data term = mean_S mean_B E[log N(y | f_head, σ²)].

    params: dict with z/ell/s2/w stacked per group:
      l1: z (2,M,D), ell (2,D), s2 (2,), w (2,M,P), mw (D,2), mb (2,)
      l2: z (2,M,2), ell (2,2), s2 (2,), w (2,M,P), mw (2,2), mb (2,)
      hd: z (1,M,2), ell (1,2), s2 (1,), w (1,M,P), mb (1,)
    eps1/eps2: (S, 2, B) DSVI noise (layer-1 / layer-2).
    Returns (data_term, residuals for the hand backward)."""
    s_num = eps1.shape[0]

    m1, v1, _, _ = _layer_marginals(
        x, params["z1"], params["ell1"], params["s21"], params["w1"]
    )
    m1 = m1 + (x @ params["mw1"] + params["mb1"]).T  # linear mean, (2, B)

    def one_sample(e1, e2):
        h1 = (m1 + jnp.sqrt(v1) * e1).T  # (B, 2)
        m2, v2, _, _ = _layer_marginals(
            h1, params["z2"], params["ell2"], params["s22"], params["w2"]
        )
        m2 = m2 + (h1 @ params["mw2"] + params["mb2"]).T
        h2 = (m2 + jnp.sqrt(v2) * e2).T  # (B, 2)
        mh, vh, _, _ = _layer_marginals(
            h2, params["zh"], params["ellh"], params["s2h"], params["wh"]
        )
        mh = mh[0] + params["mbh"][0]  # (B,)
        return h1, h2, mh, vh[0]

    h1s, h2s, means, variances = jax.vmap(one_sample)(eps1, eps2)
    ell_term = -0.5 * (
        jnp.log(2.0 * jnp.pi * noise) + ((y - means) ** 2 + variances) / noise
    )
    data_term = jnp.mean(jnp.mean(ell_term, axis=-1), axis=0)
    return data_term, (m1, v1, h1s, h2s, means, variances)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------


def _lane_mask(rows, cols, lo, hi):
    return ((cols >= lo) & (cols < hi)).astype(jnp.float32)


def _group_marginals_k(h, z_o, ellinv_o, s2_o, w_o, m, lane0, mask_as, mask_a):
    """In-kernel marginals for ONE output dim at inputs h (R, 128).

    Returns (mean_noprior (R,1), var (R,1) clipped)."""
    xs = h * ellinv_o  # (R, 128)
    zs = z_o * ellinv_o  # (Mp, 128)
    x_sq = jnp.sum(xs * xs, axis=-1, keepdims=True)  # (R, 1)
    z_sq = jnp.sum(zs * zs, axis=-1, keepdims=True)  # (Mp, 1)
    cross = jnp.dot(xs, zs.T, preferred_element_type=jnp.float32)  # (R, Mp)
    quad = jnp.maximum(x_sq + z_sq.T - 2.0 * cross, 0.0)
    k = s2_o * jnp.exp(-0.5 * quad)
    out = jnp.dot(k, w_o, preferred_element_type=jnp.float32)  # (R, Pp)
    mean = jnp.sum(out * lane0, axis=-1, keepdims=True)
    s_as = jnp.sum(out * out * mask_as, axis=-1, keepdims=True)
    s_a = jnp.sum(out * out * mask_a, axis=-1, keepdims=True)
    var = jnp.maximum(s2_o - s_a + s_as, 1e-10)
    return mean, var


def _elbo_fwd_kernel(
    x_ref, yrep_ref, eps1_ref, eps2_ref, z_ref, ellinv_ref, s2_ref, w_ref,
    mw_ref, noise_ref, valid_ref,
    out_ref, h1_ref, h2_ref,
    *, s_num: int, b: int, bp: int, m: int, pp: int,
):
    """Forward data term.  Row tiles: x (Bp, 128); sample-stacked tiles
    (S·Bp, 128).  z (5, Mp, 128); w (5, Mp, Pp) zero-padded; ellinv
    (5, 1, 128) holds 1/ℓ in lanes < D; s2 SMEM (1, 5); mw (8, 128)
    packs [mw1ᵀ rows 0-1 | mb1 row 2 | mw2ᵀ rows 3-4 | mb2 row 5 |
    mbh row 6]."""
    rbp = s_num * bp
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, _FEAT), 1)
    lane0_feat = (lanes1 == 0).astype(jnp.float32)
    lane1_feat = (lanes1 == 1).astype(jnp.float32)
    lanesp = jax.lax.broadcasted_iota(jnp.int32, (1, pp), 1)
    lane0 = (lanesp == 0).astype(jnp.float32)
    mask_as = ((lanesp >= 1) & (lanesp < m + 1)).astype(jnp.float32)
    mask_a = ((lanesp >= m + 1) & (lanesp < 2 * m + 1)).astype(jnp.float32)

    x = x_ref[:]  # (Bp, 128)

    # ---- layer 1 (output dims 0, 1; linear mean) ------------------------
    means1, sds1 = [], []
    for o in range(2):
        mean, var = _group_marginals_k(
            x, z_ref[o], ellinv_ref[o], s2_ref[0, o], w_ref[o],
            m, lane0, mask_as, mask_a,
        )
        linmean = jnp.sum(x * mw_ref[o : o + 1, :], axis=-1, keepdims=True)
        mb_o = jnp.sum(
            mw_ref[2:3, :] * (lanes1 == o), axis=-1, keepdims=True
        )  # (1, 1)
        means1.append(mean + linmean + mb_o)
        sds1.append(jnp.sqrt(var))

    for s in range(s_num):
        eps_s = eps1_ref[s * bp : (s + 1) * bp, :]  # (Bp, 128), lanes 0-1
        h1_s = jnp.zeros((bp, _FEAT), jnp.float32)
        for o in range(2):
            e_o = jnp.sum(eps_s * (lanes1 == o), axis=-1, keepdims=True)
            lane_o = lane0_feat if o == 0 else lane1_feat
            h1_s = h1_s + (means1[o] + sds1[o] * e_o) * lane_o
        h1_ref[s * bp : (s + 1) * bp, :] = h1_s

    h1 = h1_ref[:]  # (S·Bp, 128)

    # ---- layer 2 (output dims 2, 3; linear mean on h1) ------------------
    means2, sds2 = [], []
    for o in range(2):
        mean, var = _group_marginals_k(
            h1, z_ref[2 + o], ellinv_ref[2 + o], s2_ref[0, 2 + o], w_ref[2 + o],
            m, lane0, mask_as, mask_a,
        )
        linmean = jnp.sum(h1 * mw_ref[3 + o : 4 + o, :], axis=-1, keepdims=True)
        mb_o = jnp.sum(
            mw_ref[5:6, :] * (lanes1 == o), axis=-1, keepdims=True
        )
        means2.append(mean + linmean + mb_o)
        sds2.append(jnp.sqrt(var))

    h2 = jnp.zeros((rbp, _FEAT), jnp.float32)
    eps2 = eps2_ref[:]
    for o in range(2):
        e_o = jnp.sum(eps2 * (lanes1 == o), axis=-1, keepdims=True)
        lane_o = lane0_feat if o == 0 else lane1_feat
        h2 = h2 + (means2[o] + sds2[o] * e_o) * lane_o
    h2_ref[:] = h2

    # ---- head (output dim 4; constant mean) -----------------------------
    meanh, varh = _group_marginals_k(
        h2, z_ref[4], ellinv_ref[4], s2_ref[0, 4], w_ref[4],
        m, lane0, mask_as, mask_a,
    )
    meanh = meanh + jnp.sum(mw_ref[6:7, :] * lane0_feat, axis=-1, keepdims=True)

    noise = noise_ref[0, 0]
    y = yrep_ref[:]  # (S·Bp, 1)
    ell = -0.5 * (
        jnp.log(2.0 * jnp.pi * noise) + ((y - meanh) ** 2 + varh) / noise
    )
    total = jnp.sum(ell * valid_ref[:]) / (s_num * b)

    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, _FEAT), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, _FEAT), 1)
    out_ref[:] = jnp.where((rows8 == 0) & (cols8 == 0), total, 0.0)


def _pack_inputs(x, y, eps1, eps2, params, noise):
    """Pad/pack every operand into the kernel layouts.  Returns
    (packed_tuple, dims) where dims = (s_num, b, bp, m, mp, pp, rbp)."""
    b = x.shape[0]
    m = params["z1"].shape[1]
    s_num = eps1.shape[0]
    # rows pad to the full 128 block: an 8-multiple pad (320) was probed
    # on chip 2026-08-17 and measured SLOWER (fwd 0.612 vs 0.586 ms) —
    # ragged 2.5-tile rows beat the 22% flop saving
    bp = -(-b // BLOCK) * BLOCK
    mp = -(-m // BLOCK) * BLOCK
    pp = -(-(2 * m + 1) // BLOCK) * BLOCK
    rbp = s_num * bp

    f32 = jnp.float32
    x_p = jnp.zeros((bp, _FEAT), f32).at[:b, :2].set(x.astype(f32))

    # stack the five output-dim groups: [l1_0, l1_1, l2_0, l2_1, head]
    z_all = jnp.concatenate(
        [params["z1"], params["z2"], params["zh"]], axis=0
    ).astype(f32)  # (5, M, D≤2)
    z_p = jnp.zeros((5, mp, _FEAT), f32).at[:, :m, : z_all.shape[-1]].set(z_all)
    ell_all = jnp.concatenate(
        [params["ell1"], params["ell2"], params["ellh"]], axis=0
    ).astype(f32)  # (5, D)
    ellinv_p = jnp.zeros((5, 1, _FEAT), f32).at[:, 0, : ell_all.shape[-1]].set(
        1.0 / ell_all
    )
    s2_all = jnp.concatenate(
        [params["s21"], params["s22"], params["s2h"]], axis=0
    ).astype(f32)[None, :]  # (1, 5)
    w_all = jnp.concatenate([params["w1"], params["w2"], params["wh"]], axis=0)
    w_p = jnp.zeros((5, mp, pp), f32).at[:, :m, : 2 * m + 1].set(w_all.astype(f32))

    mw_p = jnp.zeros((8, _FEAT), f32)
    mw_p = mw_p.at[0:2, : params["mw1"].shape[0]].set(params["mw1"].T.astype(f32))
    mw_p = mw_p.at[2, :2].set(params["mb1"].astype(f32))
    mw_p = mw_p.at[3:5, :2].set(params["mw2"].T.astype(f32))
    mw_p = mw_p.at[5, :2].set(params["mb2"].astype(f32))
    mw_p = mw_p.at[6, 0].set(params["mbh"][0].astype(f32))

    # eps: (S, 2, B) → (S·Bp, 128) lanes 0-1
    def eps_pack(e):
        e_t = jnp.swapaxes(e, 1, 2).astype(f32)  # (S, B, 2)
        e_p = jnp.zeros((s_num, bp, _FEAT), f32).at[:, :b, :2].set(e_t)
        return e_p.reshape(rbp, _FEAT)

    eps1_p = eps_pack(eps1)
    eps2_p = eps_pack(eps2)

    yrep = jnp.zeros((s_num, bp, 1), f32).at[:, :b, 0].set(
        jnp.broadcast_to(y.astype(f32), (s_num, b))
    ).reshape(rbp, 1)
    valid = jnp.zeros((s_num, bp, 1), f32).at[:, :b, 0].set(1.0).reshape(rbp, 1)
    noise_p = jnp.asarray(noise, f32)[None, None]

    packed = (x_p, yrep, eps1_p, eps2_p, z_p, ellinv_p, s2_all, w_p, mw_p,
              noise_p, valid)
    return packed, (s_num, b, bp, m, mp, pp, rbp)


def _pallas_fwd(x, y, eps1, eps2, params, noise):
    """Pallas-launch forward.  Shapes as in ``_reference_fwd``; returns
    (data_term, (packed inputs, dims, h1_p, h2_p)) — the packed operands
    ride to the backward as residuals so it never repacks."""
    packed, dims = _pack_inputs(x, y, eps1, eps2, params, noise)
    (s_num, b, bp, m, mp, pp, rbp) = dims
    f32 = jnp.float32

    out, h1_p, h2_p = pl.pallas_call(
        functools.partial(
            _elbo_fwd_kernel, s_num=s_num, b=b, bp=bp, m=m, pp=pp
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # yrep
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eps1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eps2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ellinv
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mw
            pl.BlockSpec(memory_space=pltpu.SMEM),  # noise
            pl.BlockSpec(memory_space=pltpu.VMEM),  # valid
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, _FEAT), f32),
            jax.ShapeDtypeStruct((rbp, _FEAT), f32),
            jax.ShapeDtypeStruct((rbp, _FEAT), f32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * rbp * mp * (pp + _FEAT),
            bytes_accessed=4 * (5 * mp * (pp + _FEAT) + 4 * rbp * _FEAT),
            transcendentals=5 * rbp * mp,
        ),
    )(*packed)
    del f32
    # residuals stay in the padded kernel layouts — the backward consumes
    # them directly; slice (S, B, 2) views with
    # h_p.reshape(s, bp, 128)[:, :b, :2] when needed
    return out[0, 0], (packed, dims, h1_p, h2_p)


def _pallas_bwd(packed, dims, params, y, h1_p, h2_p, gbar):
    """Backward launch: all cotangents in one kernel, consuming the
    forward's already-packed operands.  Returns
    (bars dict matching ``params``, noisebar, ybar)."""
    (s_num, b, bp, m, mp, pp, rbp) = dims
    f32 = jnp.float32
    gcoef = (jnp.asarray(gbar, f32) / (s_num * b))[None, None]

    wbar_p, zbar_p, small, ybar_p = pl.pallas_call(
        functools.partial(
            _elbo_bwd_kernel, s_num=s_num, b=b, bp=bp, m=m, pp=pp
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # yrep
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eps1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eps2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ellinv
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mw
            pl.BlockSpec(memory_space=pltpu.SMEM),  # noise
            pl.BlockSpec(memory_space=pltpu.VMEM),  # valid
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gcoef
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((5, mp, pp), f32),
            jax.ShapeDtypeStruct((5, mp, _FEAT), f32),
            jax.ShapeDtypeStruct((16, _FEAT), f32),
            jax.ShapeDtypeStruct((rbp, 1), f32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * 5 * rbp * mp * (pp + _FEAT),
            bytes_accessed=4 * (2 * 5 * mp * (pp + _FEAT) + 6 * rbp * _FEAT),
            transcendentals=5 * rbp * mp,
        ),
    )(*packed, h1_p, h2_p, gcoef)

    d1 = params["z1"].shape[-1]
    d2 = params["z2"].shape[-1]
    p_len = 2 * m + 1
    dt = params["z1"].dtype
    bars = dict(
        w1=wbar_p[0:2, :m, :p_len].astype(dt),
        w2=wbar_p[2:4, :m, :p_len].astype(dt),
        wh=wbar_p[4:5, :m, :p_len].astype(dt),
        z1=zbar_p[0:2, :m, :d1].astype(dt),
        z2=zbar_p[2:4, :m, :d2].astype(dt),
        zh=zbar_p[4:5, :m, :d2].astype(dt),
        ell1=small[0:2, :d1].astype(dt),
        ell2=small[2:4, :d2].astype(dt),
        ellh=small[4:5, :d2].astype(dt),
        s21=small[5, 0:2].astype(dt),
        s22=small[5, 2:4].astype(dt),
        s2h=small[5, 4:5].astype(dt),
        mw1=small[6:8, :d1].T.astype(dt),
        mb1=small[8, :2].astype(dt),
        mw2=small[9:11, :d2].T.astype(dt),
        mb2=small[11, :2].astype(dt),
        mbh=small[12, 0:1].astype(dt),
    )
    noisebar = small[13, 0].astype(dt)
    ybar = jnp.sum(
        ybar_p.reshape(s_num, bp)[:, : y.shape[0]], axis=0
    ).astype(dt)
    return bars, noisebar, ybar


def elbo_enabled() -> bool:
    """Cheap pre-gate for the fused data term: the env opt-in, the
    backend, and the tracing context — check this BEFORE doing any
    precompute work for the fused path (DeepGP._fused_loss builds three
    M×M Cholesky pipelines to populate ``params``; with the gate off,
    default, that work would be traced and discarded — and eager callers
    would actually execute it, ~28 ms/op through the axon tunnel).

    Also refuses manual-axes traces (shard_map/pmap): the kernel's
    custom-VJP outputs break replication inference there (DESIGN.md
    §11) — forcing the composed path automatically instead of relying on
    every DP call site remembering ``fused_elbo=False``."""
    import os

    if os.environ.get("NSGP_PALLAS_ELBO", "0") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    try:
        return not jax.core.nonempty_axis_env_DO_NOT_USE()  # shard_map/pmap
    except Exception:
        # FAIL CLOSED: if a jax upgrade removes the (private) detection
        # API we can no longer prove we're outside manual axes, and the
        # fused VJP breaks replication inference under shard_map
        # (DESIGN.md §11) — fall back to the composed path
        return False


def _elbo_eligible(x, params) -> bool:
    """Dispatch gate for the fused data term: TPU f32, the flagship
    2-hidden-layer topology (hidden width 2), M ≤ 256, B ≤ 1024, D ≤ 2.

    OPT-IN (NSGP_PALLAS_ELBO=1): on-chip measurement (2026-08-17,
    tools/bench_elbo.py) put the fused step at 0.93–0.97× the composed
    path — the ~30 diffuse backward fusions were NOT launch-bound; XLA's
    fused backward at these shapes is already near its floor and the
    kernel's mandatory lane padding (501→512, 250→256) plus in-kernel
    serialization offsets the launch savings.  Parity is exact (loss
    |Δ| 1e-7, grads 4e-3 worst rel on chip), so the path stays available
    for re-measurement on calmer service or future Mosaic versions."""
    if not elbo_enabled():
        return False
    if x.dtype != jnp.float32:
        return False
    m = params["z1"].shape[1]
    return (
        params["z1"].shape[0] == 2
        and params["z2"].shape == (2, m, 2)
        and params["zh"].shape == (1, m, 2)
        and params["z1"].shape[-1] == 2
        and m <= 2 * BLOCK
        and x.shape[0] <= 1024
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_data_term(x, y, eps1, eps2, params, noise, use_pallas: bool = False):
    """DSVI ELBO data term with a hand-derived one-launch backward.

    ``params`` is the stacked-group dict (see ``_reference_fwd``); W
    entries flow their cotangents back into the K_zz precompute's own
    custom VJP.  ``use_pallas`` routes forward+backward through the
    Pallas kernels (TPU); False runs the pure-jnp forms (oracle /
    CPU fallback) with the SAME hand backward."""
    if use_pallas:
        return _pallas_fwd(x, y, eps1, eps2, params, noise)[0]
    return _reference_fwd(x, y, eps1, eps2, params, noise)[0]


def _fused_dt_fwd(x, y, eps1, eps2, params, noise, use_pallas):
    # (nondiff args stay in their original positions for the fwd rule;
    # only the bwd rule receives them first)
    if use_pallas:
        dt, (packed, dims, h1_p, h2_p) = _pallas_fwd(x, y, eps1, eps2, params, noise)
        return dt, (packed, dims, params, x, y, eps1, eps2, h1_p, h2_p)
    dt, res = _reference_fwd(x, y, eps1, eps2, params, noise)
    return dt, (x, y, eps1, eps2, params, noise, res)


def _fused_dt_bwd(use_pallas, saved, gbar):
    if use_pallas:
        packed, dims, params, x, y, eps1, eps2, h1_p, h2_p = saved
        bars, noisebar, ybar = _pallas_bwd(
            packed, dims, params, y, h1_p, h2_p, gbar
        )
    else:
        x, y, eps1, eps2, params, noise, res = saved
        bars, noisebar, ybar = _reference_bwd(
            x, y, eps1, eps2, params, noise, res, gbar
        )
        ybar = ybar  # already gbar-scaled
    zero = lambda a: jnp.zeros_like(a)  # noqa: E731
    return (
        zero(x), ybar, zero(eps1), zero(eps2), bars,
        jnp.asarray(noisebar, x.dtype),
    )


fused_data_term.defvjp(_fused_dt_fwd, _fused_dt_bwd)


# ---------------------------------------------------------------------------
# Pallas backward kernel
# ---------------------------------------------------------------------------


def _group_fwd_k(h, z_o, ellinv_o, s2_o, w_o, lane0, mask_as, mask_a):
    """Recompute one group's forward products: (k (R,Mp), out (R,Pp),
    mean_noprior (R,1), var_unclipped (R,1))."""
    xs = h * ellinv_o
    zs = z_o * ellinv_o
    x_sq = jnp.sum(xs * xs, axis=-1, keepdims=True)
    z_sq = jnp.sum(zs * zs, axis=-1, keepdims=True)
    cross = jnp.dot(xs, zs.T, preferred_element_type=jnp.float32)
    quad = jnp.maximum(x_sq + z_sq.T - 2.0 * cross, 0.0)
    k = s2_o * jnp.exp(-0.5 * quad)
    out = jnp.dot(k, w_o, preferred_element_type=jnp.float32)
    mean = jnp.sum(out * lane0, axis=-1, keepdims=True)
    s_as = jnp.sum(out * out * mask_as, axis=-1, keepdims=True)
    s_a = jnp.sum(out * out * mask_a, axis=-1, keepdims=True)
    var_unc = s2_o - s_a + s_as
    return k, out, mean, var_unc


def _group_bwd_k(h, z_o, ellinv_o, s2_o, w_o, k, out, var_unc,
                 meanbar, varbar, lane0, mask_as, mask_a):
    """Pullback of one group given recomputed (k, out) and cotangents
    meanbar/varbar (R,1).  Returns (hbar (R,128), wbar (Mp,Pp),
    zbar (Mp,128), ellbar (1,128), s2bar (1,1))."""
    varbar = jnp.where(var_unc > 1e-10, varbar, 0.0)
    outbar = (
        meanbar * lane0
        + 2.0 * varbar * out * mask_as
        - 2.0 * varbar * out * mask_a
    )
    wbar = jnp.dot(k.T, outbar, preferred_element_type=jnp.float32)  # (Mp,Pp)
    kbar = jnp.dot(outbar, w_o.T, preferred_element_type=jnp.float32)  # (R,Mp)
    g = kbar * k
    inv_l2 = ellinv_o * ellinv_o  # (1, 128)
    g_rows = jnp.sum(g, axis=-1, keepdims=True)     # (R, 1)
    g_cols = jnp.sum(g, axis=-2, keepdims=True)     # (1, Mp)
    gz = jnp.dot(g, z_o, preferred_element_type=jnp.float32)    # (R, 128)
    gth = jnp.dot(g.T, h, preferred_element_type=jnp.float32)   # (Mp, 128)
    hbar = -(g_rows * h - gz) * inv_l2
    zbar = -(g_cols.T * z_o - gth) * inv_l2
    t1 = jnp.sum(g_rows * h * h, axis=-2, keepdims=True)        # (1, 128)
    t2 = jnp.sum(g_cols.T * z_o * z_o, axis=-2, keepdims=True)  # (1, 128)
    t3 = jnp.sum(gz * h, axis=-2, keepdims=True)                # (1, 128)
    ellbar = (t1 + t2 - 2.0 * t3) * inv_l2 * ellinv_o
    s2bar = jnp.reshape(jnp.sum(g) / s2_o + jnp.sum(varbar), (1, 1))
    return hbar, wbar, zbar, ellbar, s2bar


def _elbo_bwd_kernel(
    x_ref, yrep_ref, eps1_ref, eps2_ref, z_ref, ellinv_ref, s2_ref, w_ref,
    mw_ref, noise_ref, valid_ref, h1_ref, h2_ref, gcoef_ref,
    wbar_ref, zbar_ref, small_ref, ybar_ref,
    *, s_num: int, b: int, bp: int, m: int, pp: int,
):
    """Hand-derived pullback of the data term, one launch.

    small_ref (16, 128) layout: rows 0-4 ℓ̄ per group (lanes < D);
    row 5 s̄2 per group (lane g); rows 6-7 m̄w1ᵀ; row 8 m̄b1; rows 9-10
    m̄w2ᵀ; row 11 m̄b2; row 12 m̄bh (lane 0); row 13 noise-bar (lane 0).
    ybar_ref is sample-stacked (S·Bp, 1) — caller sums over samples."""
    rbp = s_num * bp
    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, _FEAT), 1)
    lanesp = jax.lax.broadcasted_iota(jnp.int32, (1, pp), 1)
    lane0 = (lanesp == 0).astype(jnp.float32)
    mask_as = ((lanesp >= 1) & (lanesp < m + 1)).astype(jnp.float32)
    mask_a = ((lanesp >= m + 1) & (lanesp < 2 * m + 1)).astype(jnp.float32)
    rows16 = jax.lax.broadcasted_iota(jnp.int32, (16, _FEAT), 0)
    cols16 = jax.lax.broadcasted_iota(jnp.int32, (16, _FEAT), 1)

    x = x_ref[:]
    h1 = h1_ref[:]
    h2 = h2_ref[:]
    y = yrep_ref[:]
    valid = valid_ref[:]
    noise = noise_ref[0, 0]
    coef = gcoef_ref[0, 0]  # gbar / (S·B)

    small = jnp.zeros((16, _FEAT), jnp.float32)

    # ---- head pullback ---------------------------------------------------
    k_h, out_h, mh, vh_unc = _group_fwd_k(
        h2, z_ref[4], ellinv_ref[4], s2_ref[0, 4], w_ref[4],
        lane0, mask_as, mask_a,
    )
    mbh = jnp.sum(mw_ref[6:7, :] * (lanes1 == 0), axis=-1, keepdims=True)
    mh = mh + mbh
    vh = jnp.maximum(vh_unc, 1e-10)
    diff = (mh - y) * valid
    mhbar = coef * (-diff / noise)
    vhbar = coef * (-0.5 / noise) * valid
    noisebar = coef * jnp.sum(
        valid * (-0.5 / noise + 0.5 * ((y - mh) ** 2 + vh) / (noise * noise))
    )
    ybar_ref[:] = coef * (diff / noise)

    h2bar, wb_h, zb_h, eb_h, s2b_h = _group_bwd_k(
        h2, z_ref[4], ellinv_ref[4], s2_ref[0, 4], w_ref[4],
        k_h, out_h, vh_unc, mhbar, vhbar, lane0, mask_as, mask_a,
    )
    wbar_ref[4] = wb_h
    zbar_ref[4] = zb_h
    small = small + jnp.where(rows16 == 4, eb_h, 0.0)
    small = small + jnp.where((rows16 == 5) & (cols16 == 4), s2b_h, 0.0)
    small = small + jnp.where((rows16 == 12) & (cols16 == 0), jnp.sum(mhbar), 0.0)
    small = small + jnp.where((rows16 == 13) & (cols16 == 0), noisebar, 0.0)

    # ---- layer 2 pullback ------------------------------------------------
    eps2 = eps2_ref[:]
    h1bar = jnp.zeros((rbp, _FEAT), jnp.float32)
    for o in range(2):
        k_2, out_2, m2_np, v2_unc = _group_fwd_k(
            h1, z_ref[2 + o], ellinv_ref[2 + o], s2_ref[0, 2 + o], w_ref[2 + o],
            lane0, mask_as, mask_a,
        )
        sd2 = jnp.sqrt(jnp.maximum(v2_unc, 1e-10))
        hb_o = jnp.sum(h2bar * (lanes1 == o), axis=-1, keepdims=True)  # (R,1)
        e_o = jnp.sum(eps2 * (lanes1 == o), axis=-1, keepdims=True)
        m2bar = hb_o
        v2bar = hb_o * e_o * 0.5 / sd2
        # linear mean pullback: mean2 += rowsum(h1·mw2ᵀ_o) + mb2_o
        small = small + jnp.where(
            rows16 == 9 + o,
            jnp.sum(m2bar * h1, axis=-2, keepdims=True),
            0.0,
        )
        small = small + jnp.where(
            (rows16 == 11) & (cols16 == o), jnp.sum(m2bar), 0.0
        )
        h1bar = h1bar + m2bar * mw_ref[3 + o : 4 + o, :]
        hb_g, wb_o, zb_o, eb_o, s2b_o = _group_bwd_k(
            h1, z_ref[2 + o], ellinv_ref[2 + o], s2_ref[0, 2 + o], w_ref[2 + o],
            k_2, out_2, v2_unc, m2bar, v2bar, lane0, mask_as, mask_a,
        )
        h1bar = h1bar + hb_g
        wbar_ref[2 + o] = wb_o
        zbar_ref[2 + o] = zb_o
        small = small + jnp.where(rows16 == 2 + o, eb_o, 0.0)
        small = small + jnp.where((rows16 == 5) & (cols16 == 2 + o), s2b_o, 0.0)

    # ---- layer 1 pullback (marginals shared across samples) --------------
    eps1 = eps1_ref[:]
    for o in range(2):
        k_1, out_1, m1_np, v1_unc = _group_fwd_k(
            x, z_ref[o], ellinv_ref[o], s2_ref[0, o], w_ref[o],
            lane0, mask_as, mask_a,
        )
        sd1 = jnp.sqrt(jnp.maximum(v1_unc, 1e-10))  # (Bp, 1)
        hb_o = jnp.sum(h1bar * (lanes1 == o), axis=-1, keepdims=True)  # (R,1)
        e_o = jnp.sum(eps1 * (lanes1 == o), axis=-1, keepdims=True)
        # fold the S sample-blocks down to (Bp, 1)
        m1bar = jnp.zeros((bp, 1), jnp.float32)
        v1bar = jnp.zeros((bp, 1), jnp.float32)
        for s in range(s_num):
            blk = slice(s * bp, (s + 1) * bp)
            m1bar = m1bar + hb_o[blk]
            v1bar = v1bar + hb_o[blk] * e_o[blk] * 0.5 / sd1
        small = small + jnp.where(
            rows16 == 6 + o,
            jnp.sum(m1bar * x, axis=-2, keepdims=True),
            0.0,
        )
        small = small + jnp.where(
            (rows16 == 8) & (cols16 == o), jnp.sum(m1bar), 0.0
        )
        _, wb_o, zb_o, eb_o, s2b_o = _group_bwd_k(
            x, z_ref[o], ellinv_ref[o], s2_ref[0, o], w_ref[o],
            k_1, out_1, v1_unc, m1bar, v1bar, lane0, mask_as, mask_a,
        )
        wbar_ref[o] = wb_o
        zbar_ref[o] = zb_o
        small = small + jnp.where(rows16 == o, eb_o, 0.0)
        small = small + jnp.where((rows16 == 5) & (cols16 == o), s2b_o, 0.0)

    small_ref[:] = small


def _rbf_cross_vjp(x, z, ell, s2, k_xz, kbar):
    """Pullback of K = s2·exp(−0.5‖x/ℓ − z/ℓ‖²) given the saved K.

    Returns (x̄, z̄, ℓ̄, s̄2).  dK/dquad = −K/2; quad = Σ_d (x−z)²/ℓ²."""
    g = kbar * k_xz  # (B, M) common factor, = kbar·K
    s2bar = jnp.sum(g) / s2
    # d quad/dx_d = 2 (x_d − z_d)/ℓ_d²;  chain: x̄ = Σ_m −g·(x−z)/ℓ²
    inv_l2 = 1.0 / (ell * ell)  # (D,)
    gx = jnp.sum(g, axis=1)[:, None] * x - g @ z  # (B, D): Σ_m g·(x−z)
    xbar = -gx * inv_l2
    gz = jnp.sum(g, axis=0)[:, None] * z - g.T @ x  # (M, D): Σ_b g·(z−x)
    zbar = -gz * inv_l2
    # ℓ̄: quad depends on ℓ via (x−z)²/ℓ²; d/dℓ = −2 (x−z)²/ℓ³
    # Σ_{b,m} −g·(−(x−z)²/ℓ³)·... careful: dK/dℓ_d = K · (x_d−z_d)²/ℓ_d³
    sq = (
        jnp.sum(g, axis=1) @ (x * x)
        + jnp.sum(g, axis=0) @ (z * z)
        - 2.0 * jnp.einsum("bm,bd,md->d", g, x, z)
    )  # Σ g (x−z)² per d
    ellbar = sq / (ell**3)
    return xbar, zbar, ellbar, s2bar


def _layer_marginals_vjp(h, z, ell, s2, w, k_xz, out, meanbar, varbar, var_unclipped):
    """Pullback of ``_layer_marginals`` (one O-dim group, vmapped inside).

    Inputs are the saved forward tensors; meanbar/varbar (O, B).
    Returns (h̄ (B, D), z̄, ℓ̄, s̄2, w̄)."""
    o, m, _ = z.shape
    # clip: zero gradient where var hit the floor
    varbar = jnp.where(var_unclipped > 1e-10, varbar, 0.0)
    a_s = out[..., 1 : m + 1]
    a = out[..., m + 1 : 2 * m + 1]
    outbar = jnp.concatenate(
        [
            meanbar[..., None],
            2.0 * varbar[..., None] * a_s,
            -2.0 * varbar[..., None] * a,
        ],
        axis=-1,
    )  # (O, B, P)
    wbar = jnp.einsum("obm,obp->omp", k_xz, outbar)
    kbar = jnp.einsum("obp,omp->obm", outbar, w)
    s2bar_direct = jnp.sum(varbar, axis=-1)  # (O,) from var = s2 − ... term

    def one(h_, z_o, e_o, s_o, k_o, kb_o):
        return _rbf_cross_vjp(h_, z_o, e_o, s_o, k_o, kb_o)

    xbar_o, zbar, ellbar, s2bar_k = jax.vmap(
        lambda z_o, e_o, s_o, k_o, kb_o: one(h, z_o, e_o, s_o, k_o, kb_o)
    )(z, ell, s2, k_xz, kbar)
    hbar = jnp.sum(xbar_o, axis=0)  # (B, D)
    return hbar, zbar, ellbar, s2bar_direct + s2bar_k, wbar


def _reference_bwd(x, y, eps1, eps2, params, noise, res, gbar):
    """Hand-derived pullback of ``_reference_fwd``'s data term.

    Recomputes the (cheap) grams/marginal products instead of saving
    every (S, B, M) tensor; returns a dict of cotangents matching
    ``params`` plus noisebar and ybar, each scaled by ``gbar``."""
    m1, v1, h1s, h2s, means, variances = res
    s_num, _, b = eps1.shape

    bars = {k: jnp.zeros_like(v) for k, v in params.items()}
    noisebar = 0.0
    ybar = jnp.zeros_like(y)
    m1bar_acc = jnp.zeros_like(m1)
    v1bar_acc = jnp.zeros_like(v1)

    coef = gbar / (s_num * b)
    for s in range(s_num):
        h1 = h1s[s]
        h2 = h2s[s]
        mh_s = means[s]
        vh_s = variances[s]
        # ell_term pullback
        diff = mh_s - y
        mhbar = coef * (-diff / noise)
        vhbar = coef * (-0.5 / noise) * jnp.ones_like(vh_s)
        noisebar = noisebar + coef * jnp.sum(
            -0.5 / noise + 0.5 * ((y - mh_s) ** 2 + vh_s) / (noise * noise)
        )
        ybar = ybar + coef * (-(y - mh_s) / noise)

        # head marginals pullback (recompute forward products)
        mh_r, vh_r, k_h, out_h = _layer_marginals(
            h2, params["zh"], params["ellh"], params["s2h"], params["wh"]
        )
        # unclipped var for the clip mask
        m_dim = params["zh"].shape[1]
        a_s_h = out_h[..., 1 : m_dim + 1]
        a_h = out_h[..., m_dim + 1 : 2 * m_dim + 1]
        vh_unc = params["s2h"][:, None] - jnp.sum(a_h * a_h, axis=-1) + jnp.sum(
            a_s_h * a_s_h, axis=-1
        )
        h2bar, zhb, ellhb, s2hb, whb = _layer_marginals_vjp(
            h2, params["zh"], params["ellh"], params["s2h"], params["wh"],
            k_h, out_h, mhbar[None, :], vhbar[None, :], vh_unc,
        )
        bars["zh"] += zhb
        bars["ellh"] += ellhb
        bars["s2h"] += s2hb
        bars["wh"] += whb
        bars["mbh"] += jnp.sum(mhbar)[None]

        # h2 = (m2 + sqrt(v2) eps2).T
        m2_r, v2_r, k_2, out_2 = _layer_marginals(
            h1, params["z2"], params["ell2"], params["s22"], params["w2"]
        )
        m_dim2 = params["z2"].shape[1]
        a_s_2 = out_2[..., 1 : m_dim2 + 1]
        a_2 = out_2[..., m_dim2 + 1 : 2 * m_dim2 + 1]
        v2_unc = params["s22"][:, None] - jnp.sum(a_2 * a_2, axis=-1) + jnp.sum(
            a_s_2 * a_s_2, axis=-1
        )
        v2_c = jnp.clip(v2_unc, 1e-10, None)
        m2bar = h2bar.T  # (2, B)
        v2bar = h2bar.T * eps2[s] * 0.5 / jnp.sqrt(v2_c)
        # linear mean of layer 2: m2 += (h1 @ mw2 + mb2).T
        bars["mw2"] += h1.T @ m2bar.T
        bars["mb2"] += jnp.sum(m2bar, axis=-1)
        h1bar_mean = m2bar.T @ params["mw2"].T
        h1bar, z2b, ell2b, s22b, w2b = _layer_marginals_vjp(
            h1, params["z2"], params["ell2"], params["s22"], params["w2"],
            k_2, out_2, m2bar, v2bar, v2_unc,
        )
        bars["z2"] += z2b
        bars["ell2"] += ell2b
        bars["s22"] += s22b
        bars["w2"] += w2b
        h1bar = h1bar + h1bar_mean

        # h1 = (m1 + sqrt(v1) eps1).T — m1/v1 shared across samples
        m1bar_acc = m1bar_acc + h1bar.T
        v1bar_acc = v1bar_acc + h1bar.T * eps1[s] * 0.5 / jnp.sqrt(v1)

    # layer-1 marginals pullback (once; inputs x carry no gradient)
    m1_r, v1_r, k_1, out_1 = _layer_marginals(
        x, params["z1"], params["ell1"], params["s21"], params["w1"]
    )
    m_dim1 = params["z1"].shape[1]
    a_s_1 = out_1[..., 1 : m_dim1 + 1]
    a_1 = out_1[..., m_dim1 + 1 : 2 * m_dim1 + 1]
    v1_unc = params["s21"][:, None] - jnp.sum(a_1 * a_1, axis=-1) + jnp.sum(
        a_s_1 * a_s_1, axis=-1
    )
    bars["mw1"] += x.T @ m1bar_acc.T
    bars["mb1"] += jnp.sum(m1bar_acc, axis=-1)
    _, z1b, ell1b, s21b, w1b = _layer_marginals_vjp(
        x, params["z1"], params["ell1"], params["s21"], params["w1"],
        k_1, out_1, m1bar_acc, v1bar_acc, v1_unc,
    )
    bars["z1"] += z1b
    bars["ell1"] += ell1b
    bars["s21"] += s21b
    bars["w1"] += w1b
    return bars, noisebar * 1.0, ybar
