"""Pallas TPU kernel: tiled log-domain Sinkhorn ("online" backend).

This is the TPU-native replacement for pykeops' streaming LazyTensor
backend (`/root/reference/search_dg.py:116`, geomloss ``backend='online'``):
the N x M cosine-cost matrix is never materialized in HBM. Each softmin
update

    f_i = -eps * LSE_j [ log_b_j + (g_j - C_ij) / eps ],   C = 1 - <x_i, y_j>

streams j-tiles through VMEM with flash-attention-style running-max/sum
accumulation; the cost tile is one MXU matmul (x_tile @ y_tile^T).

For the search loop's tiny clouds (B≈8/domain) the pure-jnp path in
``sinkhorn.py`` is faster (kernel launch overhead dominates); this kernel
is the scale path (thousands of points per domain, e.g. pixel-level or
multi-host-gathered features) and is exercised by ``bench.py --sinkhorn``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sinkhorn import _eps_schedule

_NEG_INF = -1e30


def _softmin_kernel(eps_ref, xn_ref, yn_ref, zb_ref, f_ref,
                    m_scratch, s_scratch):
    """Grid (NI, NJ), j innermost. Computes, for the i-th row tile,
    f = -eps * LSE over all j of (zb_j - C_ij / eps)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    eps = eps_ref[0, 0]
    inv_eps = 1.0 / eps

    @pl.when(j == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        s_scratch[:] = jnp.zeros_like(s_scratch)

    x = xn_ref[:]                       # (BI, D)
    y = yn_ref[:]                       # (BJ, D)
    zb = zb_ref[:]                      # (1, BJ): log_b + g/eps (padded
    #                                     entries are -inf)
    cost = 1.0 - jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    z = zb + (-cost) * inv_eps          # (BI, BJ)

    m_old = m_scratch[:]                # (BI, 1)
    z_max = jnp.max(z, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, z_max)
    # guard fully-masked tiles (all -inf): exp(-inf - -inf) -> use where
    scale = jnp.where(m_old > _NEG_INF / 2, jnp.exp(m_old - m_new), 0.0)
    s_new = s_scratch[:] * scale + jnp.sum(
        jnp.exp(z - m_new), axis=1, keepdims=True)
    m_scratch[:] = m_new
    s_scratch[:] = s_new

    @pl.when(j == nj - 1)
    def _():
        f_ref[:] = -eps * (m_scratch[:] +
                           jnp.log(jnp.maximum(s_scratch[:], 1e-30)))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def softmin_online(eps, xn: jnp.ndarray, yn: jnp.ndarray,
                   z_b: jnp.ndarray, block_i: int = 256,
                   block_j: int = 256) -> jnp.ndarray:
    """f_i = -eps * LSE_j(z_b[j] - (1 - <xn_i, yn_j>)/eps), tiled.

    xn (N, D), yn (M, D): row-normalized point clouds. z_b (M,): log-weight
    plus potential/eps (use -inf for padded rows). Returns (N,).
    N, M, D should be padded to multiples of (block_i, block_j, 128)
    by the caller (``sinkhorn_online`` does this).
    """
    n, d = xn.shape
    m = yn.shape[0]
    ni = n // block_i
    nj = m // block_j

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ni, nj),
        scratch_shapes=[pltpu.VMEM((block_i, 1), jnp.float32),
                        pltpu.VMEM((block_i, 1), jnp.float32)],
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    f = pl.pallas_call(
        _softmin_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d, bytes_accessed=4 * (n * d + m * d + n),
            transcendentals=n * m),
    )(eps_arr, xn, yn, z_b[None, :])
    return f[:, 0]


@functools.partial(jax.jit, static_argnames=("blur", "scaling", "debias",
                                             "extra_iters", "diameter",
                                             "block"))
def sinkhorn_online(x: jnp.ndarray, y: jnp.ndarray,
                    w_x: Optional[jnp.ndarray] = None,
                    w_y: Optional[jnp.ndarray] = None,
                    blur: float = 0.05, scaling: float = 0.5,
                    debias: bool = True, extra_iters: int = 5,
                    diameter: float = 2.0,
                    block: Optional[int] = None) -> jnp.ndarray:
    """Debiased Sinkhorn divergence with the tiled Pallas softmin.

    Same semantics as ``sinkhorn.sinkhorn_divergence`` (validated against
    it in tests); intended for clouds large enough that the dense cost
    matrix should never hit HBM.
    """
    n_raw, d_raw = x.shape
    m_raw = y.shape[0]
    if block is None:
        # bigger tiles amortize the LSE passes (measured 2.4x from 256 to
        # 1024 at 8k points); small clouds keep small tiles to limit padding
        longest = max(n_raw, m_raw)
        block = 1024 if longest >= 4096 else (
            512 if longest >= 1024 else 256)
    a = jnp.full((n_raw,), 1.0 / n_raw) if w_x is None else w_x / jnp.sum(w_x)
    b = jnp.full((m_raw,), 1.0 / m_raw) if w_y is None else w_y / jnp.sum(w_y)

    # normalize rows; pad N/M to block multiples and D to the lane width
    def prep(pts, w):
        pts = pts.astype(jnp.float32)
        norm = jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True),
                           1e-8)
        pts = pts / norm
        n = pts.shape[0]
        n_pad = _round_up(n, block)
        d_pad = _round_up(pts.shape[1], 128)
        pts = jnp.pad(pts, ((0, n_pad - n), (0, d_pad - pts.shape[1])))
        logw = jnp.pad(jnp.log(jnp.maximum(w, 1e-30)),
                       (0, n_pad - n), constant_values=_NEG_INF)
        wp = jnp.pad(w, (0, n_pad - n))
        return pts, logw, wp

    xn, log_a, ap = prep(x, a)
    yn, log_b, bp = prep(y, b)
    eps_list = _eps_schedule(diameter, blur, scaling, extra_iters)

    def ot_dual(xn, yn, log_p, log_q, p, q):
        f = jnp.zeros((xn.shape[0],), jnp.float32)
        g = jnp.zeros((yn.shape[0],), jnp.float32)

        def body(carry, eps):
            f, g = carry
            f_new = softmin_online(eps, xn, yn, log_q + g / eps,
                                   block, block)
            g_new = softmin_online(eps, yn, xn, log_p + f / eps,
                                   block, block)
            return (0.5 * (f + f_new), 0.5 * (g + g_new)), None

        (f, g), _ = jax.lax.scan(body, (f, g), eps_list)
        eps = eps_list[-1]
        f = softmin_online(eps, xn, yn, log_q + g / eps, block, block)
        g = softmin_online(eps, yn, xn, log_p + f / eps, block, block)
        return jnp.sum(p * f) + jnp.sum(q * g)

    ot_xy = ot_dual(xn, yn, log_a, log_b, ap, bp)
    if not debias:
        return ot_xy
    ot_xx = ot_dual(xn, xn, log_a, log_a, ap, ap)
    ot_yy = ot_dual(yn, yn, log_b, log_b, bp, bp)
    return jnp.maximum(ot_xy - 0.5 * ot_xx - 0.5 * ot_yy, 0.0)
