"""Entropic optimal transport (Sinkhorn divergence) in pure JAX.

TPU-native replacement for the reference's geomloss/pykeops dependency —
``SamplesLoss("sinkhorn", cost='(IntCst(1)-(X|Y)/(Norm2(X)*Norm2(Y)))',
backend='online')`` (`/root/reference/search_dg.py:116`), where KeOps
JIT-compiles CUDA kernels at runtime. Here: log-domain symmetric Sinkhorn
with epsilon annealing (geomloss defaults blur=0.05, scaling=0.5,
debias=True) on a cosine-distance cost, traced once under ``jit`` with a
static iteration schedule (``lax``-friendly: no data-dependent loop bounds).

The point clouds this framework feeds are small (B≈8 samples of 128-d
features per domain per policy, `search_dg.py:150-162`), so the cost matrix
comfortably fits VMEM and a dense-in-registers formulation is *faster* on
TPU than a streamed one; `sinkhorn_pallas.py` provides the tiled kernel for
large clouds where the N×M cost matrix must never materialize in HBM
(KeOps' "online" semantics).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def cosine_cost(x: jnp.ndarray, y: jnp.ndarray,
                eps: float = 1e-8) -> jnp.ndarray:
    """C[i,j] = 1 - <x_i, y_j> / (|x_i| |y_j|). x: (N,D), y: (M,D)."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return 1.0 - xn @ yn.T


def _eps_schedule(diameter: float, blur: float, scaling: float,
                  extra_iters: int) -> jnp.ndarray:
    """Annealed temperatures from diameter down to blur (geomloss-style
    epsilon scaling in the distance domain; eps = scale**p with p=1 for a
    bounded cosine cost), plus ``extra_iters`` at the target blur."""
    n_anneal = max(1, int(math.ceil(
        math.log(blur / diameter) / math.log(scaling))))
    scales = [diameter * (scaling ** k) for k in range(n_anneal)]
    scales += [blur] * (extra_iters + 1)
    return jnp.asarray(scales, dtype=jnp.float32)


def _softmin(eps: jnp.ndarray, cost: jnp.ndarray, log_w: jnp.ndarray,
             pot: jnp.ndarray) -> jnp.ndarray:
    """-eps * LSE_j [ log_w_j + (pot_j - C_ij) / eps ] for each row i."""
    return -eps * jax.nn.logsumexp(
        log_w[None, :] + (pot[None, :] - cost) / eps, axis=1)


@partial(jax.jit, static_argnames=("blur", "scaling", "debias",
                                   "extra_iters", "diameter"))
def sinkhorn_divergence(x: jnp.ndarray, y: jnp.ndarray,
                        w_x: Optional[jnp.ndarray] = None,
                        w_y: Optional[jnp.ndarray] = None,
                        blur: float = 0.05, scaling: float = 0.5,
                        debias: bool = True, extra_iters: int = 5,
                        diameter: float = 2.0) -> jnp.ndarray:
    """Debiased Sinkhorn divergence S(a, b) between two weighted clouds.

    S = OT_eps(a,b) - 0.5 OT_eps(a,a) - 0.5 OT_eps(b,b), with OT_eps
    evaluated from the dual potentials (<a, f> + <b, g>).

    x: (N, D), y: (M, D); w_x/w_y optional nonnegative weights (normalized
    internally; default uniform). All math in f32.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    n, m = x.shape[0], y.shape[0]
    a = jnp.full((n,), 1.0 / n) if w_x is None else w_x / jnp.sum(w_x)
    b = jnp.full((m,), 1.0 / m) if w_y is None else w_y / jnp.sum(w_y)
    log_a = jnp.log(jnp.maximum(a, 1e-30))
    log_b = jnp.log(jnp.maximum(b, 1e-30))

    c_xy = cosine_cost(x, y)
    eps_list = _eps_schedule(diameter, blur, scaling, extra_iters)

    def ot_dual(cost, log_p, log_q, p, q):
        """Symmetric annealed Sinkhorn; returns <p,f> + <q,g>."""
        f = jnp.zeros_like(log_p)
        g = jnp.zeros_like(log_q)

        def body(carry, eps):
            f, g = carry
            # Jacobi-style symmetric updates with averaging (stable
            # through the annealing schedule)
            f_new = _softmin(eps, cost, log_q, g)
            g_new = _softmin(eps, cost.T, log_p, f)
            f = 0.5 * (f + f_new)
            g = 0.5 * (g + g_new)
            return (f, g), None

        (f, g), _ = jax.lax.scan(body, (f, g), eps_list)
        # final un-averaged half-step at target blur for exact marginals
        eps = eps_list[-1]
        f = _softmin(eps, cost, log_q, g)
        g = _softmin(eps, cost.T, log_p, f)
        return jnp.sum(p * f) + jnp.sum(q * g)

    ot_xy = ot_dual(c_xy, log_a, log_b, a, b)
    if not debias:
        return ot_xy
    ot_xx = ot_dual(cosine_cost(x, x), log_a, log_a, a, a)
    ot_yy = ot_dual(cosine_cost(y, y), log_b, log_b, b, b)
    return jnp.maximum(ot_xy - 0.5 * ot_xx - 0.5 * ot_yy, 0.0)


def pairwise_domain_ot(features: jnp.ndarray, blur: float = 0.05,
                       scaling: float = 0.5, debias: bool = True,
                       extra_iters: int = 5,
                       diameter: float = 2.0) -> jnp.ndarray:
    """Sum of Sinkhorn divergences over all domain pairs.

    features: (D, B, F) — D domains, B samples each (the static-shape
    equivalent of the reference's boolean-index split,
    `search_dg.py:151-161`; our domain-stratified batch keeps exactly B
    samples per domain, so no dynamic gathers are needed).
    Returns the scalar sum over the D*(D-1)/2 unordered pairs.
    """
    d = features.shape[0]
    pairs_i, pairs_j = jnp.triu_indices(d, k=1)
    xs = features[pairs_i]  # (P, B, F)
    ys = features[pairs_j]

    div = jax.vmap(lambda u, v: sinkhorn_divergence(
        u, v, blur=blur, scaling=scaling, debias=debias,
        extra_iters=extra_iters, diameter=diameter))(xs, ys)
    return jnp.sum(div)
