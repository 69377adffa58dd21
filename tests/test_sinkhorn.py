import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.ops.sinkhorn import (cosine_cost, sinkhorn_divergence,
                                   pairwise_domain_ot)


class TestCosineCost:
    def test_self_cost_zero_diag(self, rng):
        x = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
        c = cosine_cost(x, x)
        np.testing.assert_allclose(np.asarray(jnp.diag(c)), 0.0, atol=1e-6)
        assert float(c.min()) >= -1e-6 and float(c.max()) <= 2.0 + 1e-6

    def test_orthogonal_cost_one(self):
        x = jnp.asarray([[1.0, 0.0]])
        y = jnp.asarray([[0.0, 1.0]])
        assert float(cosine_cost(x, y)[0, 0]) == pytest.approx(1.0)


class TestSinkhornDivergence:
    def test_identical_clouds_zero(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        assert float(sinkhorn_divergence(x, x)) == pytest.approx(0.0,
                                                                 abs=1e-4)

    def test_symmetry(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32) + 0.5)
        assert float(sinkhorn_divergence(x, y)) == pytest.approx(
            float(sinkhorn_divergence(y, x)), rel=1e-4)

    def test_positivity_and_separation(self, rng):
        x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        y = jnp.asarray(-np.asarray(x))  # antipodal: cosine distance 2
        d = float(sinkhorn_divergence(x, y))
        assert d > 0.5

    def test_matches_exact_ot_small_blur(self, rng):
        """As blur -> 0 the (non-debiased) value approaches the exact OT
        cost; check against scipy's assignment solver on equal-size
        uniform clouds (where an optimal plan is a permutation)."""
        from scipy.optimize import linear_sum_assignment
        x = rng.normal(size=(6, 4)).astype(np.float32)
        y = rng.normal(size=(6, 4)).astype(np.float32)
        c = np.asarray(cosine_cost(jnp.asarray(x), jnp.asarray(y)))
        ri, ci = linear_sum_assignment(c)
        exact = c[ri, ci].mean()
        approx = float(sinkhorn_divergence(
            jnp.asarray(x), jnp.asarray(y), blur=0.001, debias=False,
            extra_iters=200))
        assert approx == pytest.approx(exact, abs=0.02)

    def test_weighted_masking(self, rng):
        x = rng.normal(size=(6, 8)).astype(np.float32)
        y = rng.normal(size=(8, 8)).astype(np.float32)
        # appending zero-weight garbage must not change the value
        y_pad = np.concatenate([y, 100 * np.ones((2, 8), np.float32)])
        w_y = jnp.asarray([1.0] * 8 + [0.0] * 2)
        d_ref = float(sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y)))
        d_pad = float(sinkhorn_divergence(jnp.asarray(x),
                                          jnp.asarray(y_pad), w_y=w_y))
        assert d_pad == pytest.approx(d_ref, rel=1e-3, abs=1e-5)

    def test_jit_and_vmap(self, rng):
        feats = jnp.asarray(rng.normal(size=(3, 8, 16)).astype(np.float32))
        total = jax.jit(pairwise_domain_ot)(feats)
        assert np.isfinite(float(total))
        # sum over the 3 unordered pairs
        manual = sum(float(sinkhorn_divergence(feats[i], feats[j]))
                     for i, j in [(0, 1), (0, 2), (1, 2)])
        assert float(total) == pytest.approx(manual, rel=1e-4)

    def test_gradients_finite(self, rng):
        x = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
        g = jax.grad(lambda a: sinkhorn_divergence(a, y))(x)
        assert np.all(np.isfinite(np.asarray(g)))
