"""Pallas tiled Sinkhorn vs the dense log-domain reference.

On CPU the kernel runs via the Pallas interpreter (slow but exact); the
hardware path is exercised on TPU by bench/verify drives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.ops.sinkhorn import sinkhorn_divergence


@pytest.fixture(scope="module")
def interp_online():
    """Run the pallas kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    from aadg_tpu.ops import sinkhorn_pallas as SP

    def run(x, y, **kw):
        with pltpu.force_tpu_interpret_mode():
            return SP.sinkhorn_online(x, y, **kw)
    return run


def test_matches_dense(interp_online, rng):
    x = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(160, 32)).astype(np.float32) + 0.3)
    d_ref = float(sinkhorn_divergence(x, y))
    d_onl = float(interp_online(x, y, block=128))
    assert d_onl == pytest.approx(d_ref, rel=1e-4, abs=1e-6)


def test_self_zero(interp_online, rng):
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    assert float(interp_online(x, x, block=64)) == pytest.approx(
        0.0, abs=1e-4)


def test_padding_invariance(interp_online, rng):
    # non-multiple-of-block sizes go through the padded path
    x = jnp.asarray(rng.normal(size=(70, 16)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32) + 0.2)
    d_ref = float(sinkhorn_divergence(x, y))
    d_onl = float(interp_online(x, y, block=64))
    assert d_onl == pytest.approx(d_ref, rel=1e-4, abs=1e-6)
