"""DepthwiseConv3x3 (shifted-add fallback kernel) vs native grouped conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from aadg_tpu.ops.convs import DepthwiseConv3x3


@pytest.mark.parametrize("dilation,stride,size",
                         [(1, 1, 16), (1, 2, 16), (2, 1, 16), (12, 1, 16),
                          (36, 1, 16), (1, 2, 17)])
def test_depthwise_matches_native_conv(rng, dilation, stride, size):
    x = jnp.asarray(rng.normal(size=(2, size, size, 8)).astype(np.float32))
    mod = DepthwiseConv3x3(dilation=dilation, stride=stride)
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(8, (3, 3), strides=(stride, stride), padding=dilation,
                  feature_group_count=8, kernel_dilation=(dilation,) * 2,
                  use_bias=False)
    out = mod.apply(v, x)
    refout = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
    assert out.shape == refout.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(refout),
                               atol=1e-5)


def test_depthwise_gradients_match(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    mod = DepthwiseConv3x3(dilation=12)
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(8, (3, 3), padding=12, feature_group_count=8,
                  kernel_dilation=(12, 12), use_bias=False)
    g1 = jax.grad(lambda k: jnp.sum(
        mod.apply({"params": {"kernel": k}}, x) ** 2))(
        v["params"]["kernel"])
    g2 = jax.grad(lambda k: jnp.sum(
        ref.apply({"params": {"kernel": k}}, x) ** 2))(
        v["params"]["kernel"])
    # f32 accumulation-order differences only (measured rel err ~1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-3)
