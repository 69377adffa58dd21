import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.models.deeplab_custom import (CustomDeepLab, init_centroids,
                                            update_centroids)
from aadg_tpu.models.resnet_backbone import ResNetEncoder


@pytest.mark.slow
def test_resnet_encoder_shapes():
    enc = ResNetEncoder(depth=50, output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    low, high = enc.apply(variables, x, train=False)
    assert low.shape == (1, 16, 16, 256)    # C2 @ 1/4
    assert high.shape == (1, 4, 4, 2048)    # C5 @ 1/16


@pytest.mark.slow
def test_custom_deeplab_contract():
    model = CustomDeepLab(num_classes=2, backbone="resnet50",
                          num_domain=3)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, dc, feat = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 2)
    assert dc.shape == (1, 3)
    assert feat.shape == (1, 304)


def test_centroid_ema_update():
    c = init_centroids(jax.random.PRNGKey(0), 3, 8)
    feats = jnp.ones((6, 8)) * jnp.arange(6)[:, None]
    dids = jnp.asarray([0, 0, 1, 1, 2, 2])
    c2 = update_centroids(c, feats, dids, lam=0.9)
    # domain 0 mean = 0.5, EMA with lam 0.9
    np.testing.assert_allclose(np.asarray(c2[0]),
                               np.asarray(0.9 * c[0] + 0.1 * 0.5),
                               rtol=1e-6)
    # a domain with no samples keeps its centroid
    c3 = update_centroids(c, feats[:4], dids[:4], lam=0.9)
    np.testing.assert_allclose(np.asarray(c3[2]), np.asarray(c[2]))
