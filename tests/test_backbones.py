import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.models.xception import AlignedXception
from aadg_tpu.models.drn import DRN_D_54
from aadg_tpu.models.deeplab_custom import CustomDeepLab
from aadg_tpu.ops.augment import sample_pairing
import numpy as np


@pytest.mark.slow
def test_xception_shapes():
    enc = AlignedXception(output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    low, high = enc.apply(variables, x, train=False)
    assert low.shape == (1, 16, 16, 128)
    assert high.shape == (1, 4, 4, 2048)


@pytest.mark.slow
def test_drn_shapes():
    enc = DRN_D_54()
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    low, high = enc.apply(variables, x, train=False)
    assert low.shape == (1, 16, 16, 256)
    assert high.shape == (1, 8, 8, 512)  # output stride 8


@pytest.mark.slow
@pytest.mark.parametrize("backbone", ["xception", "drn"])
def test_custom_deeplab_with_backbones(backbone):
    model = CustomDeepLab(num_classes=2, backbone=backbone, num_domain=3)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, dc, feat = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 64, 2)
    assert dc.shape == (1, 3)
    assert feat.shape == (1, 304)


def test_sample_pairing_blend(rng):
    img = jnp.asarray(rng.integers(0, 256, (8, 8, 3)), jnp.float32)
    img2 = jnp.asarray(rng.integers(0, 256, (8, 8, 3)), jnp.float32)
    mask = jnp.zeros((8, 8))
    out, m = sample_pairing(img, mask, img2, 0.25)
    expected = np.floor(np.asarray(img) * 0.75 + np.asarray(img2) * 0.25)
    # f32 vs f64 truncation boundaries: allow off-by-one
    assert np.abs(np.asarray(out) - expected).max() <= 1.0
    np.testing.assert_array_equal(np.asarray(m), 0)
