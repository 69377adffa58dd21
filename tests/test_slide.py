import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aadg_tpu.engine.slide import slide_inference, _grid_starts


def test_grid_starts_cover_and_flush():
    starts = _grid_starts(100, 40, 30)
    assert starts[0] == 0 and starts[-1] == 60  # flush with the edge
    # full coverage
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s:s + 40] = True
    assert covered.all()


def test_identity_model_average_is_input():
    # a model that returns its input's first channel as logits: overlap
    # averaging must reproduce the input exactly
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 50, 70, 3)), jnp.float32)

    def fwd(windows):
        return windows[..., :1]

    out = slide_inference(fwd, imgs, (32, 32), (20, 20), 1)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(imgs[..., :1]), atol=1e-6)


def test_window_counting():
    imgs = jnp.ones((1, 64, 64, 1))
    calls = []

    def fwd(windows):
        calls.append(windows.shape)
        return jnp.ones(windows.shape[:3] + (2,))

    out = slide_inference(fwd, imgs, (32, 32), (32, 32), 2)
    assert calls[0] == (4, 32, 32, 1)  # 2x2 non-overlapping windows
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_small_image_single_window():
    imgs = jnp.ones((1, 16, 16, 1))

    def fwd(windows):
        assert windows.shape[0] == 1
        return jnp.zeros(windows.shape[:3] + (1,))

    out = slide_inference(fwd, imgs, (16, 16), (8, 8), 1)
    assert out.shape == (1, 16, 16, 1)


def test_crop_larger_than_image_decodes_small_patch():
    """Reference edge case (`encoder_decoder.py:171-178`): when the crop
    exceeds the image, the window IS the (smaller) image — no padding."""
    imgs = jnp.ones((1, 20, 48, 1))
    shapes = []

    def fwd(windows):
        shapes.append(windows.shape)
        return windows[..., :1] * 2.0

    out = slide_inference(fwd, imgs, (32, 32), (24, 24), 1)
    assert out.shape == (1, 20, 48, 1)
    # crop clamps to 20 on H; W keeps 32 with a flush second window
    assert all(s[1] == 20 and s[2] == 32 for s in shapes)
    np.testing.assert_allclose(np.asarray(out), 2.0)
