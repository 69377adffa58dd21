"""Fused LUT switcher == generic lax.switch, bit-exact, for every
search-space op and magnitude (and for EXCLUDE_OPS subsets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadg_tpu.ops import augment as aug


def _rand_img(key, h=40, w=36):
    ki, km = jax.random.split(key)
    img = jax.random.randint(ki, (h, w, 3), 0, 256).astype(jnp.float32)
    mask = (jax.random.uniform(km, (h, w)) > 0.5).astype(jnp.float32) * 255
    return img, mask


def test_fused_matches_generic_all_ops():
    names = aug.augment_list()
    fused = aug.make_fused_op_switcher(names)
    generic = aug.make_op_switcher(names)
    assert fused is not None
    key = jax.random.PRNGKey(0)
    for op_idx in range(len(names)):
        for level in (0.0, 0.33, 0.77, 1.0):
            key, k_img, k_op = jax.random.split(key, 3)
            img, mask = _rand_img(k_img)
            fi, fm = fused(jnp.int32(op_idx), jnp.float32(level),
                           img, mask, k_op)
            gi, gm = generic(jnp.int32(op_idx), jnp.float32(level),
                             img, mask, k_op)
            np.testing.assert_array_equal(
                np.asarray(fi), np.asarray(gi),
                err_msg=f"op {names[op_idx]} level {level} image")
            np.testing.assert_array_equal(
                np.asarray(fm), np.asarray(gm),
                err_msg=f"op {names[op_idx]} level {level} mask")


@pytest.mark.parametrize("exclude", [
    ("Equalize", "AutoContrast"),            # no histogram needed
    ("Color", "Sharpness", "Cutout"),        # LUT-only space
    ("Invert", "Solarize", "Posterize", "Contrast", "Brightness",
     "Equalize", "AutoContrast"),            # specials-only space
])
def test_fused_matches_generic_subsets(exclude):
    names = aug.search_space_ops(exclude_ops=exclude)
    fused = aug.make_fused_op_switcher(names)
    generic = aug.make_op_switcher(names)
    assert fused is not None
    key = jax.random.PRNGKey(1)
    for op_idx in range(len(names)):
        key, k_img, k_op = jax.random.split(key, 3)
        img, mask = _rand_img(k_img)
        fi, fm = fused(jnp.int32(op_idx), jnp.float32(0.6), img, mask, k_op)
        gi, gm = generic(jnp.int32(op_idx), jnp.float32(0.6), img, mask,
                         k_op)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(gi),
                                      err_msg=f"op {names[op_idx]}")
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(gm))


def test_fused_rejects_geometric_spaces():
    assert aug.make_fused_op_switcher(
        aug.augment_list(for_autoaug=True)) is None


@pytest.mark.slow  # vmapped 10-op switcher compile: 17 s warm; the
# unvmapped all-op equivalence stays quick (r5 tiering)
def test_fused_under_vmap_matches_generic():
    names = aug.augment_list()
    fused = aug.make_fused_op_switcher(names)
    generic = aug.make_op_switcher(names)
    n = 12
    key = jax.random.PRNGKey(2)
    k_img, k_ops, k_lvl, k_keys = jax.random.split(key, 4)
    imgs = jax.random.randint(k_img, (n, 24, 24, 3), 0, 256).astype(
        jnp.float32)
    masks = jnp.zeros((n, 24, 24), jnp.float32)
    op_idx = jax.random.randint(k_ops, (n,), 0, len(names))
    levels = jax.random.uniform(k_lvl, (n,))
    keys = jax.random.split(k_keys, n)
    fi, fm = jax.vmap(fused)(op_idx, levels, imgs, masks, keys)
    gi, gm = jax.vmap(generic)(op_idx, levels, imgs, masks, keys)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(gi))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(gm))
