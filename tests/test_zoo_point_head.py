"""PointRend head: point sampling vs torch grid_sample, train-time
importance sampling, subdivision refinement."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from aadg_tpu.models.zoo import (PointHead, calculate_uncertainty,
                                 get_points_test, get_points_train,
                                 point_rend_refine, point_sample,
                                 point_sample_labels)


def test_point_sample_labels_matches_grid_sample_nearest(rng):
    labels = rng.integers(0, 5, size=(2, 7, 9)).astype(np.int32)
    coords = rng.uniform(0.03, 0.97, size=(2, 17, 2)).astype(np.float32)
    ours = point_sample_labels(jnp.asarray(labels), jnp.asarray(coords))
    t_lab = torch.tensor(labels).float().unsqueeze(1)  # (B,1,H,W)
    grid = torch.tensor(coords).unsqueeze(2) * 2 - 1
    t = F.grid_sample(t_lab, grid, mode="nearest", align_corners=False,
                      padding_mode="border")
    t = t.squeeze(1).squeeze(-1).long()  # (B,P)
    np.testing.assert_array_equal(np.asarray(ours), t.numpy())


def test_point_sample_matches_grid_sample(rng):
    feat = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
    coords = rng.uniform(0.05, 0.95, size=(2, 13, 2)).astype(np.float32)
    ours = point_sample(jnp.asarray(feat), jnp.asarray(coords))
    t_feat = torch.tensor(feat).permute(0, 3, 1, 2)
    grid = torch.tensor(coords).unsqueeze(2) * 2 - 1  # (B,P,1,2) in [-1,1]
    # mmcv point_sample uses grid_sample's DEFAULT zero padding
    # (`mmcv/ops/point_sample.py`), not border
    t = F.grid_sample(t_feat, grid, align_corners=False)
    t = t.squeeze(-1).permute(0, 2, 1)  # (B,P,C)
    np.testing.assert_allclose(np.asarray(ours), t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_uncertainty_margin():
    logits = jnp.asarray([[[[2.0, 1.0, 0.0], [5.0, 4.9, 0.0]]]])
    u = calculate_uncertainty(logits)
    np.testing.assert_allclose(np.asarray(u[0, 0]), [-1.0, -0.1], rtol=1e-5)


def test_get_points_train_shapes_and_uncertain_bias(rng):
    # a logit map with one highly-ambiguous stripe: importance sampling
    # should place many points there
    logits = np.full((1, 8, 8, 2), 0.0, np.float32)
    logits[..., 0] = 5.0
    logits[0, :, 3, 0] = 0.01  # ambiguous column x=3
    pts = get_points_train(jnp.asarray(logits), 64, oversample_ratio=4,
                           importance_sample_ratio=0.75,
                           rng=jax.random.PRNGKey(0))
    assert pts.shape == (1, 64, 2)
    xs = np.asarray(pts[0, :48, 0])  # the importance-sampled slice
    # bilinear sampling bleeds uncertainty into neighbour columns, so use
    # a loose bound: uniform would put ~0.125 in the stripe
    frac_in_stripe = np.mean((xs > 3 / 8) & (xs < 4 / 8))
    assert frac_in_stripe > 0.3


def test_point_rend_refine_changes_uncertain_pixels(rng):
    feats = [jnp.asarray(rng.normal(size=(1, 8, 8, 6)).astype(np.float32))]
    coarse = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    head = PointHead(num_classes=3, channels=16, num_fcs=2)
    coords0 = jnp.zeros((1, 4, 2)) + 0.5
    v = head.init(jax.random.PRNGKey(0), feats, coarse, coords0,
                  train=False)

    def head_apply(fs, logits, coords):
        return head.apply(v, fs, logits, coords, train=False)

    out = point_rend_refine(head_apply, feats, coarse,
                            subdivision_steps=2,
                            subdivision_num_points=32)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    up = jax.image.resize(coarse, (1, 32, 32, 3), "bilinear")
    up = jax.image.resize(
        jax.image.resize(coarse, (1, 16, 16, 3), "bilinear"),
        (1, 32, 32, 3), "bilinear")
    # refined map differs from plain upsampling at some points
    assert np.abs(np.asarray(out) - np.asarray(up)).max() > 1e-4


def test_point_head_forward_torch_parity(rng):
    """Full PointHead forward vs a torch oracle of the reference module
    (`point_head.py:80-121`): grid_sample'd fine+coarse point feats ->
    num_fcs Conv1d+ReLU with coarse re-concat -> fc_seg."""
    import jax.numpy as jnp
    from torch import nn as tnn

    c_fine, n_cls, channels, n_fcs, P = 6, 4, 8, 3, 10
    feat = rng.normal(0, 1, (2, 9, 11, c_fine)).astype(np.float32)
    coarse = rng.normal(0, 1, (2, 5, 7, n_cls)).astype(np.float32)
    coords = rng.uniform(0.02, 0.98, (2, P, 2)).astype(np.float32)

    class TPoint(tnn.Module):
        def __init__(self):
            super().__init__()
            fcs, fin = [], c_fine + n_cls
            for _ in range(n_fcs):
                fcs.append(tnn.Conv1d(fin, channels, 1))
                fin = channels + n_cls
            self.fcs = tnn.ModuleList(fcs)
            self.fc_seg = tnn.Conv1d(fin, n_cls, 1)

        def forward(self, fine_pts, coarse_pts):
            x = torch.cat([fine_pts, coarse_pts], dim=1)
            for fc in self.fcs:
                x = F.relu(fc(x))
                x = torch.cat((x, coarse_pts), dim=1)
            return self.fc_seg(x)

    torch.manual_seed(3)
    t = TPoint()
    for m in t.modules():
        if isinstance(m, tnn.Conv1d):
            m.weight.data.normal_(0, 0.3)
            m.bias.data.normal_(0, 0.1)
    t.eval()
    grid = torch.tensor(coords).unsqueeze(2) * 2 - 1
    fine_pts = F.grid_sample(torch.tensor(feat).permute(0, 3, 1, 2),
                             grid, align_corners=False).squeeze(-1)
    coarse_pts = F.grid_sample(torch.tensor(coarse).permute(0, 3, 1, 2),
                               grid, align_corners=False).squeeze(-1)
    with torch.no_grad():
        want = t(fine_pts, coarse_pts).permute(0, 2, 1).numpy()  # (B,P,C)

    head = PointHead(num_classes=n_cls, channels=channels,
                        num_fcs=n_fcs, in_index=(0,))
    params = {}
    for i, fc in enumerate(t.fcs):
        params[f"fc{i}"] = {
            "kernel": fc.weight.detach().numpy()[:, :, 0].T,
            "bias": fc.bias.detach().numpy()}
    params["fc_seg"] = {
        "kernel": t.fc_seg.weight.detach().numpy()[:, :, 0].T,
        "bias": t.fc_seg.bias.detach().numpy()}
    out = head.apply({"params": params}, [jnp.asarray(feat)],
                     jnp.asarray(coarse), jnp.asarray(coords),
                     train=False)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
