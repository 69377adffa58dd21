import numpy as np
import jax.numpy as jnp
import pytest

from aadg_tpu import metrics as M


class TestSamplewiseF1:
    def test_perfect(self):
        p = jnp.array([[[1, 0], [0, 1]]], dtype=jnp.float32)
        out = M.samplewise_f1(p, p)
        np.testing.assert_allclose(out, [1.0, 1.0], atol=1e-6)

    def test_matches_manual_per_sample_average(self, rng):
        pred = rng.integers(0, 2, size=(4, 16, 16))
        targ = rng.integers(0, 2, size=(4, 16, 16))
        out = np.asarray(M.samplewise_f1(jnp.asarray(pred), jnp.asarray(targ)))
        # manual per-sample F1 for class 1, then mean over samples
        f1s = []
        for i in range(4):
            tp = np.sum((pred[i] == 1) & (targ[i] == 1))
            fp = np.sum((pred[i] == 1) & (targ[i] == 0))
            fn = np.sum((pred[i] == 0) & (targ[i] == 1))
            f1s.append(2 * tp / (2 * tp + fp + fn))
        np.testing.assert_allclose(out[1], np.mean(f1s), rtol=1e-5)

    def test_empty_sample_scores_zero(self):
        # all-zero pred AND target for class 1 -> denominator 0 -> f1 = 0
        pred = jnp.zeros((1, 8, 8))
        targ = jnp.zeros((1, 8, 8))
        out = M.samplewise_f1(pred, targ)
        assert out[1] == 0.0
        assert out[0] == 1.0

    def test_sample_weighting(self):
        pred = jnp.stack([jnp.ones((4, 4)), jnp.zeros((4, 4))])
        targ = jnp.stack([jnp.ones((4, 4)), jnp.ones((4, 4))])
        w = jnp.array([1.0, 0.0])
        out = M.samplewise_f1(pred, targ, weight=w)
        assert out[1] == 1.0  # padded sample ignored


class TestBinaryMetrics:
    def test_auroc_matches_sklearn(self, rng):
        from sklearn.metrics import roc_auc_score
        scores = rng.random(500)
        labels = rng.integers(0, 2, 500)
        assert M.auroc(scores, labels) == pytest.approx(
            roc_auc_score(labels, scores), abs=1e-9)

    def test_auroc_with_ties_matches_sklearn(self, rng):
        from sklearn.metrics import roc_auc_score
        scores = rng.integers(0, 5, 300) / 4.0  # heavy ties
        labels = rng.integers(0, 2, 300)
        assert M.auroc(scores, labels) == pytest.approx(
            roc_auc_score(labels, scores), abs=1e-9)

    def test_masked_accuracy_specificity_sensitivity(self):
        scores = np.array([0.9, 0.1, 0.8, 0.2, 0.7])
        labels = np.array([1, 0, 0, 1, 1])
        mask = np.array([1, 1, 1, 1, 0])
        assert M.accuracy_score(scores, labels, mask) == pytest.approx(0.5)
        # on masked set: preds [1,0,1,0]; labels [1,0,0,1]
        assert M.specificity(scores, labels, mask) == pytest.approx(0.5)
        assert M.sensitivity(scores, labels, mask) == pytest.approx(0.5)


class TestHD95:
    def test_identical_masks_zero(self):
        m = np.zeros((32, 32), bool)
        m[8:20, 8:20] = True
        assert M.hd95(m, m) == 0.0

    def test_translation_distance(self):
        a = np.zeros((64, 64), bool)
        b = np.zeros((64, 64), bool)
        a[10:20, 10:20] = True
        b[13:23, 10:20] = True  # shifted 3 rows
        d = M.hd95(a, b)
        assert 0 < d <= 3.0 + 1e-9

    def test_empty_prediction_penalty(self):
        gt = np.zeros((16, 16), bool)
        gt[4:8, 4:8] = True
        assert M.hd95_with_penalty(np.zeros((16, 16), bool), gt) == 100.0

    def test_matches_bruteforce_percentile(self, rng):
        # brute-force surface distance cross-check on a small random blob
        from scipy import ndimage
        a = ndimage.binary_dilation(rng.random((24, 24)) > 0.92, iterations=2)
        b = ndimage.binary_dilation(rng.random((24, 24)) > 0.92, iterations=2)
        if a.sum() == 0 or b.sum() == 0:
            pytest.skip("degenerate random draw")

        def surface(m):
            er = ndimage.binary_erosion(
                m, structure=ndimage.generate_binary_structure(2, 1))
            return np.argwhere(m ^ er)

        sa, sb = surface(a), surface(b)
        d_ab = np.array([np.min(np.linalg.norm(sb - p, axis=1)) for p in sa])
        d_ba = np.array([np.min(np.linalg.norm(sa - p, axis=1)) for p in sb])
        expected = np.percentile(np.hstack([d_ab, d_ba]), 95)
        assert M.hd95(a, b) == pytest.approx(expected, abs=1e-9)
