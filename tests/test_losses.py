"""Loss numerics vs torch references."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from arfe_tpu.models.losses import (CrossEntropyLoss, FocalLoss, GIoULoss,
                                    L1Loss, SmoothL1Loss, aiou_loss,
                                    multi_classes_loss)

rng = np.random.RandomState(0)


def test_softmax_ce_matches_torch():
    pred = rng.randn(20, 5).astype(np.float32)
    label = rng.randint(0, 5, 20)
    weight = rng.rand(20).astype(np.float32)
    ref = (F.cross_entropy(torch.tensor(pred), torch.tensor(label),
                           reduction='none') * torch.tensor(weight))
    ref = ref.sum().item() / 13.0
    loss = CrossEntropyLoss()(jnp.asarray(pred), jnp.asarray(label),
                              jnp.asarray(weight), avg_factor=13.0)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_bce_matches_torch():
    pred = rng.randn(30).astype(np.float32)
    label = rng.randint(0, 2, 30).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(pred), torch.tensor(label), reduction='mean').item()
    loss = CrossEntropyLoss(use_sigmoid=True)(
        jnp.asarray(pred), jnp.asarray(label))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_focal_loss_matches_reference_formula():
    # torch reference = the reference's python fallback
    # (ref: mmdet/models/losses/focal_loss.py:10-26)
    pred = torch.tensor(rng.randn(12, 4).astype(np.float32))
    target = torch.tensor(rng.randint(0, 5, 12))  # 4 == background
    onehot = F.one_hot(target, 5)[:, :4].float()
    pred_sigmoid = pred.sigmoid()
    pt = (1 - pred_sigmoid) * onehot + pred_sigmoid * (1 - onehot)
    fw = (0.25 * onehot + 0.75 * (1 - onehot)) * pt.pow(2.0)
    ref = (F.binary_cross_entropy_with_logits(
        pred, onehot, reduction='none') * fw).sum().item() / 7.0
    loss = FocalLoss(gamma=2.0, alpha=0.25)(
        jnp.asarray(pred.numpy()), jnp.asarray(target.numpy()),
        avg_factor=7.0)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-4)


def test_smooth_l1_and_l1_match_torch():
    pred = rng.randn(10, 4).astype(np.float32)
    tgt = rng.randn(10, 4).astype(np.float32)
    ref_sl1 = F.smooth_l1_loss(torch.tensor(pred), torch.tensor(tgt),
                               reduction='mean', beta=1.0).item()
    got = SmoothL1Loss(beta=1.0)(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), ref_sl1, rtol=1e-5)
    ref_l1 = F.l1_loss(torch.tensor(pred), torch.tensor(tgt),
                       reduction='mean').item()
    got = L1Loss()(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(got), ref_l1, rtol=1e-5)


def test_giou_loss_range():
    boxes = np.abs(rng.rand(8, 2)) * 50
    wh = rng.rand(8, 2) * 40 + 5
    pred = np.concatenate([boxes, boxes + wh], -1).astype(np.float32)
    tgt = pred.copy()
    # identical boxes -> zero loss
    loss = GIoULoss()(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_aiou_loss_identical_boxes():
    # identical boxes: |1 - iou| = 0, ratios = 1 -> cos(pi/2) = 0
    b = jnp.array([[0., 0., 10., 20.]])
    np.testing.assert_allclose(float(aiou_loss(b, b)[0]), 0.0, atol=1e-5)


def test_multi_classes_loss_behavior():
    # confident-correct presence predictions -> low loss
    c = 6
    presence = jnp.asarray(np.array([1, 0, 1, 0, 0, 0]), jnp.int32)
    good = np.zeros((c, 2), np.float32)
    good[:, 0] = 5.0
    good[[0, 2], 1] = 10.0
    good[[0, 2], 0] = 0.0
    bad = good[:, ::-1].copy()
    l_good = float(multi_classes_loss(jnp.asarray(good), presence))
    l_bad = float(multi_classes_loss(jnp.asarray(bad), presence))
    assert l_good < 0.1
    assert l_bad > 1.0


def test_ce_grad_finite():
    pred = jnp.asarray(rng.randn(6, 3).astype(np.float32))
    label = jnp.asarray(rng.randint(0, 3, 6))
    g = jax.grad(lambda p: CrossEntropyLoss()(p, label))(pred)
    assert np.isfinite(np.asarray(g)).all()
