"""Standalone RPN detector family: plain RPN and GA-RPN configs must
build, run simple_test, and train (ref: mmdet/models/detectors/rpn.py;
the GA head returns 4 per-level output tuples, exercising the generic
rpn-head dispatch in the detectors)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu import Config
from arfe_tpu.models import build_detector


@pytest.mark.parametrize('config', [
    'configs/rpn/rpn_r50_fpn_1x_coco.py',
    'configs/guided_anchoring/ga_rpn_r50_fpn_1x_coco.py',
])
def test_rpn_detector_test_and_train(config):
    cfg = Config.fromfile(config)
    model = build_detector(cfg.model, train_cfg=cfg.get('train_cfg'),
                           test_cfg=cfg.get('test_cfg'))
    params = model.init(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.RandomState(0).randn(1, 128, 192, 3).astype(np.float32))
    shapes = jnp.asarray([[128.0, 190.0]])
    sfs = jnp.ones((1, 4), jnp.float32)
    props, valid = model.simple_test(params, img, shapes, sfs, rescale=True)
    assert props.shape == (1, 1000, 5)
    assert valid.shape == (1, 1000)
    gt = jnp.asarray([[[10., 10., 60., 80.], [40., 30., 100., 110.]]])
    gv = jnp.asarray([[True, True]])
    gl = jnp.zeros((1, 2), jnp.int32)
    losses = model.forward_train(params, img, shapes, gt, gv, gl,
                                 jax.random.PRNGKey(1))
    assert 'loss_rpn_cls' in losses and 'loss_rpn_bbox' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
