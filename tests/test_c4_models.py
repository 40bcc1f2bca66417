"""C4 (no-neck, shared ResLayer head) detector family from the zoo
configs (ref: configs/_base_/models/faster_rcnn_r50_caffe_c4.py,
mask_rcnn_r50_caffe_c4.py): single-level features at stride 16, RoIAlign
14x14, shared layer4 + avg-pool BBoxHead; the mask variant reuses the
bbox path's shared features (mask_roi_extractor=None)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arfe_tpu import Config
from arfe_tpu.models.builder import build_detector

ROOT = os.path.join(os.path.dirname(__file__), '..', 'configs')


def _tiny(cfgp, mask):
    cfg = Config.fromfile(os.path.join(ROOT, cfgp))
    cfg.model['backbone']['base_channels'] = 8
    cfg.model['rpn_head']['in_channels'] = 128
    cfg.model['rpn_head']['feat_channels'] = 128
    cfg.model['roi_head']['bbox_roi_extractor']['out_channels'] = 128
    cfg.model['roi_head']['shared_head']['base_channels'] = 8
    cfg.model['roi_head']['bbox_head']['in_channels'] = 256
    if mask:
        cfg.model['roi_head']['mask_head']['in_channels'] = 256
    cfg.test_cfg['rpn'].update(nms_pre=100, nms_post=50, max_num=50)
    cfg.test_cfg['rcnn']['max_per_img'] = 10
    return build_detector(cfg.model, train_cfg=cfg.train_cfg,
                          test_cfg=cfg.test_cfg)


@pytest.mark.parametrize('cfgp,mask', [
    ('faster_rcnn/faster_rcnn_r50_caffe_c4_1x_coco.py', False),
    ('mask_rcnn/mask_rcnn_r50_caffe_c4_1x_coco.py', True),
])
def test_c4_simple_test(cfgp, mask):
    det = _tiny(cfgp, mask)
    p = det.init(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 3),
                      jnp.float32)
    out = det.simple_test(p, img, jnp.array([[64, 96]]), jnp.ones((1, 4)))
    bboxes = out[0]
    assert bboxes.shape == (1, 10, 5)
    assert np.isfinite(np.asarray(bboxes)).all()


def test_c4_shared_head_param_names():
    det = _tiny('faster_rcnn/faster_rcnn_r50_caffe_c4_1x_coco.py', False)
    p = det.init(jax.random.PRNGKey(0))
    # shared ResLayer params mirror torch's 'shared_head.layer4.*'
    assert 'layer4' in p['roi_head']['shared_head']
    assert '0' in p['roi_head']['shared_head']['layer4']


def test_fcn_mask_head_num_convs0_channels():
    """C4 schema: num_convs=0 feeds the 2048-ch shared-head features
    straight to the deconv (ref fcn_mask_head.py upsample_in_channels);
    caught by a zoo forward-audit — the deconv was built at
    conv_out_channels regardless of num_convs."""
    from arfe_tpu.models.roi_heads.mask_heads import FCNMaskHead
    head = FCNMaskHead(num_convs=0, in_channels=2048,
                       conv_out_channels=256, num_classes=5)
    p = head.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(3, 14, 14, 2048),
                    jnp.float32)
    out = head(p, x)
    assert out.shape == (3, 28, 28, 5)
    assert np.isfinite(np.asarray(out)).all()
