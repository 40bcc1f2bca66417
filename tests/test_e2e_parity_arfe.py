"""ARFE-novel-path torch-mirror parity (the VERDICT round-3 priority #2).

Covers the modules that make this fork ARFE, each against an INDEPENDENT
torch mirror with shared converted weights:

- AR-FPN ``WFPNDualSpatial`` (ref: mmdet/models/necks/wfpn_dual_spatial.py:
  99-137 — adaptive-max-pool/nearest gather, NonLocal2D refine, per-level
  dual tanh attention maps, residual add),
- AR-RFF triple-RoI extraction + ``MultiRoIsBBoxHead`` fusion (ref:
  roi_heads/bbox_heads/multirois_bbox_head.py:165-235 and the extraction
  recipe in standard_roi_head.py:137-157: ori + adaptive w/h-stretched
  rois from utils/additional.py:38-71, concat [ori, lw, lh]),
- ``MultiClassesBBoxHead`` image-level class-presence aux head (ref:
  bbox_heads/multi_classes_bbox_head.py:169-226) and its
  ``multi_classes_loss`` (ref: losses/cross_entropy_loss.py:66-97),
- flagship train losses (cls/bbox) below the sampling layer (sampling is
  RNG-identical by construction here: rois are fixed).

The mirror reimplements everything from the algorithm spec in torch/numpy
(no mmdet/mmcv imports) — same oracle strategy as
test_e2e_parity_vs_torch.py, whose backbone/FPN/RPN mirrors are reused.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from arfe_tpu.convert import params_to_jax, state_dict_to_params
from test_e2e_parity_vs_torch import (MAX_PER_IMG, NUM_CLASSES,
                                      RCNN_NMS_THR, RCNN_SCORE_THR,
                                      RPN_NMS_POST, RPN_NMS_PRE, RPN_NMS_THR,
                                      STRIDES, TBackbone, TConvHolder, TFPN,
                                      TRPNHead, np_anchors, np_delta2bbox,
                                      np_nms, t_roi_align)

torch.manual_seed(3)

FC = 128
C = 64


# ---------------------------------------------------------------------------
# torch mirrors of the ARFE modules
# ---------------------------------------------------------------------------


class TNonLocal(tnn.Module):
    """NonLocal2D, reduction=1, use_scale=False, embedded_gaussian
    (ref: mmdet/ops/non_local.py:6-105)."""

    def __init__(self, c):
        super().__init__()
        self.g = TConvHolder(tnn.Conv2d(c, c, 1))
        self.theta = TConvHolder(tnn.Conv2d(c, c, 1))
        self.phi = TConvHolder(tnn.Conv2d(c, c, 1))
        self.conv_out = TConvHolder(tnn.Conv2d(c, c, 1))

    def forward(self, x):
        n, c, h, w = x.shape
        g_x = self.g.conv(x).view(n, c, -1).permute(0, 2, 1)
        theta_x = self.theta.conv(x).view(n, c, -1).permute(0, 2, 1)
        phi_x = self.phi.conv(x).view(n, c, -1)
        pw = torch.matmul(theta_x, phi_x).softmax(dim=-1)
        y = torch.matmul(pw, g_x).permute(0, 2, 1).reshape(n, c, h, w)
        return x + self.conv_out.conv(y)


class TWFPNDual(tnn.Module):
    """ref: wfpn_dual_spatial.py:99-137 (ConvModule = conv+ReLU, then
    torch.tanh)."""

    def __init__(self, c=C, num_levels=5, refine_level=2):
        super().__init__()
        self.refine_level = refine_level
        self.reduce_convs = tnn.ModuleList(
            [TConvHolder(tnn.Conv2d(c, 1, 3, padding=1))
             for _ in range(num_levels)])
        self.reduce_convs2 = tnn.ModuleList(
            [TConvHolder(tnn.Conv2d(c, 1, 3, padding=1))
             for _ in range(num_levels)])
        self.refine = TNonLocal(c)

    def forward(self, inputs):
        gather_size = inputs[self.refine_level].shape[2:]
        feats = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                feats.append(F.adaptive_max_pool2d(x, gather_size))
            else:
                feats.append(F.interpolate(x, size=gather_size,
                                           mode='nearest'))
        bsf = self.refine(sum(feats) / len(feats))
        outs = []
        for i, x in enumerate(inputs):
            basic = torch.tanh(F.relu(self.reduce_convs[i].conv(x)))
            com = torch.tanh(F.relu(self.reduce_convs2[i].conv(x)))
            att = F.interpolate(bsf, size=list(x.shape[2:])) * (basic + com)
            outs.append(x + att)
        return outs


class TMultiRoIsHead(tnn.Module):
    """ref: multirois_bbox_head.py:165-235 (fusion: ori + ori*(conv(lwh)+
    conv(lhh)) -> 3x3 conv -> 2 shared FCs)."""

    def __init__(self, c=C, fc=FC, num_classes=NUM_CLASSES):
        super().__init__()
        self.c = c
        self.wh_conv = TConvHolder(tnn.Conv2d(c, c, 3, padding=1))
        self.hh_conv = TConvHolder(tnn.Conv2d(c, c, 3, padding=1))
        self.final_conv = TConvHolder(tnn.Conv2d(c, c, 3, padding=1))
        self.shared_fcs = tnn.ModuleList([tnn.Linear(c * 49, fc),
                                          tnn.Linear(fc, fc)])
        self.fc_cls = tnn.Linear(fc, num_classes + 1)
        self.fc_reg = tnn.Linear(fc, num_classes * 4)

    def forward(self, x):
        c = self.c
        ori = x[:, :c]
        lwh = x[:, c:2 * c]
        lhh = x[:, 2 * c:]
        lwh = F.relu(self.wh_conv.conv(lwh))
        lhh = F.relu(self.hh_conv.conv(lhh))
        out = ori + ori * (lwh + lhh)
        out = F.relu(self.final_conv.conv(out))
        out = out.flatten(1)
        for m in self.shared_fcs:
            out = F.relu(m(out))
        return self.fc_cls(out), self.fc_reg(out)


class TARFEFasterRCNN(tnn.Module):
    """Faster R-CNN + [FPN, WFPNDualSpatial] + AR-RFF head. Module names
    mirror the arfe_tpu param tree for the converter."""

    def __init__(self):
        super().__init__()
        self.backbone = TBackbone()

        class Neck(tnn.Module):
            def __init__(self):
                super().__init__()
                setattr(self, '0', TFPN([64, 128, 256, 512], C))
                setattr(self, '1', TWFPNDual())

            def forward(self, feats):
                return getattr(self, '1')(getattr(self, '0')(feats))

        self.neck = Neck()
        self.rpn_head = TRPNHead(C, 3)

        class RoIHead(tnn.Module):
            def __init__(self):
                super().__init__()
                self.bbox_head = TMultiRoIsHead()

        self.roi_head = RoIHead()


# ---------------------------------------------------------------------------
# numpy mirrors of the AR-RFF roi machinery
# ---------------------------------------------------------------------------


def np_adaptive_rois(boxes, fac=1.0):
    """(N, 4) -> (adaptive_h, adaptive_w), ref additional.py:38-71 (+1.0
    w/h, 0.1 top-left floor; the final state stretches BOTH axes of the
    w-roi)."""
    x1, y1, x2, y2 = boxes.T
    cx, cy = (x1 + x2) * .5, (y1 + y2) * .5
    rw, rh = x2 - x1 + 1.0, y2 - y1 + 1.0
    h_rate = (rw / rh) * fac + 1.0
    w_rate = (rh / rw) * fac + 1.0
    lh = rh * h_rate
    lw = rw * w_rate
    ah = np.stack([np.maximum(cx - rw * .5, 0.1),
                   np.maximum(cy - lh * .5, 0.1),
                   cx + rw * .5, cy + lh * .5], -1)
    aw = np.stack([np.maximum(cx - lw * .5, 0.1),
                   np.maximum(cy - lh * .5, 0.1),
                   cx + lw * .5, cy + lh * .5], -1)
    return ah, aw


def t_extract(feats, boxes):
    """FPN-level-mapped RoIAlign over a (N, 4) box set."""
    scale = np.sqrt((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    tl = np.clip(np.floor(np.log2(scale / 56 + 1e-6)), 0, 3).astype(int)
    roi_feats = torch.zeros((len(boxes), C, 7, 7))
    for lvl in range(4):
        sel = np.where(tl == lvl)[0]
        if len(sel):
            roi_feats[sel] = t_roi_align(feats[lvl], boxes[sel],
                                         STRIDES[lvl])
    return roi_feats


def t_extract_multi(feats, boxes):
    """AR-RFF triple extraction, concat [ori, lw, lh] channel-wise
    (ref: standard_roi_head.py:137-157)."""
    ah, aw = np_adaptive_rois(boxes)
    return torch.cat([t_extract(feats, boxes), t_extract(feats, aw),
                      t_extract(feats, ah)], dim=1)


def torch_arfe_inference(model, img, img_shape):
    feats = model.neck(model.backbone(img))
    rpn_outs = model.rpn_head(feats)
    all_props, all_scores, all_lvls = [], [], []
    for lvl, (cls, reg) in enumerate(rpn_outs):
        h, w = cls.shape[2:]
        anchors = np_anchors(h, w, STRIDES[lvl])
        scores = torch.sigmoid(cls).permute(0, 2, 3, 1).reshape(-1).numpy()
        deltas = reg.permute(0, 2, 3, 1).reshape(-1, 4).numpy()
        if len(scores) > RPN_NMS_PRE:
            top = np.argsort(-scores, kind='stable')[:RPN_NMS_PRE]
            scores, deltas, anchors = scores[top], deltas[top], anchors[top]
        boxes = np_delta2bbox(anchors, deltas, [1, 1, 1, 1], img_shape)
        all_props.append(boxes)
        all_scores.append(scores)
        all_lvls.append(np.full(len(scores), lvl))
    boxes = np.concatenate(all_props)
    scores = np.concatenate(all_scores)
    lvls = np.concatenate(all_lvls)
    off = lvls * (boxes.max() + 1)
    keep = np_nms(boxes + off[:, None], scores, RPN_NMS_THR)[:RPN_NMS_POST]
    props = boxes[keep]

    roi_feats = t_extract_multi(feats, props)
    cls_logits, reg = model.roi_head.bbox_head(roi_feats)
    probs = torch.softmax(cls_logits, -1).numpy()
    reg = reg.numpy()

    dets = []
    for c in range(NUM_CLASSES):
        boxes_c = np_delta2bbox(props, reg[:, c * 4:(c + 1) * 4],
                                [0.1, 0.1, 0.2, 0.2], img_shape)
        sc = probs[:, c]
        m = sc > RCNN_SCORE_THR
        if not m.any():
            continue
        keep = np_nms(boxes_c[m], sc[m], RCNN_NMS_THR)
        for k in keep:
            dets.append((sc[m][k], c, boxes_c[m][k]))
    dets.sort(key=lambda d: -d[0])
    return dets[:MAX_PER_IMG], props


# ---------------------------------------------------------------------------


def build_flagship():
    from arfe_tpu.models.builder import build_detector
    cfg = dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3)),
        neck=[dict(type='FPN', in_channels=[64, 128, 256, 512],
                   out_channels=C, num_outs=5),
              dict(type='WFPNDualSpatial', in_channels=C, num_levels=5)],
        rpn_head=dict(
            type='RPNHead', in_channels=C, feat_channels=C,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder'),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
                out_channels=C, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='MultiRoIsBBoxHead', in_channels=C,
                fc_out_channels=FC, roi_feat_size=7,
                num_classes=NUM_CLASSES,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0))))
    test_cfg = dict(
        rpn=dict(nms_pre=RPN_NMS_PRE, nms_post=RPN_NMS_POST,
                 max_num=RPN_NMS_POST, nms_thr=RPN_NMS_THR,
                 min_bbox_size=0),
        rcnn=dict(score_thr=RCNN_SCORE_THR,
                  nms=dict(type='nms', iou_thr=RCNN_NMS_THR),
                  max_per_img=MAX_PER_IMG))
    train_cfg = dict(
        rcnn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.5,
                          match_low_quality=False),
            sampler=dict(type='RandomSampler', num=16, pos_fraction=0.25,
                         add_gt_as_proposals=True),
            pos_weight=-1),
        rpn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3,
                          match_low_quality=True),
            sampler=dict(type='RandomSampler', num=32, pos_fraction=0.5,
                         add_gt_as_proposals=False),
            allowed_border=-1, pos_weight=-1),
        rpn_proposal=dict(nms_pre=RPN_NMS_PRE, nms_post=RPN_NMS_POST,
                          max_num=RPN_NMS_POST, nms_thr=RPN_NMS_THR,
                          min_bbox_size=0))
    return build_detector(cfg, train_cfg=train_cfg, test_cfg=test_cfg)


def _shared_model():
    torch.manual_seed(21)
    tm = TARFEFasterRCNN()
    with torch.no_grad():
        tm.roi_head.bbox_head.fc_cls.weight.mul_(8.0)
        tm.rpn_head.rpn_cls.weight.mul_(8.0)
        # keep the zero-centered NonLocal residual non-trivial but bounded
        tm.neck._modules['1'].refine.conv_out.conv.weight.mul_(0.5)
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.1)
                m.bias.normal_(0, 0.1)
    tm.eval()
    return tm


def test_arfe_flagship_e2e_matches_torch_mirror():
    tm = _shared_model()
    h, w = 224, 320
    img = torch.randn(1, 3, h, w)
    with torch.no_grad():
        t_dets, _ = torch_arfe_inference(tm, img, (h, w))
    assert len(t_dets) >= 2

    model = build_flagship()
    assert model.roi_head.multi_rois, 'AR-RFF extraction not auto-enabled'
    params = params_to_jax(state_dict_to_params(tm.state_dict()))
    dets, labels, valid = model.simple_test(
        params, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray([[h, w]], jnp.float32), jnp.ones((1, 4)))
    dets = np.asarray(dets[0])
    labels = np.asarray(labels[0])
    valid = np.asarray(valid[0])
    j_dets = [(dets[i, 4], int(labels[i]), dets[i, :4])
              for i in range(len(dets)) if valid[i]]
    assert len(j_dets) > 0

    def iou(a, b):
        x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
        x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-10)

    used = set()
    unmatched = []
    for sc, lab, box in t_dets:
        if sc < 0.2:
            continue
        if not any(j not in used and jlab == lab and iou(box, jbox) > 0.7
                   and abs(jsc - sc) < 1e-2 and not used.add(j)
                   for j, (jsc, jlab, jbox) in enumerate(j_dets)):
            unmatched.append((round(float(sc), 3), lab))
    assert not unmatched, f'unmatched torch dets: {unmatched[:5]}'


def test_arfe_flagship_train_losses_match_torch_mirror():
    """Loss-value parity below the sampling layer: fixed sampled rois,
    mmdet-v2.0 target/loss semantics mirrored in numpy/torch."""
    tm = _shared_model()
    h, w = 224, 320
    img = torch.randn(1, 3, h, w)
    gt = np.array([[30., 40., 120., 160.], [150., 60., 290., 200.]],
                  np.float32)
    gt_labels = np.array([1, 3], np.int64)

    # fixed "sampled" rois: 2 pos (near the gts), 6 neg
    rois_np = np.array([
        [28., 38., 118., 158.], [152., 64., 286., 204.],
        [5., 5., 60., 60.], [200., 10., 300., 90.],
        [10., 150., 100., 220.], [180., 150., 310., 219.],
        [60., 20., 200., 120.], [100., 100., 260., 210.]], np.float32)
    S = len(rois_np)
    is_pos_np = np.array([1, 1, 0, 0, 0, 0, 0, 0], bool)
    matched_gt = np.array([0, 1, 0, 0, 0, 0, 0, 0])
    labels_np = np.where(is_pos_np, gt_labels[matched_gt], NUM_CLASSES)

    # ---- torch side -------------------------------------------------
    with torch.no_grad():
        feats = tm.neck(tm.backbone(img))
        roi_feats = t_extract_multi(feats, rois_np)
        cls_logits, reg = tm.roi_head.bbox_head(roi_feats)
    # mmdet bbox2delta targets (stds .1/.1/.2/.2)
    px = (rois_np[:, 0] + rois_np[:, 2]) * .5
    py = (rois_np[:, 1] + rois_np[:, 3]) * .5
    pw = rois_np[:, 2] - rois_np[:, 0]
    ph = rois_np[:, 3] - rois_np[:, 1]
    g = gt[matched_gt]
    gx = (g[:, 0] + g[:, 2]) * .5
    gy = (g[:, 1] + g[:, 3]) * .5
    gw = g[:, 2] - g[:, 0]
    gh = g[:, 3] - g[:, 1]
    deltas = np.stack([(gx - px) / pw, (gy - py) / ph,
                       np.log(gw / pw), np.log(gh / ph)], -1)
    deltas = deltas / np.array([0.1, 0.1, 0.2, 0.2])
    ce = F.cross_entropy(cls_logits, torch.as_tensor(labels_np),
                         reduction='none')
    t_loss_cls = float(ce.sum() / S)
    reg_np = reg.numpy().reshape(S, NUM_CLASSES, 4)
    pos = np.where(is_pos_np)[0]
    pos_pred = reg_np[pos, labels_np[pos]]
    t_loss_bbox = float(np.abs(pos_pred - deltas[pos]).sum() / S)

    # ---- jax side ---------------------------------------------------
    model = build_flagship()
    params = params_to_jax(state_dict_to_params(tm.state_dict()))
    j_feats = model.extract_feat(params,
                                 jnp.asarray(img.numpy().transpose(0, 2, 3,
                                                                   1)))
    rois5 = jnp.concatenate([jnp.zeros((S, 1)), jnp.asarray(rois_np)], -1)
    out = model.roi_head._bbox_forward(params['roi_head'], j_feats, rois5,
                                       num_imgs=1)
    cls_score, bbox_pred = out[0], out[1]
    np.testing.assert_allclose(np.asarray(cls_score),
                               cls_logits.numpy(), rtol=1e-3, atol=2e-3)

    bh = model.roi_head.bbox_head
    labels_j, lw_j, bt_j, bw_j = bh.get_targets(
        jnp.asarray(rois_np), jnp.asarray(gt[matched_gt]),
        jnp.asarray(labels_np.astype(np.int32)),
        jnp.asarray(is_pos_np), jnp.ones((S,), bool))
    losses = bh.loss(cls_score, bbox_pred, labels_j, lw_j, bt_j, bw_j)
    np.testing.assert_allclose(float(losses['loss_cls']), t_loss_cls,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(losses['loss_bbox']), t_loss_bbox,
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# MultiClassesBBoxHead ("+fac") vs torch mirror
# ---------------------------------------------------------------------------


class TMultiClsHead(tnn.Module):
    """ref: multi_classes_bbox_head.py:169-226 (channel att -> spatial att
    -> refine conv -> 2 shared FCs; presence head from roi-mean pooled
    mean_mat)."""

    def __init__(self, c=C, fc=FC, num_classes=NUM_CLASSES):
        super().__init__()
        self.spa_conv = TConvHolder(tnn.Conv2d(c, 1, 3, padding=1))
        self.refine_conv = TConvHolder(tnn.Conv2d(c, c, 1))
        self.pre_fc = tnn.Linear(49 * c, 256)
        self.multi_cls_reg = tnn.Linear(256, (num_classes + 1) * 2)
        self.shared_fcs = tnn.ModuleList([tnn.Linear(c * 49, fc),
                                          tnn.Linear(fc, fc)])
        self.fc_cls = tnn.Linear(fc, num_classes + 1)
        self.fc_reg = tnn.Linear(fc, num_classes * 4)

    def forward(self, x):
        cha_att = F.relu(F.adaptive_avg_pool2d(x, [1, 1]))
        x_mc = x + x * cha_att
        spa_att = F.relu(self.spa_conv.conv(x_mc))
        mean_mat = x + x * spa_att
        out = F.relu(self.refine_conv.conv(mean_mat))
        out = out.flatten(1)
        for m in self.shared_fcs:
            out = F.relu(m(out))
        fc1 = F.relu(self.pre_fc(torch.mean(mean_mat, dim=0).view(1, -1)))
        multi_cls = self.multi_cls_reg(fc1).view(-1, 2)
        return self.fc_cls(out), self.fc_reg(out), multi_cls


def test_multi_cls_head_matches_torch_mirror():
    torch.manual_seed(5)
    tmh = TMultiClsHead()
    tmh.eval()
    R = 24
    x = torch.randn(R, C, 7, 7)
    with torch.no_grad():
        t_cls, t_reg, t_mc = tmh(x)

    from arfe_tpu.registry import HEADS, build_from_cfg
    head = build_from_cfg(dict(
        type='Shared2FCMultiClassesBBoxHead', in_channels=C,
        fc_out_channels=FC, roi_feat_size=7, num_classes=NUM_CLASSES,
        bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                        target_stds=[0.1, 0.1, 0.2, 0.2])), HEADS)
    params = params_to_jax(state_dict_to_params(tmh.state_dict()))
    j_cls, j_reg, j_mc = head(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), num_imgs=1)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mc).reshape(-1, 2),
                               t_mc.numpy(), rtol=1e-4, atol=1e-4)

    # ---- multi_classes_loss value (ref: cross_entropy_loss.py:66-97) ----
    labels = np.array([1, 3, 3, NUM_CLASSES], np.int64)  # presence ids
    p = torch.softmax(t_mc, dim=-1)
    pd = p[:, 1]
    ori = torch.zeros_like(pd)
    ori[labels] = 1
    pos_l = torch.where(ori == 1, torch.tanh(1 - pd) + (pd < 0.5).float(),
                        ori).max()
    neg_l = torch.where(ori == 0, torch.tanh(pd) + (pd > 0.5).float(),
                        torch.zeros_like(ori)).max()
    t_loss = float((pos_l + neg_l) * 0.5)

    from arfe_tpu.models.losses.cross_entropy_loss import multi_classes_loss
    presence = np.zeros(NUM_CLASSES + 1, np.int32)
    presence[labels] = 1
    j_loss = float(multi_classes_loss(np.asarray(j_mc).reshape(-1, 2),
                                      jnp.asarray(presence)))
    np.testing.assert_allclose(j_loss, t_loss, rtol=1e-5, atol=1e-6)


def test_multi_cls_aux_present_in_flagship_forward():
    """The composable '+fac' path: swapping the flagship's bbox head for
    Shared2FCMultiClassesBBoxHead threads multi_cls through
    _bbox_forward (ref live path: standard_roi_head.py:160-183)."""
    from arfe_tpu.models.builder import build_detector
    cfg = dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, out_indices=(0, 1, 2, 3)),
        neck=[dict(type='FPN', in_channels=[64, 128, 256, 512],
                   out_channels=C, num_outs=5),
              dict(type='WFPNDualSpatial', in_channels=C, num_levels=5)],
        rpn_head=dict(
            type='RPNHead', in_channels=C, feat_channels=C,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder'),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
                out_channels=C, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCMultiClassesBBoxHead', in_channels=C,
                fc_out_channels=FC, roi_feat_size=7,
                num_classes=NUM_CLASSES,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_stds=[0.1, 0.1, 0.2, 0.2]))))
    model = build_detector(cfg, train_cfg=dict(
        rcnn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.5,
                          match_low_quality=False),
            sampler=dict(type='RandomSampler', num=8, pos_fraction=0.25,
                         add_gt_as_proposals=True),
            pos_weight=-1),
        rpn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3,
                          match_low_quality=True),
            sampler=dict(type='RandomSampler', num=16, pos_fraction=0.5,
                         add_gt_as_proposals=False),
            allowed_border=-1, pos_weight=-1),
        rpn_proposal=dict(nms_pre=100, nms_post=32, max_num=32, nms_thr=0.7,
                          min_bbox_size=0)),
        test_cfg=dict(rpn=dict(nms_pre=100, nms_post=32, max_num=32,
                               nms_thr=0.7, min_bbox_size=0),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(type='nms', iou_thr=0.5),
                                max_per_img=10)))
    assert model.roi_head.with_multi_cls
    params = model.init(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 64, 96, 3))
    gt_bboxes = jnp.asarray([[[10., 10., 40., 50.], [0., 0., 0., 0.]]])
    gt_valid = jnp.asarray([[True, False]])
    gt_labels = jnp.asarray([[2, 0]], jnp.int32)
    losses = model.forward_train(params, img, jnp.asarray([[64., 96.]]),
                                 gt_bboxes, gt_valid, gt_labels,
                                 key=jax.random.PRNGKey(1))
    assert 'loss_multi_cls' in losses
    assert np.isfinite(float(losses['loss_multi_cls']))
