"""Per-block latency profile of the flagship inference graph on TPU.

Times cumulative prefixes of the flagship Faster R-CNN + AR-FPN + AR-RFF
simple_test (backbone, +FPN, +WFPN, +RPN convs, +proposals, +RoI extract,
+head FCs, full) with the chained-async-dispatch method from bench.py (the
axon tunnel makes host-side timing of single dispatches meaningless).
Per-block cost is the difference between adjacent prefixes; the residual of
"full - (+head FCs)" is the final per-image NMS.

Usage: python tools/profile_flagship.py [batch] (default 8, 800x1344).
``--wfpn`` swaps in a WFPN-internal sub-stage profile (gather / refine /
attention / scatter) on top of the FPN prefix.
``--retinanet`` profiles the RetinaNet+AR-FPN single-stage graph instead
(backbone, +FPN, +WFPN, +cls/reg towers, +finals, +topk/decode, full NMS).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _carry(x, out):
    s = 0.
    for leaf in jax.tree_util.tree_leaves(out):
        s = s + (leaf.astype(jnp.float32).mean() * 1e-20)
    return x + s.astype(x.dtype)


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith('--')]
    batch = int(pos[0]) if pos else 8
    h, w = 800, 1344
    sys.path.insert(0, '.')
    from __graft_entry__ import _build_flagship
    from arfe_tpu.utils.compile_cache import enable
    enable()
    from arfe_tpu.models.utils.additional import get_adaptive_scale_rois

    if '--retinanet' in sys.argv:
        return profile_retinanet(batch, h, w)

    model = _build_flagship()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.RandomState(0).randn(batch, h, w, 3) * 0.2, jnp.bfloat16)
    img_shapes = jnp.asarray([[float(h), 1333.0]] * batch)
    scale_factors = jnp.ones((batch, 4), jnp.float32)

    neck0, neck1 = model.neck.necks
    rpn, roi = model.rpn_head, model.roi_head
    ext = roi.bbox_roi_extractor

    def backbone(p, x):
        return model.backbone(p['backbone'], x)

    def fpn(p, x):
        return neck0(p['neck']['0'], backbone(p, x))

    def wfpn(p, x):
        return neck1(p['neck']['1'], fpn(p, x))

    def rpnconv(p, x):
        return [rpn.shared_single(p['rpn_head'], f) for f in wfpn(p, x)]

    def proposals(p, x):
        return rpn.get_proposals(p['rpn_head'], wfpn(p, x), img_shapes)

    def _rois_of(props):
        b, pr, _ = props.shape
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=props.dtype)[:, None], (b, pr))
        return jnp.concatenate(
            [binds[..., None], props[..., :4]], -1).reshape(b * pr, 5)

    def extract(p, x):
        feats = wfpn(p, x)
        props, valid = rpn.get_proposals(p['rpn_head'], feats, img_shapes)
        rois = _rois_of(props)
        lvl = feats[:ext.num_inputs]
        if roi.multi_rois:
            lh, lw = get_adaptive_scale_rois(rois, roi.adaptive_scale_fac)
            allr = jnp.concatenate([rois, lw, lh], axis=0)
            return ext({}, lvl, allr)
        return ext({}, lvl, rois)

    def headfc(p, x):
        feats = wfpn(p, x)
        props, valid = rpn.get_proposals(p['rpn_head'], feats, img_shapes)
        return roi._bbox_forward(p['roi_head'], feats, _rois_of(props),
                                 num_imgs=batch)[:2]

    def full(p, x):
        return model.simple_test(p, x, img_shapes, scale_factors,
                                 rescale=True)

    stages = [('backbone', backbone), ('+fpn', fpn), ('+wfpn', wfpn),
              ('+rpn_convs', rpnconv), ('+proposals', proposals),
              ('+roi_extract', extract), ('+head_fcs', headfc),
              ('full', full)]

    if '--wfpn' in sys.argv:
        from arfe_tpu.models.necks.wfpn import _gather_levels

        def gather(p, x):
            return _gather_levels(fpn(p, x), neck1.refine_level)

        def refine(p, x):
            return neck1.refine(p['neck']['1']['refine'], gather(p, x))

        def att_only(p, x):
            # the dual-attention maps alone (no refine/scatter), via the
            # PRODUCTION WFPNDualSpatial.dual_attention path (stacked
            # (C,18) contraction + 9 shifted adds for the flagship's
            # norm-free convs)
            feats = fpn(p, x)
            pn = p['neck']['1']
            return [neck1.dual_attention(pn, i, f)
                    for i, f in enumerate(feats)]

        # rows that restart from the bare-fpn prefix rather than extending
        # the previous row: their (per - prev) difference is meaningless,
        # so the block column is suppressed for them
        stages = [('fpn', fpn), ('+gather', gather), ('+refine', refine),
                  ('fpn+att_only', att_only), ('fpn+wfpn_full', wfpn)]
        noncumulative = {'fpn+att_only', 'fpn+wfpn_full'}
    else:
        noncumulative = set()

    prev = 0.0
    stages_ms = {}
    print(f'flagship bs{batch} {h}x{w} per-block profile', flush=True)
    for name, fn in stages:
        @jax.jit
        def step(p, x, fn=fn):
            return _carry(x, fn(p, x))

        r = step(params, img)
        float(jnp.sum(r[0, 0, 0]))

        def run(n):
            r = img
            t0 = time.time()
            for _ in range(n):
                r = step(params, r)
            float(jnp.sum(r[0, 0, 0]))
            return time.time() - t0

        ts = {n: min(run(n) for _ in range(2)) for n in (2, 10)}
        per = (ts[10] - ts[2]) / 8
        if name in noncumulative:
            print(f'{name:14s} cum {per * 1e3:7.2f} ms   '
                  f'(vs fpn {(per - stages_ms["fpn"]) * 1e3:+7.2f} ms)',
                  flush=True)
        else:
            print(f'{name:14s} cum {per * 1e3:7.2f} ms   '
                  f'block {(per - prev) * 1e3:7.2f} ms', flush=True)
            prev = per
        stages_ms[name] = per


def _time_stages(stages, params, img, title, noncumulative=()):
    prev = 0.0
    stages_ms = {}
    print(title, flush=True)
    for name, fn in stages:
        @jax.jit
        def step(p, x, fn=fn):
            return _carry(x, fn(p, x))

        r = step(params, img)
        float(jnp.sum(r[0, 0, 0]))

        def run(n):
            r = img
            t0 = time.time()
            for _ in range(n):
                r = step(params, r)
            float(jnp.sum(r[0, 0, 0]))
            return time.time() - t0

        ts = {n: min(run(n) for _ in range(2)) for n in (2, 10)}
        per = (ts[10] - ts[2]) / 8
        if name in noncumulative:
            print(f'{name:14s} cum {per * 1e3:7.2f} ms', flush=True)
        else:
            print(f'{name:14s} cum {per * 1e3:7.2f} ms   '
                  f'block {(per - prev) * 1e3:7.2f} ms', flush=True)
            prev = per
        stages_ms[name] = per
    return stages_ms


def profile_retinanet(batch, h, w):
    """Single-stage (RetinaNet R50 + AR-FPN) per-block profile — VERDICT
    r4 weak #3: RetinaNet was flat for three rounds with no per-block
    attribution of its ~48 ms/batch."""
    from arfe_tpu import Config
    from arfe_tpu.models import build_detector

    cfg = Config.fromfile('configs/arfe/retinanet_r50_arfpn_1x_coco.py')
    model_cfg = dict(cfg.todict()['model'])
    model_cfg.pop('pretrained', None)
    model_cfg['backbone']['stem_space_to_depth'] = True
    model = build_detector(model_cfg, test_cfg=cfg.todict()['test_cfg'])
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.RandomState(0).randn(batch, h, w, 3) * 0.2, jnp.bfloat16)
    img_shapes = jnp.asarray([[float(h), 1333.0]] * batch)
    scale_factors = jnp.ones((batch, 4), jnp.float32)

    neck0, neck1 = model.neck.necks
    head = model.bbox_head
    test_cfg = head.test_cfg
    nms_pre = test_cfg.get('nms_pre', 1000)

    def backbone(p, x):
        return model.backbone(p['backbone'], x)

    def fpn(p, x):
        return neck0(p['neck']['0'], backbone(p, x))

    def wfpn(p, x):
        return neck1(p['neck']['1'], fpn(p, x))

    def towers(p, x):
        return [head.forward_features(p['bbox_head'], f, lvl)
                for lvl, f in enumerate(wfpn(p, x))]

    def finals(p, x):
        return head(p['bbox_head'], wfpn(p, x))

    def topk(p, x):
        # get_bboxes up to the per-level flatten + top-k (no decode/NMS)
        cls_scores, bbox_preds = head(p['bbox_head'], wfpn(p, x))
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [q.astype(jnp.float32) for q in bbox_preds]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        mlvl_anchors = head.anchor_generator.grid_anchors(featmap_sizes)
        outs = []
        for cs, bp, anc in zip(cls_scores, bbox_preds, mlvl_anchors):
            scores, preds = head._flatten_level(cs, bp)
            outs.append(head._topk_level(scores, preds, jnp.asarray(anc),
                                         nms_pre))
        return outs

    def full(p, x):
        return model.simple_test(p, x, img_shapes, scale_factors,
                                 rescale=True)

    stages = [('backbone', backbone), ('+fpn', fpn), ('+wfpn', wfpn),
              ('+towers', towers), ('+finals', finals),
              ('+flat_topk', topk), ('full', full)]
    _time_stages(stages, params, img,
                 f'retinanet bs{batch} {h}x{w} per-block profile')


if __name__ == '__main__':
    main()
