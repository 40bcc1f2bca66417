"""Per-block latency profile of the flagship TRAIN step on TPU.

Two prefix families, both timed with the chained-async-dispatch method from
bench.py (host-side timing of single dispatches is meaningless over the
axon tunnel):

  forward-only prefixes of the train loss function
      feat -> +rpn_convs -> +rpn_loss (targets+loss) -> +proposals ->
      +sample -> +roi_extract -> full loss fwd [-> +mask branch]
  value_and_grad prefixes
      vg(feat probe) -> vg(roi-feat probe) -> vg(rpn losses) ->
      vg(full loss) -> full optimizer step

Derived rows printed at the end:
  feat bwd        = vg_feat - fwd_feat
  roi-extract bwd = vg_roifeat - fwd_roi_extract - feat bwd
  rpn-loss bwd    = vg_rpn - fwd_rpn_loss - feat bwd
  optimizer       = full_step - vg_full

Usage: python tools/profile_train.py [batch] [--mask | --cascade]
(default flagship Faster R-CNN+AR-FPN+AR-RFF, bs4, 800x1344).
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
    import os
    pos = [a for a in sys.argv[1:] if not a.startswith('--')]
    batch = int(pos[0]) if pos else 4
    h, w, g = 800, 1344, 16
    if os.environ.get('ARFE_PROFILE_HW'):  # smoke-test shapes
        h, w = (int(v) for v in os.environ['ARFE_PROFILE_HW'].split(','))
    sys.path.insert(0, '.')
    from arfe_tpu.utils.compile_cache import enable
    enable()
    from arfe_tpu.parallel import make_dp_train_step, make_mesh, replicate
    from arfe_tpu.train import (build_lr_schedule, build_optimizer,
                                frozen_prefixes_from_cfg, parse_losses)

    if '--mask' in sys.argv or '--cascade' in sys.argv:
        from bench import build_from_config
        path = ('configs/arfe/mask_rcnn_r50_arfpn_1x_coco.py'
                if '--mask' in sys.argv
                else 'configs/arfe/cascade_rcnn_r50_arfpn_1x_coco.py')
        model, params = build_from_config(path, with_train_cfg=True)
    else:
        from __graft_entry__ import _build_flagship
        model = _build_flagship()
        params = jax.jit(model.init)(jax.random.PRNGKey(0))

    with_mask = '--mask' in sys.argv
    r = np.random.RandomState(0)
    gt_bboxes = np.zeros((batch, g, 4), np.float32)
    gt_valid = np.zeros((batch, g), bool)
    gt_labels = np.zeros((batch, g), np.int32)
    for i in range(batch):
        n = 8
        xy = r.uniform(0, [w - 80, h - 80], (n, 2))
        wh = r.uniform(30, 80, (n, 2))
        gt_bboxes[i, :n] = np.concatenate([xy, xy + wh], -1)
        gt_valid[i, :n] = True
        gt_labels[i, :n] = r.randint(0, 80, n)
    img = jnp.asarray(r.randn(batch, h, w, 3) * 0.2, jnp.bfloat16)
    batch_d = dict(img=img,
                   img_shape=jnp.asarray([[float(h), 1333.0]] * batch),
                   gt_bboxes=jnp.asarray(gt_bboxes),
                   gt_valid=jnp.asarray(gt_valid),
                   gt_labels=jnp.asarray(gt_labels))
    if with_mask:
        batch_d['gt_mask_crops'] = jnp.asarray(
            (r.rand(batch, g, 28, 28) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    img_shapes = batch_d['img_shape']
    rpn, roi = model.rpn_head, model.roi_head
    proposal_cfg = model.train_cfg.get('rpn_proposal') \
        or model.test_cfg.get('rpn')

    def loss_fn(p, x):
        kw = {}
        if with_mask:
            kw['gt_mask_crops'] = batch_d['gt_mask_crops']
        losses = model.forward_train(
            p, x, img_shapes, batch_d['gt_bboxes'], batch_d['gt_valid'],
            batch_d['gt_labels'], key, **kw)
        return parse_losses(losses)

    # ---- forward-only prefixes --------------------------------------
    def feat(p, x):
        return model.extract_feat(p, x)

    def fwd_backbone(p, x):
        return model.backbone(p['backbone'], x)

    def fwd_fpn(p, x):
        return model.neck.necks[0](p['neck']['0'],
                                   model.backbone(p['backbone'], x))

    has_cm_rpn = hasattr(rpn, 'get_proposals')

    def rpn_shared(p, x):
        fx = feat(p, x)
        if has_cm_rpn:
            return [rpn.shared_single(p['rpn_head'], f) for f in fx]
        return rpn(p['rpn_head'], fx)

    def rpn_loss(p, x):
        fx = feat(p, x)
        if has_cm_rpn:
            shared = [rpn.shared_single(p['rpn_head'], f) for f in fx]
            return rpn.loss_from_shared(
                p['rpn_head'], shared, batch_d['gt_bboxes'],
                batch_d['gt_valid'], img_shapes, key)
        outs = rpn(p['rpn_head'], fx)
        return rpn.loss(*outs, batch_d['gt_bboxes'], batch_d['gt_valid'],
                        img_shapes, key)

    def _props(p, fx):
        if has_cm_rpn:
            return rpn.get_proposals(p['rpn_head'], fx, img_shapes,
                                     cfg=proposal_cfg)
        outs = rpn(p['rpn_head'], fx)
        return rpn.get_bboxes(*outs, img_shapes, cfg=proposal_cfg)

    def proposals(p, x):
        return _props(p, feat(p, x))

    def _sampled(p, fx):
        props, prop_valid = _props(p, fx)
        if not hasattr(roi, '_sample_for_train'):  # cascade: stage 0
            return None
        return roi._sample_for_train(
            p['roi_head'], fx, props, prop_valid, batch_d['gt_bboxes'],
            batch_d['gt_valid'], batch_d['gt_labels'], key)

    def sample(p, x):
        fx = feat(p, x)
        s = _sampled(p, fx)
        return _props(p, fx) if s is None else s

    def roi_extract(p, x):
        fx = feat(p, x)
        s = _sampled(p, fx)
        if s is None:
            return _props(p, fx)
        b, ns = s['boxes'].shape[:2]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None], (b, ns))
        rois = jnp.concatenate([binds[..., None], s['boxes']],
                               axis=-1).reshape(b * ns, 5)
        ext = roi.bbox_roi_extractor
        lvl = fx[:ext.num_inputs]
        if getattr(roi, 'multi_rois', False):
            from arfe_tpu.models.utils.additional import \
                get_adaptive_scale_rois
            lh, lw = get_adaptive_scale_rois(rois, roi.adaptive_scale_fac)
            return ext({}, lvl, jnp.concatenate([rois, lw, lh], axis=0))
        return ext({}, lvl, rois)

    def full_fwd(p, x):
        return loss_fn(p, x)[0]

    # ---- value_and_grad prefixes ------------------------------------
    def vg_backbone(p, x):
        def probe(pp):
            fx = model.backbone(pp['backbone'], x)
            return sum(f.astype(jnp.float32).mean() for f in fx)
        return jax.value_and_grad(probe)(p)

    def vg_fpn(p, x):
        def probe(pp):
            fx = model.neck.necks[0](pp['neck']['0'],
                                     model.backbone(pp['backbone'], x))
            return sum(f.astype(jnp.float32).mean() for f in fx)
        return jax.value_and_grad(probe)(p)

    # FPN-internal bwd split (laterals / +topdown / full adds the 3x3
    # convs + extra levels)
    def vg_lat(p, x):
        def probe(pp):
            neck0 = model.neck.necks[0]
            fx = neck0._laterals(pp['neck']['0'],
                                 model.backbone(pp['backbone'], x))
            return sum(f.astype(jnp.float32).mean() for f in fx)
        return jax.value_and_grad(probe)(p)

    def vg_td(p, x):
        def probe(pp):
            neck0 = model.neck.necks[0]
            inputs = model.backbone(pp['backbone'], x)
            lat = neck0._laterals(pp['neck']['0'], inputs)
            lat = neck0._topdown(pp['neck']['0'], lat, inputs)
            return sum(f.astype(jnp.float32).mean() for f in lat)
        return jax.value_and_grad(probe)(p)

    def vg_feat(p, x):
        def probe(pp):
            fx = feat(pp, x)
            return sum(f.astype(jnp.float32).mean() for f in fx)
        return jax.value_and_grad(probe)(p)

    def vg_roifeat(p, x):
        def probe(pp):
            rf = roi_extract(pp, x)
            if isinstance(rf, tuple):       # cascade fallback: props only
                rf = rf[0]
            return rf.astype(jnp.float32).mean()
        return jax.value_and_grad(probe)(p)

    def vg_rpn(p, x):
        def probe(pp):
            losses = rpn_loss(pp, x)
            return sum(jnp.sum(sum(v) if isinstance(v, (list, tuple))
                               else v) for v in losses.values())
        return jax.value_and_grad(probe)(p)

    def vg_full(p, x):
        return jax.value_and_grad(
            lambda pp: loss_fn(pp, x)[0], has_aux=False)(p)

    stages = [('fwd_backbone', fwd_backbone), ('fwd_fpn', fwd_fpn),
              ('fwd_feat', feat), ('+rpn_convs', rpn_shared),
              ('+rpn_loss', rpn_loss), ('+proposals', proposals),
              ('+sample', sample), ('+roi_extract', roi_extract),
              ('full_fwd', full_fwd),
              ('vg_backbone', vg_backbone), ('vg_lat', vg_lat),
              ('vg_td', vg_td), ('vg_fpn', vg_fpn),
              ('vg_feat', vg_feat), ('vg_roifeat', vg_roifeat),
              ('vg_rpn', vg_rpn), ('vg_full', vg_full)]
    if os.environ.get('ARFE_PROFILE_STAGES'):
        want = set(os.environ['ARFE_PROFILE_STAGES'].split(','))
        stages = [(n, f) for n, f in stages if n in want]

    cum = {}
    prev = 0.0
    print(f'train bs{batch} {h}x{w} per-block profile '
          f'({"mask" if with_mask else "cascade" if "--cascade" in sys.argv else "flagship"})',
          flush=True)
    for name, fn in stages:
        @jax.jit
        def step(p, x, fn=fn):
            return _carry(x, fn(p, x))

        rr = step(params, img)
        float(jnp.sum(rr[0, 0, 0]))

        def run(n):
            rr = img
            t0 = time.time()
            for _ in range(n):
                rr = step(params, rr)
            float(jnp.sum(rr[0, 0, 0]))
            return time.time() - t0

        ts = {n: min(run(n) for _ in range(2)) for n in (2, 10)}
        per = (ts[10] - ts[2]) / 8
        cum[name] = per * 1e3
        print(f'{name:14s} cum {per * 1e3:7.2f} ms   '
              f'block {(per - prev) * 1e3:7.2f} ms', flush=True)
        prev = per

    if os.environ.get('ARFE_PROFILE_STAGES'):
        return   # partial run: skip the full step + derived rows

    # ---- full optimizer step (donated buffers -> separate loop) -----
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    sched = build_lr_schedule(
        dict(policy='step', warmup='linear', warmup_iters=500,
             warmup_ratio=0.001, step=[8, 11]), 0.02, 1000)
    opt = build_optimizer(
        dict(type='SGD', momentum=0.9, weight_decay=0.0001), sched, params,
        frozen_prefixes_from_cfg(dict(backbone=dict(frozen_stages=1))))
    with mesh:
        p = replicate(mesh, params)
        opt_state = replicate(mesh, opt.init(p))
        tstep = make_dp_train_step(model, opt, mesh)
        state = [p, opt_state]

        def trun(n):
            pp, oo = state
            t0 = time.time()
            for _ in range(n):
                pp, oo, log = tstep(pp, oo, batch_d, key)
            float(log['loss'])
            state[0], state[1] = pp, oo
            return time.time() - t0

        trun(1)
        ts = {n: min(trun(n) for _ in range(2)) for n in (3, 13)}
    full_ms = (ts[13] - ts[3]) / 10 * 1e3
    cum['full_step'] = full_ms
    print(f'{"full_step":14s} cum {full_ms:7.2f} ms', flush=True)

    print('\nderived:', flush=True)
    fb = cum['vg_feat'] - cum['fwd_feat']
    print(f'  feat bwd            {fb:7.2f} ms')
    if '+roi_extract' in cum:
        print(f'  roi-extract bwd     '
              f'{cum["vg_roifeat"] - cum["+roi_extract"] - fb:7.2f} ms')
    print(f'  rpn-loss bwd        '
          f'{cum["vg_rpn"] - cum["+rpn_loss"] - fb:7.2f} ms')
    print(f'  head+loss bwd(rest) '
          f'{cum["vg_full"] - cum["vg_roifeat"] - (cum["full_fwd"] - cum["+roi_extract"]) - (cum["vg_rpn"] - cum["+rpn_loss"] - fb):7.2f} ms')
    print(f'  optimizer           {full_ms - cum["vg_full"]:7.2f} ms')
    print(f'  total img/s         {batch / (full_ms / 1e3):7.2f}')


if __name__ == '__main__':
    main()
