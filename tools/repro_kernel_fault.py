"""Minimal-repro harness for the XLA TPU kernel-fault family.

Two production graphs hard-fault the TPU worker (bare jit; not our Pallas
kernels — they reproduce with them disabled):

  (a) RetinaNet bs8 ``simple_test`` wrapped in ``lax.fori_loop``
      (bench.py measure_chained docstring) — faults even at 1 iteration;
  (b) the composed backbone+FPN+channel-major-finals graph
      (``single_stage._head_bboxes`` with ``ARFE_TPU_CM_FINALS=1``) —
      an ``optimization_barrier`` on the neck outputs avoids it.

This script runs ONE parameterized slice of graph (b) (plus a ``fori``
mode for (a)) and prints ``OK <checksum>`` — the bisect driver
(`tools/bisect_kernel_fault.py`) runs it in subprocesses and shrinks the
failing configuration. Run on real TPU (no ARFE_TPU_FORCE_CPU).

Usage:
  python tools/repro_kernel_fault.py --frontend resnet --tail nms \
      --batch 8 --levels 5 [--barrier] [--fori]
  --frontend: resnet (RetinaNet R50+AR-FPN from config) | convs (one 3x3
      conv per level on strided random inputs) | input (random feats)
  --tail: feats | finals | softplus | topk | gather | decode | nms
      (cumulative stages of AnchorHead.get_bboxes_feats)
  --nhwc-tail: use the production NHWC forward + get_bboxes instead of
      the channel-major tail (for fault (a): --nhwc-tail --fori)
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frontend', default='resnet',
                    choices=['resnet', 'convs', 'input'])
    ap.add_argument('--tail', default='nms',
                    choices=['feats', 'finals', 'softplus', 'topk',
                             'gather', 'decode', 'nms'])
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--levels', type=int, default=5)
    ap.add_argument('--barrier', action='store_true')
    ap.add_argument('--fori', action='store_true',
                    help='wrap the whole graph in lax.fori_loop(0,1,...)')
    ap.add_argument('--nhwc-tail', action='store_true',
                    help='production NHWC head forward + get_bboxes')
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--height', type=int, default=800)
    ap.add_argument('--width', type=int, default=1344)
    ap.add_argument('--towers', type=int, default=4,
                    help='stacked head tower convs (retina default 4)')
    args = ap.parse_args()

    sys.path.insert(0, '.')
    import jax
    import jax.numpy as jnp
    from arfe_tpu.utils.compile_cache import enable
    enable()

    print(f'devices={jax.devices()}', flush=True)
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    h, w, b = args.height, args.width, args.batch
    rng = np.random.RandomState(0)

    from arfe_tpu import Config
    from arfe_tpu.models import build_detector
    cfg = Config.fromfile('configs/arfe/retinanet_r50_arfpn_1x_coco.py')
    model_cfg = dict(cfg.todict()['model'])
    model_cfg.pop('pretrained', None)
    model_cfg['backbone']['stem_space_to_depth'] = True
    model_cfg['bbox_head']['stacked_convs'] = args.towers
    ag = model_cfg['bbox_head'].get('anchor_generator')
    if ag and args.levels < len(ag.get('strides', [])):
        ag['strides'] = list(ag['strides'])[:args.levels]
    model = build_detector(model_cfg, test_cfg=cfg.todict()['test_cfg'])
    head = model.bbox_head
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    img_shapes = jnp.asarray([[float(h), 1333.0]] * b)
    scale_factors = jnp.ones((b, 4), jnp.float32)
    test_cfg = head.test_cfg

    lvl_shapes = [(h // s, w // s) for s in (8, 16, 32, 64, 128)]
    lvl_shapes = lvl_shapes[:args.levels]

    if args.frontend == 'resnet':
        img = jnp.asarray(rng.randn(b, h, w, 3) * 0.2, dtype)

        def frontend(p, x):
            return list(model.extract_feat(p, x))[:args.levels]
    elif args.frontend == 'convs':
        img = jnp.asarray(rng.randn(b, h // 8, w // 8, 256) * 0.2, dtype)
        cw = jnp.asarray(rng.randn(3, 3, 256, 256) * 0.02, dtype)

        def frontend(p, x):
            feats = []
            f = x
            for i, (lh, lw) in enumerate(lvl_shapes):
                f = jax.lax.conv_general_dilated(
                    f, cw, (1, 1) if i == 0 else (2, 2), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                feats.append(f)
            return feats
    else:  # input
        feats_np = [jnp.asarray(rng.randn(b, lh, lw, 256) * 0.2, dtype)
                    for (lh, lw) in lvl_shapes]
        img = feats_np[0]

        def frontend(p, x):
            return [x] + list(feats_np[1:])

    nms_pre = test_cfg.get('nms_pre', 1000)
    co = head.cls_out_channels

    def cm_tail(p, feats):
        """get_bboxes_feats replica with early exit after --tail stage."""
        ph = p['bbox_head']
        featmap_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        # pad to the generator's level count, slice after (--levels < 5)
        full_sizes = featmap_sizes + [(1, 1)] * (
            head.anchor_generator.num_levels - len(featmap_sizes))
        mlvl_anchors = head.anchor_generator.grid_anchors(
            full_sizes)[:len(featmap_sizes)]
        outs = []
        probs_l, preds_l, anchors_l = [], [], []
        for lvl, (x, anchors) in enumerate(zip(feats, mlvl_anchors)):
            cls_feat, reg_feat = head.forward_features(ph, x, lvl)
            pc, pr = head.final_params(ph, lvl)
            num_a = pc['bias'].shape[0] // co
            cls_t, reg_t = head._finals_cm(cls_feat, reg_feat, pc, pr)
            if args.tail == 'finals':
                outs.append((cls_t, reg_t))
                continue
            bb, hw = cls_t.shape[0], cls_t.shape[-1]
            cls_t = cls_t.reshape(bb, num_a, co, hw)
            reg_t = reg_t.reshape(bb, num_a, 4, hw)
            anchors = jnp.asarray(anchors).reshape(hw, num_a, 4) \
                .transpose(1, 0, 2).reshape(num_a * hw, 4)
            probs = jax.nn.sigmoid(cls_t)
            max_sc = probs.max(axis=2)
            if args.tail == 'softplus':
                outs.append((probs, max_sc))
                continue
            hwa = num_a * hw
            if hwa > nms_pre:
                _, idx = jax.lax.top_k(max_sc.reshape(bb, hwa), nms_pre)
                if args.tail == 'topk':
                    outs.append(idx)
                    continue
                a_idx, x_idx = idx // hw, idx % hw

                def _gather(t, ai, xi):
                    return t[ai, :, xi]

                probs_g = jax.vmap(_gather)(probs, a_idx, x_idx)
                preds_g = jax.vmap(_gather)(reg_t, a_idx, x_idx)
                anc = anchors[idx]
            else:
                if args.tail == 'topk':
                    outs.append(max_sc)
                    continue
                probs_g = probs.transpose(0, 1, 3, 2).reshape(bb, hwa, co)
                preds_g = reg_t.transpose(0, 1, 3, 2).reshape(bb, hwa, 4)
                anc = jnp.broadcast_to(anchors[None], (bb, hwa, 4))
            probs_l.append(probs_g)
            preds_l.append(preds_g)
            anchors_l.append(anc)
        if args.tail in ('finals', 'softplus', 'topk'):
            return outs
        if args.tail == 'gather':
            return probs_l, preds_l, anchors_l
        probs = jnp.concatenate(probs_l, axis=1)
        preds = jnp.concatenate(preds_l, axis=1)
        ancs = jnp.concatenate(anchors_l, axis=1)
        if args.tail == 'decode':
            boxes = jax.vmap(lambda a_, p_, s_: head.bbox_coder.decode(
                a_, p_, max_shape=s_))(ancs, preds, img_shapes)
            return boxes, probs
        return head._bboxes_tail(probs, preds, ancs, img_shapes,
                                 scale_factors, test_cfg, True)

    def whole(p, x):
        feats = frontend(p, x)
        if args.tail == 'feats':
            return feats
        if args.barrier:
            feats = list(jax.lax.optimization_barrier(tuple(feats)))
        if args.nhwc_tail:
            outs = head(p['bbox_head'], feats)
            return head.get_bboxes(*outs, img_shapes, scale_factors,
                                   rescale=True)
        return cm_tail(p, feats)

    if args.fori:
        @jax.jit
        def run(p, x):
            def body(i, carry):
                out = whole(p, carry)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return carry + (leaf.astype(jnp.float32).mean()
                                * 1e-20).astype(carry.dtype)
            return jax.lax.fori_loop(0, 1, body, x)[0, 0, 0]
    else:
        @jax.jit
        def run(p, x):
            out = whole(p, x)
            s = 0.
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + leaf.astype(jnp.float32).mean()
            return s

    t0 = time.time()
    r = run(params, img)
    v = float(np.asarray(jax.device_get(r)).sum())
    print(f'OK {v:.6g} ({time.time() - t0:.1f}s)', flush=True)


if __name__ == '__main__':
    main()
