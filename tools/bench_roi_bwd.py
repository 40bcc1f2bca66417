"""RoIAlign-backward micro-bench at the TRAIN roi mix.

The round-5 train profile shows roi-extract bwd ~30 ms of the 118 ms
flagship train step (bs4, 512 sampled rois/img x 3 AR-RFF variants =
6144 rois). This tool times grad-wrt-FEATURES of the extraction alone on
exactly that mix (real proposals + assign/sample on the profile_train
synthetic batch), so kernel knobs can be swept without re-running the
whole step:

  ARFE_TPU_PALLAS_ROI_BWD=0  python tools/bench_roi_bwd.py   # XLA vjp
  ARFE_TPU_ROI_BWD_NBUF=N    python tools/bench_roi_bwd.py   # buffer sets

Also prints the adaptive-window bucket histogram of the mix (bucket
codes from the shared _window_prep, smallest-first: 3=(16,24),
2=(24,32), 1=(32,40), 0=(48,64)) — the buckets were originally picked on
TEST-time proposals; a train mix that lands mostly in big buckets would
explain a slow backward.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w, g = 800, 1344, 16
    if os.environ.get('ARFE_PROFILE_HW'):  # smoke-test shapes
        h, w = (int(v) for v in os.environ['ARFE_PROFILE_HW'].split(','))
    sys.path.insert(0, '.')
    from arfe_tpu.utils.compile_cache import enable
    enable()
    from __graft_entry__ import _build_flagship
    from arfe_tpu.models.utils.additional import get_adaptive_scale_rois

    model = _build_flagship()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
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
    img_shapes = jnp.asarray([[float(h), 1333.0]] * batch)
    key = jax.random.PRNGKey(0)
    rpn, roi = model.rpn_head, model.roi_head
    ext = roi.bbox_roi_extractor
    proposal_cfg = model.train_cfg.get('rpn_proposal') \
        or model.test_cfg.get('rpn')

    @jax.jit
    def make_rois(p, x):
        fx = model.extract_feat(p, x)
        props, prop_valid = rpn.get_proposals(p['rpn_head'], fx, img_shapes,
                                              cfg=proposal_cfg)
        s = roi._sample_for_train(p['roi_head'], fx, props, prop_valid,
                                  jnp.asarray(gt_bboxes),
                                  jnp.asarray(gt_valid),
                                  jnp.asarray(gt_labels), key)
        b, ns = s['boxes'].shape[:2]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None], (b, ns))
        rois = jnp.concatenate([binds[..., None], s['boxes']],
                               axis=-1).reshape(b * ns, 5)
        lh, lw = get_adaptive_scale_rois(rois, roi.adaptive_scale_fac)
        return fx, jnp.concatenate([rois, lw, lh], axis=0)

    fx, all_rois = make_rois(params, img)
    fx = jax.tree_util.tree_map(jax.device_get, fx)
    fx = [jnp.asarray(f) for f in fx][:ext.num_inputs]
    all_rois = jnp.asarray(jax.device_get(all_rois))
    print(f'{all_rois.shape[0]} rois (bs{batch}, {h}x{w})', flush=True)
    if '--dump' in sys.argv:
        np.savez('/tmp/train_rois.npz', rois=np.asarray(all_rois),
                 sizes=np.array([(f.shape[1], f.shape[2]) for f in fx]))
        print('dumped /tmp/train_rois.npz', flush=True)
        return

    # bucket histogram (host): run the shared prep and count sm codes
    from arfe_tpu.ops import pallas_roi_align as pra
    real_sizes = np.array([(f.shape[1], f.shape[2]) for f in fx], np.int32)

    @jax.jit
    def prep(rois):
        return pra._window_prep(
            rois, real_sizes, real_sizes, None,
            tuple(ext.featmap_strides), ext.finest_scale,
            (ext.out_size, ext.out_size) if isinstance(ext.out_size, int)
            else ext.out_size, max(ext.sample_num, 2), ext.aligned)[4]

    sm = np.asarray(jax.device_get(prep(all_rois)))
    names = {3: '(16,24)', 2: '(24,32)', 1: '(32,40)', 0: '(48,64)'}
    total = len(sm)
    for code in (3, 2, 1, 0):
        cnt = int((sm == code).sum())
        print(f'  bucket {names[code]}: {cnt:6d} ({cnt / total:5.1%})',
              flush=True)

    # 2-D sample-extent histogram (rows x cols, level coords) — shows
    # whether the big-bucket mass is tall-narrow / short-wide (AR-RFF
    # stretch variants) that asymmetric buckets would catch
    strides = np.asarray(ext.featmap_strides, np.float32)
    from arfe_tpu.ops.roi_align import map_roi_levels
    tl = np.asarray(jax.device_get(map_roi_levels(
        all_rois, len(strides), ext.finest_scale)))
    r_np = np.asarray(jax.device_get(all_rois))
    sc = 1.0 / strides[tl]
    x1 = r_np[:, 1] * sc - 0.5
    y1 = r_np[:, 2] * sc - 0.5
    x2 = r_np[:, 3] * sc - 0.5
    y2 = r_np[:, 4] * sc - 0.5
    lvl_h = real_sizes[tl, 0].astype(np.float32)
    lvl_w = real_sizes[tl, 1].astype(np.float32)
    ey = np.clip(y2, 0, lvl_h - 1) - np.clip(y1, 0, lvl_h - 1)
    ex = np.clip(x2, 0, lvl_w - 1) - np.clip(x1, 0, lvl_w - 1)
    edges = [0, 14, 22, 30, 46, 10 ** 9]
    lab = ['<=14', '<=22', '<=30', '<=46', '>46']

    def _bin(v):   # exact-0 extents (degenerate boxes) belong in bin 0
        return int(np.clip(np.searchsorted(edges, v, 'right') - 1, 0, 4))

    def _hist(mask, title):
        hist = np.zeros((5, 5), int)
        for i in np.where(mask)[0]:
            hist[_bin(ey[i]), _bin(ex[i])] += 1
        print(f'  {title} rows\\cols '
              + ' '.join(f'{c__:>7s}' for c__ in lab), flush=True)
        for i_, row in enumerate(hist):
            print(f'  {lab[i_]:>8s} ' + ' '.join(f'{v:7d}' for v in row),
                  flush=True)

    _hist(np.ones(len(ey), bool), 'ALL')
    _hist(sm == 0, 'FULL-BUCKET')
    lv_cnt = np.bincount(tl[sm == 0], minlength=4)
    print(f'  full-bucket per level: {lv_cnt.tolist()}', flush=True)

    # grad wrt FEATURES of the extraction alone (chained dispatch)
    def probe(feats):
        return ext({}, list(feats), all_rois).astype(jnp.float32).mean()

    @jax.jit
    def step(feats):
        val, grads = jax.value_and_grad(probe)(tuple(feats))
        return [f + gg.astype(f.dtype) * 1e-20 for f, gg in zip(feats,
                                                                grads)]

    state = [jnp.asarray(f) for f in fx]
    out = step(state)
    float(jnp.sum(out[0][0, 0, 0]))

    def run(n):
        s = state
        t0 = time.time()
        for _ in range(n):
            s = step(s)
        float(jnp.sum(s[0][0, 0, 0]))
        return time.time() - t0

    ts = {n: min(run(n) for _ in range(2)) for n in (2, 10)}
    per = (ts[10] - ts[2]) / 8
    import os
    print(f'extract fwd+bwd: {per * 1e3:.2f} ms  '
          f'(PALLAS_ROI_BWD={os.environ.get("ARFE_TPU_PALLAS_ROI_BWD", "1")}'
          f' NBUF={os.environ.get("ARFE_TPU_ROI_BWD_NBUF", "3")})',
          flush=True)


if __name__ == '__main__':
    main()
