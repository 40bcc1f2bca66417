"""End-to-end CLI smoke: train -> resume -> test --eval bbox on a synthetic
tiny-COCO set, all through the real ``tools/train.py`` / ``tools/test.py``
CLIs in subprocesses (CPU). Committed, driver-runnable capture of the
verify-skill recipe so CLI-stack regressions surface every round.

Exercises the L7 surface of ref: tools/train.py:65 / tools/test.py:71
(config load, dataset+loader build, epoch loop, checkpointing, resume,
eval protocol) end to end.

Usage: python tools/e2e_smoke.py [--root DIR] [--epochs N]
Prints one JSON line {"ok": bool, ...}; exit 0 iff ok. ~6 min on CPU.
"""
import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

CFG_TMPL = """
dataset_type = 'CocoDataset'
classes = ('box',)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True),
    dict(type='Resize', img_scale=(160, 128), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(160, 128), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]
data = dict(
    samples_per_gpu=2, workers_per_gpu=0,
    train=dict(type=dataset_type, classes=classes,
               ann_file='{root}/ann.json',
               img_prefix='{root}/imgs/', pipeline=train_pipeline),
    val=dict(type=dataset_type, classes=classes,
             ann_file='{root}/ann.json',
             img_prefix='{root}/imgs/', pipeline=test_pipeline),
    test=dict(type=dataset_type, classes=classes,
              ann_file='{root}/ann.json',
              img_prefix='{root}/imgs/', pipeline=test_pipeline))
model = dict(
    type='FasterRCNN',
    backbone=dict(type='ResNet', depth=18, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=True),
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
              out_channels=64, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=64, feat_channels=64,
                  anchor_generator=dict(type='AnchorGenerator', scales=[4],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[4, 8, 16, 32, 64]),
                  bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                  target_means=[.0, .0, .0, .0],
                                  target_stds=[1.0, 1.0, 1.0, 1.0]),
                  loss_cls=dict(type='CrossEntropyLoss',
                                use_sigmoid=True, loss_weight=1.0),
                  loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=7, sample_num=2),
            out_channels=64, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type='Shared2FCBBoxHead', in_channels=64,
                       fc_out_channels=128, roi_feat_size=7, num_classes=1,
                       bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                       target_means=[0., 0., 0., 0.],
                                       target_stds=[0.1, 0.1, 0.2, 0.2]),
                       reg_class_agnostic=False,
                       loss_cls=dict(type='CrossEntropyLoss',
                                     use_sigmoid=False, loss_weight=1.0),
                       loss_bbox=dict(type='L1Loss', loss_weight=1.0))))
train_cfg = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                          neg_pos_ub=-1, add_gt_as_proposals=False),
             allowed_border=-1, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_pre=200, nms_post=100, max_num=100,
                      nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                            neg_iou_thr=0.5, min_pos_iou=0.5,
                            match_low_quality=False, ignore_iof_thr=-1),
              sampler=dict(type='RandomSampler', num=64, pos_fraction=0.25,
                           neg_pos_ub=-1, add_gt_as_proposals=True),
              pos_weight=-1, debug=False))
test_cfg = dict(
    rpn=dict(nms_pre=100, nms_post=50, max_num=50, nms_thr=0.7,
             min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_thr=0.5),
              max_per_img=20))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='step', warmup='linear', warmup_iters=5,
                 warmup_ratio=0.001, step=[2])
checkpoint_config = dict(interval=1)
log_config = dict(interval=1, hooks=[dict(type='TextLoggerHook')])
total_epochs = {epochs}
evaluation = dict(interval={epochs}, metric='bbox')
dist_params = dict(backend='nccl')
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
"""


def make_dataset(root):
    """8 images, 3 solid rectangles each, single 'box' category."""
    import cv2
    os.makedirs(f'{root}/imgs', exist_ok=True)
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 1
    for i in range(8):
        h, w = 128, 160
        img = (rng.rand(h, w, 3) * 255).astype('uint8')
        boxes = []
        for _ in range(3):
            x, y = rng.randint(5, w - 50), rng.randint(5, h - 50)
            bw, bh = rng.randint(20, 40), rng.randint(20, 40)
            c = [int(v) for v in rng.randint(0, 255, 3)]
            cv2.rectangle(img, (x, y), (x + bw, y + bh), c, -1)
            boxes.append((x, y, bw, bh))
        cv2.imwrite(f'{root}/imgs/{i:03d}.jpg', img)
        images.append(dict(id=i, file_name=f'{i:03d}.jpg',
                           width=w, height=h))
        for (x, y, bw, bh) in boxes:
            anns.append(dict(id=aid, image_id=i, category_id=1,
                             bbox=[float(x), float(y), float(bw), float(bh)],
                             area=float(bw * bh), iscrowd=0))
            aid += 1
    with open(f'{root}/ann.json', 'w') as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=[dict(id=1, name='box')]), f)


def _run(args, timeout=560):
    env = dict(os.environ, ARFE_TPU_FORCE_CPU='1')
    # under pytest, conftest exports an 8-virtual-device XLA_FLAGS; the CLI
    # children must run single-device or the train loop goes 8-way DP
    flags = [f for f in env.get('XLA_FLAGS', '').split()
             if not f.startswith('--xla_force_host_platform_device_count')]
    env['XLA_FLAGS'] = ' '.join(flags)
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, timeout=timeout, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    return r.returncode, r.stdout + r.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/arfe_e2e_smoke')
    ap.add_argument('--epochs', type=int, default=2)
    args = ap.parse_args()
    root = args.root
    os.makedirs(root, exist_ok=True)
    make_dataset(root)
    cfg_path = f'{root}/cfg.py'
    with open(cfg_path, 'w') as f:
        f.write(CFG_TMPL.format(root=root, epochs=args.epochs))
    work = f'{root}/work'
    if os.path.exists(work):
        import shutil
        shutil.rmtree(work)

    out = {'ok': False, 'stages': {}}

    rc, log = _run(['tools/train.py', cfg_path, '--work-dir', work,
                    '--seed', '0', '--no-validate'])
    losses = [float(m) for m in re.findall(r'\bloss: ([0-9.]+)', log)]
    out['stages']['train'] = dict(rc=rc, n_loss_lines=len(losses),
                                  last_loss=losses[-1] if losses else None)
    if rc != 0 or not losses or not np.isfinite(losses[-1]):
        out['error'] = 'train failed'
        print(json.dumps(out), flush=True)
        print(log[-2000:], file=sys.stderr)
        sys.exit(1)

    rc, log = _run(['tools/train.py', cfg_path, '--work-dir', work,
                    '--seed', '0', '--no-validate',
                    '--resume-from', f'{work}/epoch_1.pkl'])
    rl = [float(m) for m in re.findall(r'\bloss: ([0-9.]+)', log)]
    out['stages']['resume'] = dict(rc=rc, n_loss_lines=len(rl),
                                   last_loss=rl[-1] if rl else None)
    if rc != 0 or not rl or not np.isfinite(rl[-1]):
        out['error'] = 'resume failed'
        print(json.dumps(out), flush=True)
        print(log[-2000:], file=sys.stderr)
        sys.exit(1)

    rc, log = _run(['tools/test.py', cfg_path, f'{work}/latest.pkl',
                    '--eval', 'bbox'])
    m = re.search(r'bbox_mAP: ([-0-9.]+)', log)
    out['stages']['test'] = dict(rc=rc,
                                 bbox_mAP=float(m.group(1)) if m else None)
    if rc != 0 or m is None:
        out['error'] = 'test/eval failed'
        print(json.dumps(out), flush=True)
        print(log[-2000:], file=sys.stderr)
        sys.exit(1)

    # mAP ~0 is EXPECTED at 2 epochs from random init; the gate is that the
    # full CLI stack (config -> loader -> epoch loop -> ckpt -> resume ->
    # eval protocol) runs and emits a parseable, finite metric. Nonzero-AP
    # correctness is pinned by tests/test_diff_ap.py.
    out['ok'] = True
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
