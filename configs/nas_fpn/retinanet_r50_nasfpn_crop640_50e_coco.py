# RetinaNet + NAS-FPN (neck ref: mmdet/models/necks/nas_fpn.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    neck=[dict(
        type='NASFPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        stack_times=7,
        start_level=1,
        norm_cfg=dict(type='BN', requires_grad=True))],
    bbox_head=dict(type='RetinaSepBNHead', num_ins=5,
                   norm_cfg=dict(type='BN', requires_grad=True)))
optimizer = dict(lr=0.08)
