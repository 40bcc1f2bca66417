# NAS-FCOS (head ref: mmdet/models/dense_heads/nasfcos_head.py,
# neck ref: necks/nasfcos_fpn.py)
_base_ = ['../fcos/fcos_r50_fpn_1x_coco.py']
model = dict(
    type='NASFCOS',
    neck=[dict(
        type='NASFCOS_FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        start_level=1,
        norm_cfg=dict(type='BN'),
        conv_cfg=None)],
    bbox_head=dict(
        type='NASFCOSHead',
        norm_cfg=dict(type='GN', num_groups=32)))
