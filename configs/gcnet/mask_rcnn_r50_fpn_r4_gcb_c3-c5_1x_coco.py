# GCNet: ContextBlock plugin on stages c3-c5
_base_ = ['../arfe/mask_rcnn_r50_arfpn_1x_coco.py']
model = dict(
    neck=[dict(
        type='FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5)],
    backbone=dict(plugins=[
        dict(
            cfg=dict(type='ContextBlock', ratio=1. / 4),
            stages=(False, True, True, True),
            position='after_conv3')
    ]))
