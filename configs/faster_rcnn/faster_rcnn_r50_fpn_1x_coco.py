# Vanilla Faster R-CNN R50-FPN baseline
# (ref: configs/_base_/models/faster_rcnn_r50_fpn.py)
_base_ = [
    '../_base_/models/faster_rcnn_r50_arfpn.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    neck=[
        dict(
            type='FPN',
            in_channels=[256, 512, 1024, 2048],
            out_channels=256,
            num_outs=5),
    ])
