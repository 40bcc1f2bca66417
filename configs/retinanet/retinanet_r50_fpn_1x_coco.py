# Vanilla RetinaNet R50 baseline (config #1, BASELINE.md;
# ref: configs/_base_/models/retinanet_r50_fpn.py + retinanet_r50_fpn_1x_coco)
_base_ = [
    '../arfe/retinanet_r50_arfpn_1x_coco.py',
]
# drop the AR-FPN stage: plain FPN only
model = dict(
    neck=[
        dict(
            type='FPN',
            in_channels=[256, 512, 1024, 2048],
            out_channels=256,
            start_level=1,
            add_extra_convs='on_input',
            num_outs=5),
    ])
