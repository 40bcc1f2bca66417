# ARFE-novel Faster+FSAF hybrid leaf config
# (ref: configs/mytrain/faster_rcnn_r50_fsaf_1x_coco.py)
_base_ = [
    '../_base_/models/faster_fsaf_r50_fpn.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
