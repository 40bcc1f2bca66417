_base_ = [
    '../_base_/models/retinanet_r50_drfpn.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py', '../_base_/default_runtime.py'
]
