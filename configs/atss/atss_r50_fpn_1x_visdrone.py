# ATSS on VisDrone (ref: configs/atss/atss_r50_fpn_1x_visdrone.py; the
# reference keeps num_classes=80 here — preserved)
_base_ = [
    './atss_r50_fpn_1x_coco.py',
    '../_base_/datasets/visdrone_detection.py',
]
