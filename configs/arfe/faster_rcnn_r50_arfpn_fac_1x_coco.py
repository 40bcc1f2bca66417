# Faster R-CNN R50 + AR-FPN + multi-class auxiliary head ("+fac")
# (reference analog: live path of
#  configs/mytrain/faster_rcnn_r50_drfpn_drrff+fac_1x_coco.py with
#  MultiClassesBBoxHead, ref standard_roi_head.py:135-183)
_base_ = [
    '../_base_/models/faster_rcnn_r50_arfpn.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    roi_head=dict(
        bbox_head=dict(
            type='Shared2FCMultiClassesBBoxHead',
        )))
