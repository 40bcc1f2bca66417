# Faster R-CNN R50 + AR-FPN + AR-RFF (config #4, BASELINE.md)
# (reference analog: configs/mytrain/faster_rcnn_r50_drfpn_drrff+fac_1x_coco.py
#  with type='MultiRoIsBBoxHead')
_base_ = [
    '../_base_/models/faster_rcnn_r50_arfpn.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    roi_head=dict(
        bbox_head=dict(
            type='MultiRoIsBBoxHead',
            num_shared_fcs=2,
        )))
