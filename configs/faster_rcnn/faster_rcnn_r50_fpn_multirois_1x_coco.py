# AR-RFF multi-RoI head (reference file relied on hand-editing _base_; wired explicitly here)
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(bbox_head=dict(type='MultiRoIsBBoxHead')))
