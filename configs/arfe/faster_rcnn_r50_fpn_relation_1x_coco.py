# Faster R-CNN + FPN + FPNRelation second stage
# (ref: configs/_base_/models/faster_rcnn_r50_fpn_relation_visdrone.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    neck=[
        dict(type='FPN', in_channels=[256, 512, 1024, 2048],
             out_channels=256, num_outs=5),
        dict(type='FPNRelation', in_channels=256, num_levels=5),
    ])
