_base_ = [
    '../_base_/models/fast_rcnn_r50_fpn.py',
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py', '../_base_/default_runtime.py'
]
data = dict(
    train=dict(proposal_file='data/coco/proposals/rpn_r50_fpn_1x_train2017.pkl'),
    val=dict(proposal_file='data/coco/proposals/rpn_r50_fpn_1x_val2017.pkl'),
    test=dict(proposal_file='data/coco/proposals/rpn_r50_fpn_1x_val2017.pkl'))
