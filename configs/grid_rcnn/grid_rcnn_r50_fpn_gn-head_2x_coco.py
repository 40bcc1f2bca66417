# Grid R-CNN Plus (ref: mmdet/models/roi_heads/grid_roi_head.py,
# mask_heads/grid_head.py)
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='GridRCNN',
    roi_head=dict(
        type='GridRoIHead',
        bbox_head=dict(with_reg=False),
        grid_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', out_size=14, sample_num=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(
            type='GridHead',
            grid_points=9,
            num_convs=8,
            in_channels=256,
            point_feat_channels=64,
            norm_cfg=dict(type='GN', num_groups=36),
            loss_grid=dict(
                type='CrossEntropyLoss', use_sigmoid=True,
                loss_weight=15))))
train_cfg = dict(
    rcnn=dict(
        sampler=dict(
            type='RandomSampler',
            num=256,
            pos_fraction=0.25,
            neg_pos_ub=-1,
            add_gt_as_proposals=True),
        pos_radius=1,
        max_num_grid=192))
test_cfg = dict(
    rcnn=dict(
        score_thr=0.03,
        nms=dict(type='nms', iou_thr=0.3),
        max_per_img=100))
lr_config = dict(step=[17, 23])
total_epochs = 25
