# the reference file inherits the plain base and relied on hand-editing _base_; here the neck named by the filename is wired explicitly
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(
    neck=[
        dict(
            type='FPNBAM',
            in_channels=[256, 512, 1024, 2048],
            out_channels=256,
            num_outs=5)])
