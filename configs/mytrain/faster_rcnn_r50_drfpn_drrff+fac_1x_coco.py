# AR-FPN + AR-RFF flagship under its reference filename
_base_ = '../arfe/faster_rcnn_r50_arfpn_arrff_1x_coco.py'
