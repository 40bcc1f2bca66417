# 2x schedule (ref: configs/_base_/schedules/schedule_2x.py)
_base_ = './schedule_1x.py'
lr_config = dict(step=[16, 22])
total_epochs = 24
