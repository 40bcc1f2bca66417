# (ref: configs/_base_/default_runtime.py)
checkpoint_config = dict(interval=1)
log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook')])
dist_params = dict(backend='ici')  # XLA collectives over ICI, not NCCL
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
