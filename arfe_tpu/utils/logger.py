"""Root logger (ref: mmdet/utils/logger.py:6-25)."""
from __future__ import annotations

import logging

_initialized = {}


def get_root_logger(log_file=None, log_level=logging.INFO):
    logger = logging.getLogger('arfe_tpu')
    if 'arfe_tpu' in _initialized:
        return logger
    fmt = '%(asctime)s - %(name)s - %(levelname)s - %(message)s'
    handlers = [logging.StreamHandler()]
    if log_file is not None:
        handlers.append(logging.FileHandler(log_file, 'w'))
    for h in handlers:
        h.setFormatter(logging.Formatter(fmt))
        h.setLevel(log_level)
        logger.addHandler(h)
    logger.setLevel(log_level)
    _initialized['arfe_tpu'] = True
    return logger
