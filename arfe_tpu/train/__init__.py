from .optimizer import (build_lr_schedule, build_optimizer,
                        frozen_prefixes_from_cfg, make_masks)
from .train_step import make_train_step, parse_losses

__all__ = ['build_optimizer', 'build_lr_schedule', 'make_masks',
           'frozen_prefixes_from_cfg', 'make_train_step', 'parse_losses']
