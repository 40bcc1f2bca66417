from .data_parallel import (make_dp_eval_step, make_dp_train_step, make_mesh,
                            replicate, shard_batch, shard_params,
                            tp_param_specs)
from .multihost import (global_batch, is_main_process,
                        maybe_init_distributed, process_info)

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'make_dp_train_step',
           'make_dp_eval_step', 'tp_param_specs', 'shard_params',
           'maybe_init_distributed', 'process_info', 'is_main_process',
           'global_batch']
