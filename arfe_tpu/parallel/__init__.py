from .data_parallel import (make_dp_eval_step, make_dp_train_step, make_mesh,
                            replicate, shard_batch, shard_params,
                            tp_param_specs)

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'make_dp_train_step',
           'make_dp_eval_step', 'tp_param_specs', 'shard_params']
