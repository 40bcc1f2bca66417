from .torch2jax import (diff_trees, load_torch_checkpoint, params_to_jax,
                        state_dict_to_params, tensor_to_array)

__all__ = ['load_torch_checkpoint', 'state_dict_to_params',
           'tensor_to_array', 'params_to_jax', 'diff_trees']
