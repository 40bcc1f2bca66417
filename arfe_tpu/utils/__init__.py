from .checkpoint import load_checkpoint, publish_model, save_checkpoint
from .collect_env import collect_env
from .logger import get_root_logger

__all__ = ['save_checkpoint', 'load_checkpoint', 'publish_model',
           'get_root_logger', 'collect_env']

from .profiling import profile_time, trace  # noqa: E402,F401
__all__ += ['profile_time', 'trace']
from .visualize import visualize_attention  # noqa: E402,F401
__all__ += ['visualize_attention']
