from .nms import batched_nms, nms, nms_match, soft_nms

__all__ = ['nms', 'soft_nms', 'batched_nms', 'nms_match']
