from .inference import (Detector, async_inference_detector,
                        inference_detector, init_detector, show_result)
from .test import (encode_mask_results, multi_device_coco_eval,
                   multi_device_test, single_device_test)
from .train import set_random_seed, train_detector

__all__ = ['init_detector', 'inference_detector',
           'async_inference_detector', 'Detector', 'show_result',
           'single_device_test', 'encode_mask_results', 'multi_device_test',
           'multi_device_coco_eval', 'train_detector', 'set_random_seed']
