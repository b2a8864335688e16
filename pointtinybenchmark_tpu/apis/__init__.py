from .inference import (async_inference_detector,
                        inference_detector, init_detector, show_result)

__all__ = ["init_detector", "inference_detector", "show_result", "async_inference_detector"]
