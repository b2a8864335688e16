from .inference import (inference_detector, init_detector,
                        show_result)

__all__ = ["init_detector", "inference_detector", "show_result"]
