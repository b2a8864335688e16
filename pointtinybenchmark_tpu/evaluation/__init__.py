from .cocoeval import COCOExpandEval
from .location_eval import LocationEvaluator
from .merge import merge_det_result, nms_numpy

__all__ = ["COCOExpandEval", "LocationEvaluator", "merge_det_result",
           "nms_numpy"]
