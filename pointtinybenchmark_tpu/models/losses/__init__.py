from .advanced import GHMC, GHMR, SeesawLoss, VarifocalLoss
from .cross_entropy_loss import CrossEntropyLoss
from .focal_loss import FocalLoss, sigmoid_focal_loss
from .gfocal_loss import DistributionFocalLoss, QualityFocalLoss
from .iou_loss import CIoULoss, DIoULoss, GIoULoss, IoULoss
from .mil_loss import AllPosLoss, MILLoss
from .smooth_l1_loss import (BalancedL1Loss, L1Loss, MSELoss,
                             SmoothL1Loss)
from .utils import accuracy, reduce_loss, weight_reduce_loss
from .weighted_hausdorff_distance import (WeightedHausdorffDistanceLoss,
                                          weighted_hausdorff_distance)

__all__ = [
    "GHMC", "GHMR", "SeesawLoss", "VarifocalLoss", "BalancedL1Loss",
    "FocalLoss", "sigmoid_focal_loss", "QualityFocalLoss",
    "DistributionFocalLoss", "CrossEntropyLoss", "SmoothL1Loss",
    "L1Loss", "MSELoss", "IoULoss", "GIoULoss", "DIoULoss", "CIoULoss",
    "MILLoss",
    "AllPosLoss", "accuracy", "reduce_loss", "weight_reduce_loss",
    "WeightedHausdorffDistanceLoss", "weighted_hausdorff_distance",
]
