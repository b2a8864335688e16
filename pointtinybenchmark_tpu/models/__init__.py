from . import losses  # noqa: F401 — register losses
from .backbones.darknet import Darknet
from .backbones.hourglass import HourglassNet
from .backbones.hrnet import HRFPN, HRNet
from .backbones.regnet import RegNet
from .backbones.res2net import Res2Net
from .backbones.resnest import ResNeSt
from .backbones.ssd_vgg import SSDVGG
from .backbones.detectors_resnet import (DetectoRS_ResNet,
                                         DetectoRS_ResNeXt, SAConv2d)
from .backbones.trident_resnet import TridentResNet
from .necks.rfp import ASPP, RFP
from .necks.fpg import FPG, NASFCOS_FPN
from .necks.extra_necks import BFP, ChannelMapper, MergeCell, NASFPN
from .backbones.mobilenet_v2 import MobileNetV2
from .backbones.resnet import ResNet, ResNeXt
from .builder import (build_backbone, build_detector, build_head, build_model,
                      build_neck)
from .dense_heads.anchor_head import AnchorHead
from .dense_heads.atss_head import ATSSHead
from .dense_heads.centernet_head import (CenterNetHead, CTResNetNeck,
                                         GaussianFocalLoss)
from .dense_heads.cpr_head import CascadeCPRHead, CPRHead
from .dense_heads.detr_head import DETRHead
from .dense_heads.fcos_head import FCOSHead
from .dense_heads.fovea_head import FoveaHead
from .dense_heads.fsaf_head import FSAFHead
from .dense_heads.vfnet_head import VFNetHead
from .dense_heads.autoassign_head import AutoAssignHead
from .dense_heads.corner_head import CornerHead, corner_pool
from .dense_heads.deformable_detr_head import (DeformableDETRHead,
                                               MSDeformAttention)
from .dense_heads.paa_head import PAAHead
from .dense_heads.yolof_head import DilatedEncoder, YOLOFHead
from .dense_heads.gfl_head import GFLHead
from .dense_heads.guided_anchor_head import (FeatureAdaption, GARetinaHead,
                                             GARPNHead, GuidedAnchorHead)
from .dense_heads.ld_head import (KnowledgeDistillationSingleStageDetector,
                                  LDHead)
from .dense_heads.p2b_head import P2BNetHead, SSDDetHead
from .dense_heads.p2p_head import P2PHead
from .dense_heads.free_anchor_retina_head import FreeAnchorRetinaHead
from .dense_heads.pisa_retina_head import PISARetinaHead
from .dense_heads.retina_head import RetinaHead
from .dense_heads.sabl_retina_head import SABLRetinaHead
from .dense_heads.yolo_head import YOLOV3Head, YOLOV3Neck
from .detectors.single_stage import BasicLocator, SingleStageDetector
from .necks.fpn import FPN
from .necks.fpn_carafe import FPN_CARAFE
from .necks.pafpn import PAFPN

__all__ = [
    "ResNet", "ResNeXt", "MobileNetV2", "Darknet",
    "YOLOV3", "YOLOV3Head", "YOLOV3Neck", "CenterNet", "CenterNetHead",
    "CTResNetNeck", "GaussianFocalLoss", "FPN", "PAFPN", "P2PHead", "P2BNetHead", "SSDDetHead", "CPRHead", "CascadeCPRHead", "AnchorHead", "RetinaHead",
    "FPN_CARAFE", "HRNet", "HRFPN", "HourglassNet", "Res2Net", "ResNeSt", "RegNet", "SSDVGG", "TridentResNet", "DetectoRS_ResNet", "SAConv2d", "RFP", "ASPP", "BFP", "ChannelMapper", "NASFPN", "MergeCell", "FCOSHead", "FoveaHead", "FoveaBox", "FSAFHead", "FSAF", "VFNetHead", "VFNet", "YOLOFHead", "YOLOF", "PAAHead", "AutoAssignHead", "AutoAssign", "CornerHead", "CornerNet", "corner_pool", "DeformableDETRHead", "DeformableDETR", "MSDeformAttention", "DilatedEncoder", "ATSSHead", "GFLHead", "GuidedAnchorHead", "GARetinaHead", "GARPNHead",
    "FeatureAdaption", "FreeAnchorRetinaHead", "SABLRetinaHead", "LDHead", "KnowledgeDistillationSingleStageDetector", "PISARetinaHead", "DETRHead", "DETR", "SingleStageDetector", "BasicLocator",
    "build_model", "build_backbone", "build_neck", "build_head",
    "build_detector",
]

from .dense_heads.reppoints_head import RepPointsHead  # noqa: E402
from .dense_heads.rpn_head import RPNHead  # noqa: E402
from .dense_heads.ssd_head import SSDHead  # noqa: E402
from .detectors.single_stage import (CenterNet, CornerNet, DETR,  # noqa: E402
                                     AutoAssign, DeformableDETR, FSAF, FoveaBox, RepPointsDetector, VFNet, YOLOF, YOLOV3)
from .detectors.sparse_rcnn import SparseRCNN  # noqa: E402
from .detectors.yolact import YOLACT  # noqa: E402
from .detectors.two_stage import (CascadeRCNN, FasterRCNN,  # noqa: E402
                                  MaskRCNN, TwoStageDetector)
from .roi_heads.bbox_head import Shared2FCBBoxHead  # noqa: E402
from .roi_heads.cascade_roi_head import CascadeRoIHead  # noqa: E402
from .roi_heads.mask_head import FCNMaskHead  # noqa: E402
from .roi_heads.dynamic_roi_head import DynamicRoIHead  # noqa: E402
from .roi_heads.standard_roi_head import StandardRoIHead  # noqa: E402
from .roi_heads.pisa_roi_head import PISARoIHead  # noqa: E402
from .roi_heads.mask_scoring_roi_head import MaskIoUHead, MaskScoringRoIHead  # noqa: E402
from .roi_heads.htc_roi_head import (FusedSemanticHead, HTCMaskHead,  # noqa: E402
                                     HybridTaskCascadeRoIHead)
from .roi_heads.scnet_roi_head import GlobalContextHead, SCNetRoIHead  # noqa: E402
from .roi_heads.grid_roi_head import GridHead, GridRoIHead  # noqa: E402
from .roi_heads.point_rend_roi_head import MaskPointHead, PointRendRoIHead  # noqa: E402
from .roi_heads.sabl_roi_head import SABLRoIHead  # noqa: E402
from .roi_heads.bbox_head import DoubleConvFCBBoxHead, SABLHead  # noqa: E402
from .dense_heads.centripetal_head import CentripetalHead  # noqa: E402
from .dense_heads.pisa_retina_head import PISASSDHead  # noqa: E402
from .dense_heads.cascade_rpn_head import CascadeRPNHead, region_assign  # noqa: E402
from .detectors.two_stage import FastRCNN, RPN  # noqa: E402
from .detectors.single_stage import (ATSS, FCOS, GFL, NASFCOS,  # noqa: E402
                                     PAA, CentripetalNet, RetinaNet)
from .detectors.two_stage import (DetectoRS, DoubleHeadRCNN,  # noqa: E402
                                  DynamicRCNN, GridRCNN, HybridTaskCascade,
                                  MaskScoringRCNN, PointRend, SCNet,
                                  TridentFasterRCNN)

__all__ += ["RPNHead", "RepPointsHead", "RepPointsDetector",
            "TwoStageDetector", "FasterRCNN", "CascadeRCNN", "CascadeRoIHead",
            "MaskRCNN", "FCNMaskHead", "SSDHead",
            "Shared2FCBBoxHead", "StandardRoIHead", "PISARoIHead", "DynamicRoIHead", "MaskIoUHead", "MaskScoringRoIHead",
            "HTCMaskHead", "FusedSemanticHead", "HybridTaskCascadeRoIHead",
            "GlobalContextHead", "SCNetRoIHead", "HybridTaskCascade", "SCNet",
            "MaskScoringRCNN", "DynamicRCNN", "DetectoRS",
            "GridHead", "GridRoIHead", "MaskPointHead", "PointRendRoIHead",
            "SABLRoIHead", "DoubleConvFCBBoxHead", "SABLHead",
            "GridRCNN", "PointRend", "DoubleHeadRCNN",
            "CentripetalHead", "CentripetalNet", "FPG", "NASFCOS_FPN",
            "TridentFasterRCNN", "CascadeRPNHead", "region_assign", "RPN", "PISASSDHead",
            "RetinaNet", "FCOS", "ATSS", "GFL", "PAA", "NASFCOS", "FastRCNN"]
