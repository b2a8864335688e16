# Hybrid Task Cascade. Parity: reference configs/htc/htc_r50_fpn_1x_coco.py
_base_ = ["./cascade_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_instance.py"]
model = dict(
    type="HybridTaskCascade",
    roi_head=dict(
        type="HybridTaskCascadeRoIHead",
        interleaved=True, mask_info_flow=True,
        mask_head=dict(type="HTCMaskHead", num_convs=4, in_channels=256,
                       conv_out_channels=256, num_classes=80),
        semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                           fusion_level=1, num_convs=4, in_channels=256,
                           conv_out_channels=256, num_classes=183),
        semantic_roi_extractor=dict(out_channels=256, featmap_strides=[8]),
        semantic_fusion=("bbox", "mask")))
