# Mask R-CNN R50-FPN 1x. Parity: reference
# configs/mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/coco_instance.py"]
model = dict(
    type="MaskRCNN",
    roi_head=dict(
        mask_roi_extractor=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=14,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(type="FCNMaskHead", num_convs=4, in_channels=256,
                       conv_out_channels=256, num_classes=80)))
