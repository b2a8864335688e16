# SSD-Det (spatial self-distillation for noisy-box supervision) on COCO.
# PAPER-SPEC (arXiv 2307.12101): the reference repo hosts SSD-Det on a
# separate branch that is not in this checkout. Same refinement workflow
# as P2BNet with the stage-0 bag built around the NOISY annotated box:
# train this model on noisy boxes -> refine_test emits refined boxes ->
# tools/result2ann.py -> retrain a clean Faster R-CNN.
_base_ = ["../p2b/p2bnet_r50_fpn_1x_coco.py"]

data = dict(
    # noisy-box supervision: boxes jittered up to 40% of their size
    # (the SSD-Det benchmark protocol), no pseudo_wh substitution
    train=dict(noise_kwargs=dict(noise_rg=0.4)),
    val=dict(noise_kwargs=dict(noise_rg=0.4)),
    test=dict(noise_kwargs=dict(noise_rg=0.4)),
)

model = dict(
    type="SSDDet",
    bbox_head=dict(
        _delete_=True,
        type="SSDDetHead",
        num_classes=80, in_channels=256, fc_channels=1024, roi_size=7,
        featmap_strides=[4, 8, 16, 32],
        # stage-0 SPSD bag: scale x offset jitter around the noisy box
        box_bag_scale_jitter=[0.5, 0.7, 1.0, 1.4, 2.0],
        box_bag_offset_frac=[-0.3, 0.0, 0.3],
        # one cascaded refinement round on top of the stage-0 selection
        pbr_scale_jitter=[0.8, 1.0, 1.2],
        pbr_offset_frac=[-0.2, 0.0, 0.2],
        pbr_stages=1,
        merge_topk=4,
        neg_iou_thr=0.3,
        loss_mil=dict(type="MILLoss", binary_ins=False, loss_weight=0.25),
        neg_loss_weight=0.75),
)
