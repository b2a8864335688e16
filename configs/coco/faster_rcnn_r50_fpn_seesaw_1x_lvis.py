# Seesaw-loss classifier on LVIS. Parity: reference configs/seesaw_loss/
# mask_rcnn_r50_fpn_random_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.py
# (box pathway)
_base_ = ["./faster_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/lvis_v1_instance.py"]
model = dict(roi_head=dict(bbox_head=dict(
    num_classes=1203,
    loss_cls=dict(_delete_=True, type="SeesawLoss", p=0.8, q=2.0,
                  num_classes=1203))))
