# P2P on TinyPersonV2, half schedule.
# Parity: TOV_mmdetection/configs2/TinyPersonV2/p2p/
# p2p_r50_fpns4_0.5x_fl_sl1_TinyPersonV2_640.py
_base_ = ["./p2p_r50_fpns4_1x_fl_sl1_tinypersonv2_640.py"]

lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=0.001, step=[4, 5])
runner = dict(type="EpochBasedRunner", max_epochs=6)
