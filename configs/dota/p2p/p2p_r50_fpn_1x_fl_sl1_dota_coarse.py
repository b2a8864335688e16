# P2P on DOTA, trained on coarse noise points (pseudo 16x16 boxes) —
# the realistic point-supervision setting.
# Parity: TOV_mmdetection/configs2/DOTA/p2p/p2p_r50_fpn_1x_fl_sl1_DOTA_coarse.py
_base_ = ["./p2p_r50_fpn_1x_fl_sl1_dota_center.py"]

data_root = "data/dota/"
data = dict(
    train=dict(
        ann_file=(data_root + "DOTA-split/trainsplit/"
                  "noise_rg-0-0-0.25-0.25_1/pseuw16h16/"
                  "DOTA_train_1024_coarse.json")),
)
evaluation = dict(interval=3, do_first_eval=False)
