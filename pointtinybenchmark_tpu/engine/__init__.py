from .checkpoint import (latest_checkpoint, load_checkpoint,
                         load_checkpoint_any, save_checkpoint,
                         save_checkpoint_any)
from .optimizer import build_lr_schedule, build_optimizer
from .test import (merge_tile_dets, run_refine_test, run_test,
                   run_tiled_test, run_tta_test)
from .train import init_model, make_train_step, train_detector

__all__ = [
    "train_detector", "make_train_step", "init_model", "run_test",
    "run_tiled_test", "run_tta_test", "run_refine_test",
    "merge_tile_dets", "build_optimizer",
    "build_lr_schedule", "save_checkpoint", "load_checkpoint",
    "save_checkpoint_any", "load_checkpoint_any",
    "latest_checkpoint",
]
