"""Cross-framework TRAINING-DYNAMICS parity (VERDICT r4 item 1).

The single-snapshot goldens (test_detector_golden / test_point_golden) pin
forward/loss at one point in weight space; these tests pin the *training
trajectory*: the exec'd reference torch stack and our JAX stack start from
IDENTICAL init (torch2jax) and train on an identical deterministic
synthetic tiny-object dataset with identical SGD momentum 0.9 / wd 1e-4 /
linear-warmup step-LR / global-norm grad-clip semantics (reference
apis/train.py:37-176 + mmcv OptimizerHook/StepLrUpdaterHook), then the
held-out AP is computed by the SAME evaluator for both.

Short tests run in CI; the `slow`-marked ones extend the horizon. The
full-scale record (400/300 steps @ 256x320) lives in PARITY.md, produced
by tools/analysis_tools/train_parity.py.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import train_parity_lib as tp  # noqa: E402


def _run_retina(steps, n_train, n_val, hw):
    train = tp.make_tiny_dataset(n_train, hw=hw, seed=0)
    order = tp.batch_order(n_train, 2, steps)
    step_iters = [int(steps * 2 / 3), int(steps * 5 / 6)]
    det = tp.make_torch_retina(seed=0)
    params, stats = tp.torch_state_to_jax(det)
    model = tp.make_jax_retina()
    t_losses = tp.train_torch(det, train, order, step_iters)
    j_losses, state = tp.train_jax(model, params, stats, train, order,
                                   step_iters)
    return det, model, state, t_losses, j_losses


def test_retina_train_parity_short():
    """40 steps of the Adap-flavored RetinaNet: trajectories must track."""
    det, model, state, t_losses, j_losses = _run_retina(
        40, n_train=16, n_val=0, hw=(128, 160))
    st = tp.trajectory_stats(t_losses, j_losses)
    # identical init -> first step must match to float tolerance
    assert st["first_step_rel"] < 1e-4, st
    # trajectories stay locked (measured ~1e-3 drift over 40 CPU steps)
    assert st["mean_rel"] < 0.01, st
    assert st["final_rel"] < 0.02, st


def test_p2p_train_parity_short_and_point_ap():
    """20 steps of the P2P flagship + held-out point-AP equality.

    P2P learns the synthetic scenes fast enough that AP is already
    meaningful (~0.7) after 20 steps, so this short test also covers the
    final-AP axis: both frameworks' AP from the SAME LocationEvaluator.
    """
    res = tp.run_p2p_experiment(steps=20, batch_size=2, n_train=8,
                                n_val=4, hw=(128, 160))
    st = tp.trajectory_stats(res["torch_losses"], res["jax_losses"])
    assert st["first_step_rel"] < 1e-4, st
    assert st["mean_rel"] < 0.01, st
    ap_t, ap_j = res["ap_torch"]["AP"], res["ap_jax"]["AP"]
    assert ap_t > 0.3, f"torch side failed to learn: AP {ap_t}"
    assert abs(ap_t - ap_j) < 0.02, (ap_t, ap_j)


def test_fcos_train_parity_short():
    """20 steps of the Adap-flavored FCOS (anchor-free family): the
    exec'd reference fcos_head.py loss path vs ours, identical init."""
    res = tp.run_fcos_experiment(steps=20, batch_size=2, n_train=8,
                                 n_val=4, hw=(128, 160))
    st = tp.trajectory_stats(res["torch_losses"], res["jax_losses"])
    assert st["first_step_rel"] < 1e-4, st
    assert st["mean_rel"] < 0.01, st
    # measured: trajectories identical to ~1e-7, AP equal to the digit
    assert abs(res["ap_torch"]["AP50_all"]
               - res["ap_jax"]["AP50_all"]) < 0.02


@pytest.mark.slow
def test_retina_train_parity_with_ap():
    """Longer horizon + detection AP from the SAME COCOExpandEval (tiny
    standard) for both frameworks."""
    res = tp.run_retina_experiment(steps=150, batch_size=2, n_train=32,
                                   n_val=8, hw=(192, 256))
    st = tp.trajectory_stats(res["torch_losses"], res["jax_losses"])
    assert st["first_step_rel"] < 1e-4, st
    assert st["mean_rel"] < 0.02, st
    assert st["final_rel"] < 0.05, st
    ap_t = res["ap_torch"]["AP50_all"]
    ap_j = res["ap_jax"]["AP50_all"]
    # final AP within 2 points of each other (north-star asks ~1 point at
    # full scale; the short horizon here is noisier)
    assert abs(ap_t - ap_j) < 0.02 + 1e-9, (ap_t, ap_j)
