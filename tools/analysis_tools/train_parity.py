#!/usr/bin/env python
"""Cross-framework training-dynamics parity experiment (VERDICT r4 item 1).

Trains the exec'd reference torch stack and this framework's JAX stack from
IDENTICAL init on an identical deterministic synthetic tiny-object dataset
(identical SGD/step-LR/grad-clip semantics, reference apis/train.py:37-176)
and reports per-step loss trajectories + held-out AP from the same
evaluator. Models: the Adap-flavored RetinaNet-c and the P2P flagship.

Usage:
  python tools/analysis_tools/train_parity.py retina --steps 400 --out r.json
  python tools/analysis_tools/train_parity.py p2p    --steps 300 --out p.json

Runs on CPU (torch has no TPU here; trajectory parity needs both sides on
the same arithmetic). The harness itself lives in tests/train_parity_lib.py
(it execs reference sources, which is test-only scaffolding).
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

# force the CPU backend BEFORE jax initializes: the axon sitecustomize pins
# JAX_PLATFORMS=axon and its plugin discovery blocks when the TPU tunnel is
# down (same dance as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
for name in [m for m in list(sys.modules) if m.split(".")[0] == "axon"]:
    del sys.modules[name]

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "..", "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["retina", "p2p"])
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-val", type=int, default=16)
    p.add_argument("--hw", type=int, nargs=2, default=[256, 320])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="")
    p.add_argument("--log-every", type=int, default=25)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import train_parity_lib as tp

    run = (tp.run_retina_experiment if args.model == "retina"
           else tp.run_p2p_experiment)
    t0 = time.time()
    res = run(steps=args.steps, batch_size=args.batch,
              n_train=args.n_train, n_val=args.n_val, hw=tuple(args.hw),
              seed=args.seed, log_every=args.log_every)
    st = tp.trajectory_stats(res["torch_losses"], res["jax_losses"])
    out = dict(
        model=args.model, steps=args.steps, batch=args.batch,
        n_train=args.n_train, n_val=args.n_val, hw=list(args.hw),
        stats=st,
        torch_losses=[round(float(x), 6) for x in res["torch_losses"]],
        jax_losses=[round(float(x), 6) for x in res["jax_losses"]],
        ap_torch={k: float(v) for k, v in res["ap_torch"].items()},
        ap_jax={k: float(v) for k, v in res["ap_jax"].items()},
        wall_s=round(time.time() - t0, 1))
    line = json.dumps({k: out[k] for k in
                       ("model", "steps", "stats", "wall_s")})
    print(line)
    key = "AP50_all" if args.model == "retina" else "AP"
    print(f"{key}: torch {out['ap_torch'][key]:.4f} "
          f"jax {out['ap_jax'][key]:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
