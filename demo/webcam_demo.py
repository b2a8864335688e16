#!/usr/bin/env python
"""Webcam detection demo.

Parity target: TOV_mmdetection/demo/webcam_demo.py — live per-frame
inference over cv2.VideoCapture(camera_id).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import cv2
    import numpy as np

    from pointtinybenchmark_tpu.apis import (inference_detector,
                                             init_detector, show_result)

    handle = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.camera_id)
    assert cap.isOpened(), f"cannot open camera {args.camera_id}"
    print("Press ESC or q to quit.")
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        result = inference_detector(handle, rgb.astype(np.float32))
        drawn = show_result(rgb, result, classes=handle.classes,
                            score_thr=args.score_thr)
        cv2.imshow("webcam_demo",
                   cv2.cvtColor(np.asarray(drawn), cv2.COLOR_RGB2BGR))
        k = cv2.waitKey(1) & 0xFF
        if k in (27, ord("q")):
            break
    cap.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
