#!/usr/bin/env python
"""Video detection demo.

Parity target: TOV_mmdetection/demo/video_demo.py — per-frame
inference_detector over an OpenCV VideoCapture, rendered back into an
output video (or shown live with --show).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("video")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out", default=None, help="output video file")
    p.add_argument("--show", action="store_true")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--wait-time", type=float, default=1)
    args = p.parse_args()

    import cv2
    import numpy as np

    from pointtinybenchmark_tpu.apis import (inference_detector,
                                             init_detector, show_result)

    handle = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    assert cap.isOpened(), f"cannot open {args.video}"
    writer = None
    if args.out:
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(args.out, fourcc, fps, (w, h))

    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        result = inference_detector(handle, rgb.astype(np.float32))
        drawn = show_result(rgb, result, classes=handle.classes,
                            score_thr=args.score_thr)
        drawn_bgr = cv2.cvtColor(np.asarray(drawn), cv2.COLOR_RGB2BGR)
        if writer is not None:
            writer.write(drawn_bgr)
        if args.show:
            cv2.imshow("video_demo", drawn_bgr)
            if cv2.waitKey(int(args.wait_time)) & 0xFF == 27:
                break
    cap.release()
    if writer is not None:
        writer.release()
    if args.show:
        cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
