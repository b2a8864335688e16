#!/usr/bin/env python
"""Serve an exported StableHLO detector over HTTP (or a stdin loop).

Parity target: the reference's TorchServe deployment
(TOV_mmdetection/tools/deployment/mmdet2torchserve.py:1 +
mmdet_handler.py:1 — package model, serve `POST /predictions/<name>` with
image bytes in, JSON detections out). Here the serving artifact is the
`jax.export` StableHLO blob written by export_model.py; this harness is
the request loop around it:

  python tools/deployment/serve.py model.stablehlo --port 8080
  curl -s -T demo.jpg http://localhost:8080/predict | python -m json.tool

Endpoints:
  GET  /health            -> {"status": "ok"}
  POST /predict           -> body: raw image bytes (any PIL format) or
                             JSON {"image": <base64>}; response: JSON
                             {"detections": [{bbox, score, label}, ...]}

--stdin mode reads image paths line-by-line and prints one JSON line per
image — the scripting-friendly equivalent of the handler's batch mode.

Preprocessing matches the protocol pipelines: resize keep-ratio into the
artifact's static (H, W), ImageNet normalize (override with --mean/--std),
zero-pad; boxes are mapped back to original pixels via the scale factor.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


class Predictor:
    def __init__(self, artifact_path: str, mean, std):
        from jax import export as jexport
        with open(artifact_path, "rb") as f:
            self.exported = jexport.deserialize(bytearray(f.read()))
        aval = self.exported.in_avals[0]
        self.batch, self.height, self.width = aval.shape[:3]
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def preprocess(self, img: np.ndarray):
        """RGB uint8 (h, w, 3) -> padded normalized batch + scale factor."""
        h, w = img.shape[:2]
        scale = min(self.height / h, self.width / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        try:
            from PIL import Image
            im = Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
            resized = np.asarray(im)
        except ImportError:  # nearest-neighbor fallback
            yi = (np.arange(nh) / scale).astype(int).clip(0, h - 1)
            xi = (np.arange(nw) / scale).astype(int).clip(0, w - 1)
            resized = img[yi][:, xi]
        out = np.zeros((self.batch, self.height, self.width, 3), np.float32)
        out[0, :nh, :nw] = (resized.astype(np.float32) - self.mean) / self.std
        shape = np.tile(np.asarray([[nh, nw]], np.int32), (self.batch, 1))
        return out, shape, scale

    def __call__(self, img: np.ndarray, score_thr: float = 0.05):
        batch, shapes, scale = self.preprocess(img)
        leaves = self.exported.call(batch, shapes)
        # serving signature: flat leaves (bboxes (B,N,5), labels, valid[,...])
        bboxes, labels, valid = (np.asarray(leaves[0]),
                                 np.asarray(leaves[1]),
                                 np.asarray(leaves[2]))
        dets = []
        for box, lab, ok in zip(bboxes[0], labels[0], valid[0]):
            if not ok or box[4] < score_thr:
                continue
            dets.append(dict(
                bbox=[float(v / scale) for v in box[:4]],
                score=float(box[4]),
                label=int(lab)))
        dets.sort(key=lambda d: -d["score"])
        return dets


def _decode_image(body: bytes) -> np.ndarray:
    if body[:1] in (b"{", b"["):                      # JSON envelope
        payload = json.loads(body)
        if isinstance(payload, dict) and "image" in payload:
            body = base64.b64decode(payload["image"])
        else:                                         # nested list array
            return np.asarray(payload, np.uint8)
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))


def make_handler(predictor: Predictor, score_thr: float):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/health"):
                self._send(200, dict(status="ok",
                                     input=[predictor.height,
                                            predictor.width]))
            else:
                self._send(404, dict(error="unknown path"))

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._send(404, dict(error="unknown path"))
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                img = _decode_image(self.rfile.read(n))
                dets = predictor(img, score_thr)
                self._send(200, dict(detections=dets))
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._send(400, dict(error=str(e)))

        # PUT (curl -T) behaves like POST for convenience
        do_PUT = do_POST

        def log_message(self, *a):
            pass

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("artifact", help="StableHLO blob from export_model.py")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--score-thr", type=float, default=0.05)
    p.add_argument("--mean", type=float, nargs=3,
                   default=[123.675, 116.28, 103.53])
    p.add_argument("--std", type=float, nargs=3,
                   default=[58.395, 57.12, 57.375])
    p.add_argument("--stdin", action="store_true",
                   help="read image paths from stdin, one JSON line each")
    args = p.parse_args()

    predictor = Predictor(args.artifact, args.mean, args.std)
    if args.stdin:
        from PIL import Image
        for line in sys.stdin:
            path = line.strip()
            if not path:
                continue
            img = np.asarray(Image.open(path).convert("RGB"))
            print(json.dumps(dict(
                file=path, detections=predictor(img, args.score_thr))))
        return

    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(predictor, args.score_thr))
    print(f"serving {args.artifact} on http://{args.host}:{args.port} "
          f"(input {predictor.height}x{predictor.width})")
    server.serve_forever()


if __name__ == "__main__":
    main()
