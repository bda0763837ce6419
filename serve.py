"""Inference server (CLI).

Production-serving surface over the micro-batching scheduler
(tdrn_tpu/serving.py): a small stdlib HTTP server where concurrent clients
post JPEG frames for independent video streams and get JSON detections;
temporal state per stream stays resident in its HBM lane between requests.

    POST /detect?stream=<id>&thresh=0.4   body: JPEG bytes -> JSON detections
    POST /reset?stream=<id>               reset a stream's temporal state
    GET  /healthz                         liveness + stats

Example:
    python serve.py --checkpoint weights/ --port 8000 --lanes 8
    curl -X POST --data-binary @frame.jpg "localhost:8000/detect?stream=cam1"
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description="TDRN-TPU inference server")
    ap.add_argument("--dataset", default=None,
                    help="config name; defaults to the checkpoint's meta (else vid_320)")
    ap.add_argument("--backbone", default=None)
    ap.add_argument("--stem", default=None, choices=["conv", "poly", "poly2", "s2d", "fused", "fused2"],
                    help="override the checkpoint's stem (fused = Pallas stage-1)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--lanes", type=int, default=8, help="concurrent stream lanes")
    ap.add_argument("--window_ms", type=float, default=3.0, help="micro-batch window")
    ap.add_argument("--random_init", action="store_true",
                    help="serve an untrained model (smoke testing)")
    ap.add_argument("--precision", default="fp32", choices=["fp32", "bf16", "int8"],
                    help="bf16 = resident-bf16 feature pyramid, fp32 "
                         "heads/detect (utils/precision.py)")
    ap.add_argument("--int8_scales", default=None,
                    help="activation-scales json for --precision int8 "
                         "(from eval.py --precision int8 --save_scales)")
    ap.add_argument("--backbone_norm", default=None, choices=["frozen", "group"],
                    help="resnet norm override (identical param trees restore "
                         "silently into the wrong norm)")
    ap.add_argument("--mode", default="sync", choices=["sync", "threaded"],
                    help="sync: single-threaded HTTP, detect inline on the "
                         "main thread (required on the axon dev tunnel); "
                         "threaded: micro-batched dispatcher + concurrent "
                         "handlers (co-located deployments)")
    return ap.parse_args()


def build_server(args):
    from tdrn_tpu.data import VID_CLASSES, VOC_CLASSES
    from tdrn_tpu.inference import StreamingDetector, load_inference_model
    from tdrn_tpu.serving import InferenceServer

    try:
        model, params, cfg, _, _ = load_inference_model(
            args.checkpoint, dataset=args.dataset, backbone=args.backbone,
            stem=args.stem, precision=args.precision,
            int8_scales=args.int8_scales,
            backbone_norm=args.backbone_norm,
            temporal=True, random_init=args.random_init, dataset_fallback="vid_320",
        )
    except (FileNotFoundError, ValueError) as e:
        raise SystemExit(str(e))
    class_names = VID_CLASSES if cfg.name.startswith("vid") else VOC_CLASSES
    det = StreamingDetector(model, params, num_streams=args.lanes)
    return (
        InferenceServer(
            det, window_ms=args.window_ms, dispatch_thread=(args.mode == "threaded")
        ),
        class_names,
    )


def main():
    import faulthandler, signal

    faulthandler.register(signal.SIGUSR1)
    args = parse_args()
    from tdrn_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache (TDRN_COMPILE_CACHE=0 opts out)
    server, class_names = build_server(args)
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {
                    "ok": True, "steps": server.steps,
                    "frames": server.frames,
                    "prefilter_overflow_frames": server.overflow_frames,
                    "latency": server.latency.snapshot(),
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            stream = q.get("stream", ["default"])[0]
            if url.path == "/reset":
                server.reset_stream(stream)
                self._json(200, {"ok": True})
                return
            if url.path != "/detect":
                self._json(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                self._json(400, {"error": "could not decode image"})
                return
            h, w = img.shape[:2]
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            thresh = float(q.get("thresh", ["0.3"])[0])
            if args.mode == "sync":
                boxes, scores, classes = server.submit_sync(stream, rgb)
            else:
                boxes, scores, classes = server.submit(stream, rgb)
            keep = scores >= thresh
            dets = [
                {
                    "box": [float(v) for v in (b * [w, h, w, h])],
                    "score": float(s),
                    "class": class_names[int(c) - 1],
                }
                for b, s, c in zip(boxes[keep], scores[keep], classes[keep])
            ]
            self._json(200, {"stream": stream, "detections": dets})

    if args.mode == "sync":
        # Single-threaded: handlers run on the main thread; detect is inline.
        httpd = HTTPServer((args.host, args.port), Handler)
        print(f"serving (sync) on {args.host}:{args.port} with {args.lanes} lanes", flush=True)
        try:
            httpd.serve_forever()
        finally:
            server.close()
    else:
        httpd = ThreadingHTTPServer((args.host, args.port), Handler)
        print(f"serving (threaded) on {args.host}:{args.port} with {args.lanes} lanes", flush=True)
        try:
            httpd.serve_forever()
        finally:
            server.close()


if __name__ == "__main__":
    main()
