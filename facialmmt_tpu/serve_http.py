"""JSON-over-HTTP front-end for the serving stack (stdlib only).

The reference has no serving story (SURVEY.md §2 has no serving row); this
module makes the framework's serving path *deployable*: one process exposes
the pre-compiled static-shape executables behind a threaded HTTP endpoint.
Request threads submit to one shared AsyncBatchServer (optionally a bucket
ROUTER over several EmotionServers — serving.py) and block on their future,
so concurrency comes from the thread pool and batching from the packer; the
TPU never sees a dynamic shape.

Endpoints:
  POST /predict  — body: JSON object with optional keys
                     "audio":   list[La][audio_feat_dim] floats
                     "vision":  list[Lv][vision_feat_dim] floats
                     "faces":   base64 of raw uint8 H*W*3 frames ("faces_shape"
                                [n, H, W, 3] required) OR a nested list
                     "input_ids", "sep_mask", "utt_in_dia_idx": token channel
                   reply: {"probs": [...], "label": int}
  GET  /healthz  — {"ok": true, "buckets": [[max_batch, face_capacity], ...]}
  GET  /stats    — packer telemetry {n_packs, mean_fill, bucket_counts}

Run: python -m facialmmt_tpu.serve_http --port 8756 [--buckets 1,12 8,64]
(tiny demo weights unless --checkpoint points at an orbax save).
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _decode_request(payload: Dict[str, Any]) -> Dict[str, Any]:
    """JSON body -> the request dict EmotionServer.build_pack understands."""
    req: Dict[str, Any] = {}
    if "audio" in payload:
        req["audio"] = np.asarray(payload["audio"], np.float32)
    if "vision" in payload:
        req["vision"] = np.asarray(payload["vision"], np.float32)
    if "faces" in payload:
        faces = payload["faces"]
        if isinstance(faces, str):  # base64 raw uint8, shape alongside
            shape = tuple(payload["faces_shape"])
            buf = base64.b64decode(faces)
            req["faces"] = np.frombuffer(buf, np.uint8).reshape(shape)
        else:
            req["faces"] = np.asarray(faces, np.uint8)
    if "input_ids" in payload:
        req["input_ids"] = np.asarray(payload["input_ids"], np.int32)
        if "sep_mask" in payload:
            req["sep_mask"] = np.asarray(payload["sep_mask"], np.int32)
        req["utt_in_dia_idx"] = int(payload.get("utt_in_dia_idx", 0))
    return req


class ServingApp:
    """Owns the front-end and translates HTTP bodies to packer requests."""

    def __init__(self, front) -> None:
        self.front = front  # AsyncBatchServer (single bucket or router)

    def predict(self, payload: Dict[str, Any],
                timeout_s: float = 60.0) -> Dict[str, Any]:
        probs = self.front.submit(_decode_request(payload)).result(
            timeout=timeout_s)
        return {"probs": [float(p) for p in probs],
                "label": int(np.argmax(probs))}

    def healthz(self) -> Dict[str, Any]:
        return {"ok": True,
                "buckets": [[s.max_batch, s.face_capacity]
                            for s in self.front.servers]}

    def stats(self) -> Dict[str, Any]:
        from collections import Counter

        fills = self.front.pack_sizes
        return {"n_packs": len(fills),
                "mean_fill": float(np.mean(fills)) if fills else 0.0,
                "bucket_counts": {f"{mb},{cap}": n for (mb, cap), n in sorted(
                    Counter(self.front.bucket_choices).items())}}


def make_handler(app: ServingApp):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: Dict[str, Any]) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._reply(200, app.healthz())
            elif self.path == "/stats":
                self._reply(200, app.stats())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                code, obj = 200, app.predict(payload)
            except Exception as e:  # surface as a 400, keep serving
                code, obj = 400, {"error": f"{type(e).__name__}: {e}"}
            try:  # reply OUTSIDE the handler try: a client that hung up
                self._reply(code, obj)  # mid-write must not trigger a second
            except (BrokenPipeError, ConnectionResetError):  # status line
                pass

        def log_message(self, fmt, *args):  # quiet: telemetry via /stats
            pass

    return Handler


def serve(front, host: str = "127.0.0.1", port: int = 8756,
          block: bool = True) -> Tuple[ThreadingHTTPServer, ServingApp]:
    """Start the HTTP front over an AsyncBatchServer.  block=False runs the
    server on a daemon thread and returns (server, app) — shutdown with
    server.shutdown() — which is also the in-process test hook."""
    app = ServingApp(front)
    httpd = ThreadingHTTPServer((host, port), make_handler(app))
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, app


def load_serving_variables(variables: Dict[str, Any],
                           checkpoint_dir: str) -> Dict[str, Any]:
    """Graft the best checkpoint under `checkpoint_dir` onto init-shaped
    `variables`.  Template-free restore: multimodal-trainer bests store
    {params, batch_stats} (trainer.py run_multimodal save_best — Swin's head
    BatchNorm statistics live in batch_stats, and serving random-init stats
    would corrupt every probability) while text/dialogue bests store {params}
    only — graft whatever is present."""
    from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager

    restored = CheckpointManager(checkpoint_dir).restore_best()
    variables = dict(variables, params=restored["params"])
    if "batch_stats" in restored:
        variables["batch_stats"] = restored["batch_stats"]
    return variables


def _build_front(cfg, variables, buckets: Sequence[Tuple[int, int]],
                 batch_deadline_ms: float):
    from facialmmt_tpu.serving import AsyncBatchServer, EmotionServer

    servers = [EmotionServer(cfg, variables, max_batch=mb, face_capacity=cap)
               for mb, cap in buckets]
    return AsyncBatchServer(servers if len(servers) > 1 else servers[0],
                            batch_deadline_ms=batch_deadline_ms)


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    import jax

    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.models.pipeline import FacialMMTPipeline

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8756)
    ap.add_argument("--buckets", nargs="+", default=["1,12", "8,64"],
                    help="max_batch,face_capacity per bucket; several = router")
    ap.add_argument("--batch_deadline_ms", type=float, default=5.0)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint dir with the pipeline variables "
                         "(omitted: fresh random weights — demo mode)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU-friendly smoke deployment)")
    args = ap.parse_args(argv)

    cfg = FacialMMTConfig.tiny() if args.tiny else FacialMMTConfig()
    model = FacialMMTPipeline(cfg)
    d = cfg.data
    batch = {  # init-template shapes (tests/test_models.py batch layout)
        "dia_input_ids": np.ones((2, d.max_seq_length), np.int32),
        "dia_input_mask": np.ones((2, d.max_seq_length), np.int32),
        "dia_sep_mask": np.zeros((2, d.max_seq_length), np.int32),
        "dia_idx": np.arange(2, dtype=np.int32),
        "utt_in_dia_idx": np.zeros(2, np.int32),
        "audio_inputs": np.zeros((2, d.audio_utt_max_len, d.audio_feat_dim),
                                 np.float32),
        "audio_mask": np.ones((2, d.audio_utt_max_len), np.int32),
        "vision_feats": np.zeros((2, d.vision_utt_max_len, d.vision_feat_dim),
                                 np.float32),
        "n_faces": np.zeros(2, np.int32),
        "face_utt_id": np.full(8, -1, np.int32),
        "face_pos": np.zeros(8, np.int32),
        "faces": np.zeros((8, d.swin_img_size, d.swin_img_size, 3),
                          np.float32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        batch)
    if args.checkpoint:
        variables = load_serving_variables(variables, args.checkpoint)

    buckets = [tuple(int(x) for x in b.split(",")) for b in args.buckets]
    front = _build_front(cfg, variables, buckets, args.batch_deadline_ms)
    print(f"serving on http://{args.host}:{args.port} buckets={buckets}",
          flush=True)
    serve(front, args.host, args.port, block=True)


if __name__ == "__main__":
    main()
