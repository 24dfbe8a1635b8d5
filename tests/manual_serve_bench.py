#!/usr/bin/env python
"""Served-throughput harness: HTTP round-trip pairs/sec through cli-serve's
stack (PredictService + batcher + ThreadingHTTPServer), vs bench.py's raw
device number.

Run on TPU:  python tests/manual_serve_bench.py --batch 128 --requests 512
Run on CPU:  python tests/manual_serve_bench.py --platform cpu --hw 64 \
                 --batch 8 --requests 32

Prints one JSON line: {"served_pairs_per_sec": N, ...}. Uses a random-init
full X3D-L (weights don't affect speed); --quantized / --packed A/B the
serving-path knobs end-to-end including PNG codec + HTTP overheads, which is
the honest number a deployment sees.
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--shard", action="store_true",
                    help="spread each served batch over all local devices")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import cv2
    import jax
    import jax.numpy as jnp

    from change3d_tpu.inference import Predictor
    from change3d_tpu.serving import PredictService, make_server
    from change3d_tpu.train.loop import build_model, RunConfig

    cfg = RunConfig(
        task="bcd", num_classes=1, in_height=args.hw, in_width=args.hw,
        packed=args.packed, quantized=args.quantized,
    )
    model = build_model(cfg)
    x = jnp.zeros((1, args.hw, args.hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    predictor = Predictor(model, variables, embed_weights=True, shard=args.shard)

    service = PredictService("bcd", predictor, batch_size=args.batch, max_delay_ms=20)
    httpd = make_server(service, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/predict"

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (args.hw, args.hw, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    body = json.dumps({"pre": base64.b64encode(buf.tobytes()).decode(),
                       "post": base64.b64encode(buf.tobytes()).decode()}).encode()

    def call(_):
        req = urllib.request.Request(
            url, body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200

    # Warmup: fill one batch so compile happens outside the timed window.
    with concurrent.futures.ThreadPoolExecutor(args.clients) as pool:
        list(pool.map(call, range(args.batch)))
        t0 = time.perf_counter()
        list(pool.map(call, range(args.requests)))
        dt = time.perf_counter() - t0

    httpd.shutdown()
    service.close()
    print(json.dumps({
        "served_pairs_per_sec": round(args.requests / dt, 2),
        "hw": args.hw, "batch": args.batch, "requests": args.requests,
        "clients": args.clients, "packed": args.packed,
        "quantized": args.quantized, "shard": args.shard,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
