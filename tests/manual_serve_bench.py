#!/usr/bin/env python
"""Served-throughput harness: HTTP round-trip pairs/sec through cli-serve's
stack (PredictService + batcher + ThreadingHTTPServer), vs bench.py's raw
device number.

Run on TPU:  python tests/manual_serve_bench.py --batch 128 --requests 1024
Run on CPU:  python tests/manual_serve_bench.py --platform cpu --hw 64 \
                 --batch 8 --requests 32

Modes (the deployment matrix BENCH_SERVE.json records):
  (plain)      checkpoint-backed live Predictor, embedded weights, uint8
               device fast path — the production config
  --shard      spread each served batch over all local devices
  --artifact   AOT StableHLO artifact (cli export) pinned at --batch,
               served via ArtifactPredictor (float host path — the
               artifact's forward is baked)
  --tiled      native-resolution scenes (--scene px) through TiledPredictor;
               reports scenes/sec AND the equivalent 256-tile pairs/sec

Prints one JSON line: {"served_pairs_per_sec": N, "latency_s": {...}, ...}.
Latency percentiles come from the service's own /metrics window, reset
after warmup so they cover exactly the timed requests. Uses a random-init
full X3D-L (weights don't affect speed); --quantized / --packed A/B the
serving-path knobs end-to-end including PNG codec + HTTP overheads, which is
the honest number a deployment sees.

Clients default to the batch size so the batcher can actually fill batches
(64 clients against batch 128 halves every batch and the measured rate).
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
    ap.add_argument("--clients", type=int, default=None,
                    help="concurrent HTTP clients (default: max(batch, 64); "
                         "tiled mode defaults to 4)")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--shard", action="store_true",
                    help="spread each served batch over all local devices")
    ap.add_argument("--artifact", action="store_true",
                    help="serve an AOT StableHLO artifact exported at --batch")
    ap.add_argument("--tiled", action="store_true",
                    help="serve native-size scenes through TiledPredictor")
    ap.add_argument("--scene", type=int, default=1024,
                    help="scene side in px for --tiled (square)")
    ap.add_argument("--wire", choices=["json", "raw"], default="json",
                    help="json = base64-PNG JSON bodies (the compatible "
                         "default); raw = the codec-free octet-stream "
                         "protocol (the production fast path — on few-core "
                         "hosts the JSON wire is codec-bound, not "
                         "device-bound)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()
    if args.artifact and (args.shard or args.tiled):
        ap.error("--artifact serves a baked single-device program "
                 "(no --shard/--tiled)")
    if args.clients is None:
        args.clients = 4 if args.tiled else max(args.batch, 64)

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
    if args.artifact:
        from change3d_tpu.export import export_model
        from change3d_tpu.inference import ArtifactPredictor

        blob = export_model(model, variables, batch=args.batch)
        predictor = ArtifactPredictor(blob)
    else:
        predictor = Predictor(model, variables, embed_weights=True,
                              shard=args.shard)

    service = PredictService(
        "bcd", predictor, batch_size=args.batch, max_delay_ms=20,
        tiled=args.tiled,
    )
    httpd = make_server(service, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/predict"

    rng = np.random.RandomState(0)
    side = args.scene if args.tiled else args.hw
    img = rng.randint(0, 255, (side, side, 3), np.uint8)
    if args.wire == "raw":
        body = img.tobytes() * 2  # pre then post (random data; order moot)
        headers = {
            "Content-Type": "application/octet-stream",
            "Accept": "application/octet-stream",
            "X-Height": str(side),
            "X-Width": str(side),
        }
    else:
        ok, buf = cv2.imencode(".png", img)
        assert ok
        body = json.dumps({"pre": base64.b64encode(buf.tobytes()).decode(),
                           "post": base64.b64encode(buf.tobytes()).decode()}).encode()
        headers = {"Content-Type": "application/json"}

    def call(_):
        req = urllib.request.Request(url, body, headers=headers)
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            r.read()

    # Warmup: fill one batch (one scene when tiled) so compile happens
    # outside the timed window; reset the stats window after it so the
    # reported percentiles cover exactly the timed requests.
    warm = 1 if args.tiled else args.batch
    with concurrent.futures.ThreadPoolExecutor(args.clients) as pool:
        list(pool.map(call, range(warm)))
        service.stats.reset()
        t0 = time.perf_counter()
        list(pool.map(call, range(args.requests)))
        dt = time.perf_counter() - t0

    snap = service.stats.snapshot()
    httpd.shutdown()
    service.close()
    rec = {
        "served_pairs_per_sec": round(args.requests / dt, 2),
        "hw": args.hw, "batch": args.batch, "requests": args.requests,
        "clients": args.clients, "packed": args.packed,
        "quantized": args.quantized, "shard": args.shard,
        "artifact": args.artifact, "tiled": args.tiled, "wire": args.wire,
        "latency_s": snap["latency_s"],
        "mean_batch_fill": snap["mean_batch_fill"],
        "errors_total": snap["errors_total"],
    }
    if args.tiled:
        # Scenes/s plus the 256^2-pair equivalent for comparison with the
        # batched rows (a SxS scene covers (S/256)^2 non-overlapping tiles).
        rec["scene_px"] = args.scene
        rec["scenes_per_sec"] = rec.pop("served_pairs_per_sec")
        eq = (args.scene / 256.0) ** 2
        rec["equiv_256_pairs_per_sec"] = round(rec["scenes_per_sec"] * eq, 2)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
