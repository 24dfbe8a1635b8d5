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
    ap.add_argument("--max_delay_ms", type=float, default=100.0,
                    help="batcher straggler wait; throughput mode wants "
                         "enough for the client fleet to refill a batch")
    ap.add_argument("--bulk", type=int, default=0,
                    help="pairs per request over the raw wire (X-Count bulk "
                         "mode; 0 = one pair per request). --requests then "
                         "counts PAIRS. Amortizes the per-request host CPU "
                         "that caps few-core hosts")
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
    if args.bulk and (args.wire != "raw" or args.tiled):
        ap.error("--bulk is the raw wire's X-Count mode (no --tiled)")
    if args.clients is None:
        args.clients = (4 if args.tiled else
                        max(1, min(8, args.requests // max(1, args.bulk)))
                        if args.bulk else max(args.batch, 64))

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
        "bcd", predictor, batch_size=args.batch,
        max_delay_ms=args.max_delay_ms, tiled=args.tiled,
    )
    httpd = make_server(service, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]

    rng = np.random.RandomState(0)
    side = args.scene if args.tiled else args.hw
    img = rng.randint(0, 255, (side, side, 3), np.uint8)
    if args.bulk:
        # A rotation of distinct blocks so no two in-flight device batches
        # are byte-identical (the relay dedupes identical dispatches).
        bodies = [
            rng.randint(0, 255, (args.bulk, 2, side, side, 3), np.uint8
                        ).tobytes()
            for _ in range(4)
        ]
        headers = {
            "Content-Type": "application/octet-stream",
            "Accept": "application/octet-stream",
            "X-Height": str(side),
            "X-Width": str(side),
            "X-Count": str(args.bulk),
        }
    elif args.wire == "raw":
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

    # Each client thread keeps ONE persistent HTTP/1.1 connection (the
    # server speaks keep-alive) and issues its share of requests over it —
    # per-request TCP + handler-thread churn otherwise starves the batcher
    # on small hosts.
    def run_clients(total):
        import http.client

        shares = [total // args.clients] * args.clients
        for i in range(total % args.clients):
            shares[i] += 1

        def worker(wi_n):
            wi, n = wi_n
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            try:
                for j in range(n):
                    b = bodies[(wi + j) % len(bodies)] if args.bulk else body
                    conn.request("POST", "/v1/predict", b, headers)
                    r = conn.getresponse()
                    assert r.status == 200, r.status
                    r.read()
            finally:
                conn.close()

        with concurrent.futures.ThreadPoolExecutor(args.clients) as pool:
            list(pool.map(worker, [(i, s) for i, s in enumerate(shares) if s]))

    # Warmup: fill one batch (one scene when tiled) so compile happens
    # outside the timed window; reset the stats window after it so the
    # reported percentiles cover exactly the timed requests. In bulk mode
    # --requests counts pairs; each HTTP request carries --bulk of them.
    nreq = -(-args.requests // args.bulk) if args.bulk else args.requests
    pairs = nreq * args.bulk if args.bulk else args.requests
    run_clients(1 if (args.tiled or args.bulk) else args.batch)
    service.stats.reset()
    t0 = time.perf_counter()
    run_clients(nreq)
    dt = time.perf_counter() - t0

    snap = service.stats.snapshot()
    httpd.shutdown()
    service.close()
    rec = {
        "served_pairs_per_sec": round(pairs / dt, 2),
        "hw": args.hw, "batch": args.batch, "requests": nreq,
        "clients": args.clients, "packed": args.packed,
        "quantized": args.quantized, "shard": args.shard,
        "artifact": args.artifact, "tiled": args.tiled, "wire": args.wire,
        "bulk": args.bulk, "max_delay_ms": args.max_delay_ms,
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
