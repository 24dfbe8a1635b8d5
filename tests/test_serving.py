"""HTTP batching prediction service (change3d_tpu/serving.py + cli serve).

The reference has no serving path at all (inference exists only inside its
validation loops, ref: /root/reference/scripts/train_BCD.py:92-154); this is
the deployment-facing component of the TPU build.
"""

import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from change3d_tpu.inference import Predictor
from change3d_tpu.models.trainer import Change3D, Task
from change3d_tpu.models.x3d import X3DConfig
from change3d_tpu.serving import (
    PredictService,
    _Batcher,
    decode_image,
    encode_mask,
    make_server,
)

cv2 = pytest.importorskip("cv2")

TINY_CFG = X3DConfig(
    stem_dim_out=8,
    stage_dims=(8, 16, 24, 32),
    stage_inner_dims=(18, 36, 54, 72),
    stage_depths=(1, 1, 2, 1),
    head_dim_out=64,
    num_classes=10,
)
HW = 32


# ---------------------------------------------------------------------------
# batcher
# ---------------------------------------------------------------------------

def test_batcher_pads_and_batches():
    calls = []

    def predict_batch(pre, post):
        calls.append(pre.shape[0])
        assert pre.shape[0] == 4  # always padded to the fixed batch
        return {"m": pre.sum(axis=(1, 2, 3))}

    b = _Batcher(predict_batch, batch_size=4, max_delay=0.05)
    xs = [np.full((2, 2, 3), i, np.float32) for i in range(3)]
    results = [None] * 3

    def submit(i):
        results[i] = b.submit(xs[i], xs[i])

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    # Each request got ITS OWN row back regardless of batch order/padding.
    for i in range(3):
        np.testing.assert_allclose(results[i]["m"], xs[i].sum())
    assert all(c == 4 for c in calls)


def test_batcher_buckets_pad_to_smallest_fit():
    """A partial group pads to the smallest compiled bucket, not the max
    batch — the transfer/compute tax tracks actual load."""
    seen = []

    def predict_batch(pre, post):
        seen.append(pre.shape[0])
        return {"m": pre.sum(axis=(1, 2, 3))}

    b = _Batcher(predict_batch, batch_size=8, max_delay=0.05, buckets=(2, 4, 8))
    xs = [np.full((2, 2, 3), i, np.float32) for i in range(3)]
    results = [None] * 3
    threads = [
        threading.Thread(target=lambda i=i: results.__setitem__(
            i, b.submit(xs[i], xs[i])))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    for i in range(3):
        np.testing.assert_allclose(results[i]["m"], xs[i].sum())
    # 3 concurrent requests -> one bucket-4 dispatch (or a 2+2/2+1 split
    # under scheduling jitter) — never a full 8.
    assert seen and all(s in (2, 4) for s in seen)

    with pytest.raises(ValueError, match="must equal batch_size"):
        _Batcher(predict_batch, batch_size=8, max_delay=0.01, buckets=(2, 4))


def test_service_bucket_defaults(bcd_predictor):
    svc = PredictService("bcd", bcd_predictor, batch_size=16, max_delay_ms=1)
    assert svc.buckets == (4, 8, 16)
    svc.close()
    svc = PredictService("bcd", bcd_predictor, batch_size=16, max_delay_ms=1,
                         buckets=(8, 16))
    assert svc.buckets == (8, 16)
    svc.close()
    with pytest.raises(ValueError, match="include batch_size"):
        PredictService("bcd", bcd_predictor, batch_size=16, buckets=(4, 8))


def test_batcher_propagates_errors_and_rejects_after_close():
    def predict_batch(pre, post):
        raise RuntimeError("device on fire")

    b = _Batcher(predict_batch, batch_size=2, max_delay=0.01)
    with pytest.raises(RuntimeError, match="device on fire"):
        b.submit(np.zeros((2, 2, 3)), np.zeros((2, 2, 3)))
    b.close()
    with pytest.raises(RuntimeError, match="shut down"):
        b.submit(np.zeros((2, 2, 3)), np.zeros((2, 2, 3)))


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def test_image_codec_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (16, 20, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    b64 = base64.b64encode(buf.tobytes()).decode()
    got_bgr = decode_image(b64, to_rgb=False)
    np.testing.assert_array_equal(got_bgr, img)
    got_rgb = decode_image(b64, to_rgb=True)
    np.testing.assert_array_equal(got_rgb, img[:, :, ::-1])

    mask = rng.randint(0, 2, (16, 20), np.uint8) * 255
    rt = cv2.imdecode(
        np.frombuffer(base64.b64decode(encode_mask(mask)), np.uint8),
        cv2.IMREAD_UNCHANGED,
    )
    np.testing.assert_array_equal(rt, mask)


# ---------------------------------------------------------------------------
# end to end over HTTP
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bcd_predictor():
    model = Change3D(task=Task.BCD, num_classes=1, in_height=HW, in_width=HW,
                     backbone_cfg=TINY_CFG)
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    return Predictor(model, variables, compute_dtype=jnp.float32)


def _start(service):
    httpd = make_server(service, host="127.0.0.1", port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


def _post(url, payload, expect=200):
    req = urllib.request.Request(
        url + "/v1/predict", json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _png64(img):
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def test_http_serving_matches_direct_predictor(bcd_predictor):
    service = PredictService("bcd", bcd_predictor, batch_size=4, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        with urllib.request.urlopen(url + "/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["input_hw"] == [HW, HW]

        rng = np.random.RandomState(1)
        imgs = [
            (rng.randint(0, 255, (HW, HW, 3), np.uint8),
             rng.randint(0, 255, (HW, HW, 3), np.uint8))
            for _ in range(5)
        ]
        # Concurrent requests exercise the batching path.
        codes, bodies = [None] * 5, [None] * 5

        def call(i):
            codes[i], bodies[i] = _post(
                url, {"pre": _png64(imgs[i][0]), "post": _png64(imgs[i][1])}
            )

        threads = [threading.Thread(target=call, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert codes == [200] * 5

        for i in range(5):
            mask = cv2.imdecode(
                np.frombuffer(base64.b64decode(bodies[i]["change"]), np.uint8),
                cv2.IMREAD_UNCHANGED,
            )
            pre = ((imgs[i][0][:, :, ::-1].astype(np.float32) / 255.0) - 0.5) / 0.5
            post = ((imgs[i][1][:, :, ::-1].astype(np.float32) / 255.0) - 0.5) / 0.5
            expect = bcd_predictor.predict(pre[None], post[None])["change"][0]
            np.testing.assert_array_equal(mask > 0, expect)
    finally:
        httpd.shutdown()
        service.close()


def test_predict_client_roundtrip(bcd_predictor, tmp_path):
    """PredictClient (change3d_tpu/client.py) against a live server: array
    and file-path inputs, health/metrics, and server-reason errors."""
    from change3d_tpu.client import PredictClient

    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        client = PredictClient(url)
        assert client.health()["task"] == "bcd"

        rng = np.random.RandomState(6)
        pre = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        post = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        out = client.predict(pre, post)
        assert out["change"].shape == (HW, HW)

        # File-path input equals array input.
        p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
        cv2.imwrite(p1, pre)
        cv2.imwrite(p2, post)
        np.testing.assert_array_equal(client.predict(p1, p2)["change"], out["change"])

        assert client.metrics()["requests_total"] == 2

        big = np.zeros((HW * 2, HW, 3), np.uint8)
        with pytest.raises(RuntimeError, match="model expects"):
            client.predict(big, big)
    finally:
        httpd.shutdown()
        service.close()


def _post_raw(url, body, headers, expect_json=False):
    req = urllib.request.Request(
        url + "/v1/predict", body,
        headers={"Content-Type": "application/octet-stream", **headers},
    )
    try:
        with urllib.request.urlopen(req) as r:
            ctype = r.headers.get("Content-Type", "")
            if ctype.startswith("application/json"):
                return r.status, json.loads(r.read()), None
            return r.status, r.read(), r.headers["X-Parts"]
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read()), None


def test_raw_wire_matches_json_path(bcd_predictor):
    """The codec-free octet-stream protocol returns byte-identical masks to
    the base64-PNG JSON path, in both response flavors (raw Accept and
    default JSON)."""
    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        rng = np.random.RandomState(11)
        pre = rng.randint(0, 255, (HW, HW, 3), np.uint8)   # disk/BGR order
        post = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        code, body = _post(url, {"pre": _png64(pre), "post": _png64(post)})
        assert code == 200
        json_mask = cv2.imdecode(
            np.frombuffer(base64.b64decode(body["change"]), np.uint8),
            cv2.IMREAD_UNCHANGED,
        )

        # Raw body carries the model's channel order (RGB for bcd).
        raw = (np.ascontiguousarray(pre[:, :, ::-1]).tobytes()
               + np.ascontiguousarray(post[:, :, ::-1]).tobytes())
        hdr = {"X-Height": str(HW), "X-Width": str(HW)}

        code, data, parts = _post_raw(
            url, raw, {**hdr, "Accept": "application/octet-stream"})
        assert code == 200 and parts == f"change:{HW}:{HW}"
        raw_mask = np.frombuffer(data, np.uint8).reshape(HW, HW)
        np.testing.assert_array_equal(raw_mask, json_mask)

        # Raw request, JSON response (no Accept): same PNG payload.
        code, body2, _ = _post_raw(url, raw, hdr)
        assert code == 200
        png_mask = cv2.imdecode(
            np.frombuffer(base64.b64decode(body2["change"]), np.uint8),
            cv2.IMREAD_UNCHANGED,
        )
        np.testing.assert_array_equal(png_mask, json_mask)
    finally:
        httpd.shutdown()
        service.close()


def test_raw_wire_bad_requests(bcd_predictor):
    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=1)
    httpd, url = _start(service)
    try:
        good = bytes(2 * HW * HW * 3)
        hdr = {"X-Height": str(HW), "X-Width": str(HW)}
        code, body, _ = _post_raw(url, good[:-1], hdr)
        assert code == 400 and "expected 2*" in body["error"]
        code, body, _ = _post_raw(url, good, {"X-Height": str(HW)})
        assert code == 400 and "X-Height/X-Width" in body["error"]
        code, body, _ = _post_raw(url, good, {"X-Height": "-1", "X-Width": str(HW)})
        assert code == 400 and "bad raw dims" in body["error"]
        # Wrong size for the model (right arithmetic) -> shape error.
        bad_hw = {"X-Height": str(HW * 2), "X-Width": str(HW)}
        code, body, _ = _post_raw(url, bytes(2 * 2 * HW * HW * 3), bad_hw)
        assert code == 400 and "model expects" in body["error"]
    finally:
        httpd.shutdown()
        service.close()


def test_predict_client_raw_matches_json(bcd_predictor):
    from change3d_tpu.client import PredictClient

    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        client = PredictClient(url)
        rng = np.random.RandomState(12)
        pre = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        post = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        np.testing.assert_array_equal(
            client.predict_raw(pre, post)["change"],
            client.predict(pre, post)["change"],
        )
        with pytest.raises(ValueError, match="HWC uint8"):
            client.predict_raw(pre[..., :2], post[..., :2])
    finally:
        httpd.shutdown()
        service.close()


def test_raw_wire_bulk_matches_single(bcd_predictor):
    """X-Count bulk: N pairs in one request return (N, H, W) masks
    byte-identical to N single raw requests; malformed bulk requests 400."""
    from change3d_tpu.client import PredictClient

    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        rng = np.random.RandomState(13)
        pres = rng.randint(0, 255, (3, HW, HW, 3), np.uint8)   # disk/BGR
        posts = rng.randint(0, 255, (3, HW, HW, 3), np.uint8)

        client = PredictClient(url)
        singles = np.stack([
            client.predict_raw(pres[i], posts[i])["change"] for i in range(3)
        ])
        bulk = client.predict_raw_many(pres, posts)
        assert bulk["change"].shape == (3, HW, HW)
        np.testing.assert_array_equal(bulk["change"], singles)

        # Bulk detection masks can't ride the PNG JSON response: raw only.
        body = np.ascontiguousarray(
            np.stack([pres[..., ::-1], posts[..., ::-1]], axis=1)).tobytes()
        hdr = {"X-Height": str(HW), "X-Width": str(HW), "X-Count": "3"}
        code, payload, _ = _post_raw(url, body, hdr)
        assert code == 400 and "octet-stream" in payload["error"]

        # Wrong byte count for the declared X-Count.
        code, payload, _ = _post_raw(
            url, bytes(2 * HW * HW * 3),
            {**hdr, "Accept": "application/octet-stream"})
        assert code == 400 and "expected 3*2*" in payload["error"]

        with pytest.raises(ValueError, match="NHWC"):
            client.predict_raw_many(pres[0], posts[0])
    finally:
        httpd.shutdown()
        service.close()


def test_pinned_batch_artifact_rejected_at_construction(bcd_predictor):
    """A Predictor-like source with a pinned batch must match --batch_size
    up front, not 500 on every request."""
    class Pinned:
        fixed_batch = 8
        model = bcd_predictor.model
        predict = bcd_predictor.predict

    with pytest.raises(ValueError, match="--batch_size 8"):
        PredictService("bcd", Pinned(), batch_size=16)
    svc = PredictService("bcd", Pinned(), batch_size=8)  # matching is fine
    svc.close()


def test_oversized_body_rejected(bcd_predictor, monkeypatch):
    import change3d_tpu.serving as serving_mod

    monkeypatch.setattr(serving_mod, "MAX_BODY_BYTES", 1024)
    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=1)
    httpd, url = _start(service)
    try:
        img = _png64(np.random.RandomState(7).randint(0, 255, (HW, HW, 3), np.uint8))
        code, body = _post(url, {"pre": img, "post": img})
        assert code == 413 and "limit" in body["error"]
    finally:
        httpd.shutdown()
        service.close()


def test_cli_serve_rejects_shard_with_artifact():
    from change3d_tpu.cli import build_parser, run_serve

    args = build_parser().parse_args([
        "serve", "--model_task", "bcd", "--artifact", "m.hlo", "--shard",
    ])
    with pytest.raises(SystemExit, match="shard"):
        run_serve(args)


def test_stats_percentiles_nearest_rank():
    from change3d_tpu.serving import _Stats

    s = _Stats()
    s.record_request(0.010, ok=True)
    s.record_request(0.900, ok=True)
    snap = s.snapshot()
    assert snap["latency_s"]["p50"] == 0.010  # not the max of two samples
    assert snap["latency_s"]["p99"] == 0.900
    for ms in range(1, 101):
        s.record_request(ms / 1000.0, ok=True)
    snap = s.snapshot()
    assert snap["latency_s"]["p50"] <= 0.051


def test_warmup_compiles_without_counting(bcd_predictor):
    """warmup=True runs one dummy batch through the dispatch path at
    construction (compile happens before the first client) and does not
    show up in /metrics."""
    service = PredictService("bcd", bcd_predictor, batch_size=2,
                             max_delay_ms=1, warmup=True)
    try:
        snap = service.stats.snapshot()
        assert snap["requests_total"] == 0 and snap["batches_total"] == 0
        img = ((np.zeros((HW, HW, 3)) - 0.5) / 0.5).astype(np.float32)
        out = service._batcher.submit(img, img)
        assert out["change"].shape == (HW, HW)
    finally:
        service.close()


def test_metrics_endpoint(bcd_predictor):
    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        img = _png64(np.random.RandomState(5).randint(0, 255, (HW, HW, 3), np.uint8))
        assert _post(url, {"pre": img, "post": img})[0] == 200
        assert _post(url, {"pre": "junk", "post": img})[0] == 400
        with urllib.request.urlopen(url + "/metrics") as r:
            m = json.loads(r.read())
        assert m["requests_total"] == 2
        assert m["errors_total"] == 1
        assert m["batches_total"] >= 1
        assert m["latency_s"]["p50"] is not None
        assert m["mean_batch_fill"] >= 1
    finally:
        httpd.shutdown()
        service.close()


def test_http_bad_requests(bcd_predictor):
    service = PredictService("bcd", bcd_predictor, batch_size=2, max_delay_ms=1)
    httpd, url = _start(service)
    try:
        code, body = _post(url, {"pre": "!!!notbase64", "post": "x"})
        assert code == 400 and "bad pre/post" in body["error"]

        wrong = _png64(np.zeros((HW * 2, HW, 3), np.uint8))
        code, body = _post(url, {"pre": wrong, "post": wrong})
        assert code == 400 and "--tiled" in body["error"]

        code, body = _post(url, {"pre": _png64(np.zeros((HW, HW, 3), np.uint8))})
        assert code == 400

        req = urllib.request.Request(url + "/nope", b"{}")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        service.close()


def test_http_tiled_scene(bcd_predictor):
    service = PredictService(
        "bcd", bcd_predictor, batch_size=4, tiled=True, tile_overlap=8
    )
    httpd, url = _start(service)
    try:
        rng = np.random.RandomState(2)
        pre = rng.randint(0, 255, (70, 90, 3), np.uint8)
        post = rng.randint(0, 255, (70, 90, 3), np.uint8)
        code, body = _post(url, {"pre": _png64(pre), "post": _png64(post)})
        assert code == 200
        mask = cv2.imdecode(
            np.frombuffer(base64.b64decode(body["change"]), np.uint8),
            cv2.IMREAD_UNCHANGED,
        )
        assert mask.shape == (70, 90)
        assert set(np.unique(mask)) <= {0, 255}
    finally:
        httpd.shutdown()
        service.close()


def test_http_caption_serving():
    """CC over HTTP: beam-decoded sentences, batched like detection."""
    from change3d_tpu.inference import CaptionPredictor

    from _tiny_cc import TINY_KW, VOCAB

    model = Change3D(
        task=Task.CC, vocab_size=len(VOCAB), embed_dim=32, num_heads=4,
        num_layers=1, backbone_cfg=X3DConfig(**TINY_KW), in_height=HW, in_width=HW,
    )
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x, x, captions=jnp.zeros((1, 4), jnp.int32)
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    predictor = CaptionPredictor(
        model, variables, VOCAB, beam_size=2, compute_dtype=jnp.float32
    )
    service = PredictService("cc", predictor, batch_size=2, max_delay_ms=5)
    httpd, url = _start(service)
    try:
        rng = np.random.RandomState(4)
        pre = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        post = rng.randint(0, 255, (HW, HW, 3), np.uint8)
        code, body = _post(url, {"pre": _png64(pre), "post": _png64(post)})
        assert code == 200
        assert isinstance(body["caption"], str)
        vocab_words = set(VOCAB) - {"<pad>", "<start>", "<end>"}
        assert all(w in vocab_words for w in body["caption"].split())

        # Served caption equals a direct decode of the same pair (the server
        # converts the PNG's BGR to RGB before ImageNet normalization).
        from change3d_tpu.serving import _normalize_cc

        npre = _normalize_cc(pre[:, :, ::-1])[None]
        npost = _normalize_cc(post[:, :, ::-1])[None]
        assert body["caption"] == predictor.caption(npre, npost)[0]
    finally:
        httpd.shutdown()
        service.close()

    with pytest.raises(ValueError, match="detection"):
        PredictService("cc", predictor, tiled=True)


def test_predict_client_caption_passthrough():
    """PredictClient returns cc captions as plain strings (no PNG decode)."""
    from change3d_tpu.client import PredictClient
    from change3d_tpu.inference import CaptionPredictor

    from _tiny_cc import TINY_KW, VOCAB

    model = Change3D(
        task=Task.CC, vocab_size=len(VOCAB), embed_dim=32, num_heads=4,
        num_layers=1, backbone_cfg=X3DConfig(**TINY_KW), in_height=HW, in_width=HW,
    )
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x, x, captions=jnp.zeros((1, 4), jnp.int32)
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    predictor = CaptionPredictor(
        model, variables, VOCAB, beam_size=1, compute_dtype=jnp.float32
    )
    service = PredictService("cc", predictor, batch_size=2, max_delay_ms=1)
    httpd, url = _start(service)
    try:
        client = PredictClient(url)
        img = np.random.RandomState(8).randint(0, 255, (HW, HW, 3), np.uint8)
        out = client.predict(img, img)
        assert isinstance(out["caption"], str)
        # Raw wire on a cc server replies JSON (captions are text).
        assert client.predict_raw(img, img)["caption"] == out["caption"]
        # Bulk raw on cc: one request, a list of captions back.
        pair_stack = np.stack([img, img])
        caps = client.predict_raw_many(pair_stack, pair_stack)
        assert caps["caption"] == [out["caption"], out["caption"]]
    finally:
        httpd.shutdown()
        service.close()


def test_scd_payload_fields(bcd_predictor):
    """masks_to_payload field sets per task (scd via a real scd model)."""
    model = Change3D(task=Task.SCD, num_classes=6, in_height=HW, in_width=HW,
                     backbone_cfg=TINY_CFG)
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    service = PredictService(
        "scd", Predictor(model, variables, compute_dtype=jnp.float32),
        batch_size=2, max_delay_ms=1,
    )
    httpd, url = _start(service)
    try:
        img = _png64(np.random.RandomState(3).randint(0, 255, (HW, HW, 3), np.uint8))
        code, body = _post(url, {"pre": img, "post": img})
        assert code == 200
        assert set(body) == {"pre", "post", "change"}

        # Raw wire: multi-part response carries the same three masks.
        from change3d_tpu.client import PredictClient

        raw_img = np.random.RandomState(3).randint(0, 255, (HW, HW, 3), np.uint8)
        out = PredictClient(url).predict_raw(raw_img, raw_img)
        assert set(out) == {"pre", "post", "change"}
        for key in ("pre", "post", "change"):
            expect = cv2.imdecode(
                np.frombuffer(base64.b64decode(body[key]), np.uint8),
                cv2.IMREAD_UNCHANGED,
            )
            np.testing.assert_array_equal(out[key], expect)
    finally:
        httpd.shutdown()
        service.close()
