"""Python client for the `cli serve` HTTP API (change3d_tpu/serving.py).

No framework/JAX imports — only numpy + opencv beyond the stdlib, so this
one file can be vendored next to consumer code. Images go in as numpy
uint8 arrays or file paths; masks come back as numpy uint8 arrays
(binary heads are {0, 255} PNGs, class heads are class ids), captions as
strings.

    from change3d_tpu.client import PredictClient
    c = PredictClient("http://tpu-host:8000")
    masks = c.predict("pre.png", "post.png")   # {"change": uint8 {0,255}}
    changed_frac = (masks["change"] > 0).mean()
    print(c.health(), c.metrics())
"""

from __future__ import annotations

import base64
import json
import urllib.request
from typing import Dict, Union

import numpy as np

ImageLike = Union[str, np.ndarray]


def _to_png_b64(img: ImageLike) -> str:
    if isinstance(img, str):
        with open(img, "rb") as f:
            return base64.b64encode(f.read()).decode("ascii")
    import cv2

    ok, buf = cv2.imencode(".png", np.ascontiguousarray(img))
    if not ok:
        raise ValueError("png encode failed")
    return base64.b64encode(buf.tobytes()).decode("ascii")


def _from_png_b64(b64: str) -> np.ndarray:
    import cv2

    img = cv2.imdecode(
        np.frombuffer(base64.b64decode(b64), np.uint8), cv2.IMREAD_UNCHANGED
    )
    if img is None:
        raise ValueError("server returned an undecodable mask")
    return img


class PredictClient:
    """Blocking client; share one instance across threads freely (each call
    opens its own connection — the server batches concurrent requests)."""

    def __init__(self, base_url: str, *, timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._task = None  # lazily fetched from /healthz for predict_raw

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(self.base_url + path, timeout=self.timeout) as r:
            return json.loads(r.read())

    def health(self) -> dict:
        return self._get("/healthz")

    def metrics(self) -> dict:
        return self._get("/metrics")

    def predict(self, pre: ImageLike, post: ImageLike) -> Dict[str, Union[np.ndarray, str]]:
        """Returns the task's masks as numpy uint8 arrays exactly as the
        server PNG-encodes them — binary heads {0, 255} (bcd/scd 'change',
        bda 'loc'), class heads class ids (scd 'pre'/'post', bda 'cls') —
        or, for a cc server, {'caption': str}.

        Send images AS STORED ON DISK (file path, or the uint8 array exactly
        as cv2.imread returns it) — the server applies the task's channel
        pins and normalization. Raises RuntimeError with the server's reason
        on 4xx/5xx."""
        body = json.dumps(
            {"pre": _to_png_b64(pre), "post": _to_png_b64(post)}
        ).encode()
        req = urllib.request.Request(
            self.base_url + "/v1/predict", body,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                payload = json.loads(r.read())
        except urllib.error.HTTPError as e:
            try:
                reason = json.loads(e.read()).get("error", str(e))
            except Exception:  # noqa: BLE001 — non-JSON error body
                reason = str(e)
            raise RuntimeError(f"predict failed ({e.code}): {reason}") from e
        return {
            key: val if key == "caption" else _from_png_b64(val)
            for key, val in payload.items()
        }

    def predict_raw(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, Union[np.ndarray, str]]:
        """Codec-free fast path: ships the uint8 pixels as one
        ``application/octet-stream`` body (no PNG, no base64, no JSON) and
        reads the masks back the same way — byte-identical results to
        :meth:`predict`, at a fraction of the per-request host CPU on both
        ends. Same input convention as :meth:`predict` (images AS STORED ON
        DISK, i.e. cv2/BGR channel order): the client flips to the model's
        RGB order for non-BDA tasks before sending, because the raw wire
        carries bytes straight into the model."""
        pre = np.asarray(pre, np.uint8)
        post = np.asarray(post, np.uint8)
        if pre.shape != post.shape or pre.ndim != 3 or pre.shape[-1] != 3:
            raise ValueError(f"need matching HWC uint8 images, got "
                             f"{pre.shape} / {post.shape}")
        if self._task is None:
            self._task = self.health()["task"]
        if self._task != "bda":  # BGR on disk -> model's RGB pin
            pre, post = pre[:, :, ::-1], post[:, :, ::-1]
        h, w = pre.shape[:2]
        body = np.ascontiguousarray(pre).tobytes() + np.ascontiguousarray(post).tobytes()
        req = urllib.request.Request(
            self.base_url + "/v1/predict", body,
            headers={
                "Content-Type": "application/octet-stream",
                "Accept": "application/octet-stream",
                "X-Height": str(h),
                "X-Width": str(w),
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                if r.headers.get("Content-Type", "").startswith("application/json"):
                    return json.loads(r.read())  # cc: {"caption": str}
                parts = r.headers["X-Parts"]
                data = r.read()
        except urllib.error.HTTPError as e:
            try:
                reason = json.loads(e.read()).get("error", str(e))
            except Exception:  # noqa: BLE001 — non-JSON error body
                reason = str(e)
            raise RuntimeError(f"predict failed ({e.code}): {reason}") from e
        return _parse_raw_parts(parts, data)

    def predict_raw_many(
        self, pres: np.ndarray, posts: np.ndarray
    ) -> Dict[str, Union[np.ndarray, list]]:
        """Bulk raw fast path: N pairs in ONE request (``X-Count``), masks
        back as ``(N, H, W)`` uint8 arrays (cc: ``{"caption": [str, ...]}``).
        Results are byte-identical to N :meth:`predict_raw` calls; the win
        is paying one HTTP round trip + one server handler thread for the
        whole block — the per-request host CPU is the serving ceiling on
        small hosts (see docs/SERVING.md). Same images-as-stored-on-disk
        convention: the client flips BGR->RGB for non-BDA tasks."""
        pres = np.asarray(pres, np.uint8)
        posts = np.asarray(posts, np.uint8)
        if pres.shape != posts.shape or pres.ndim != 4 or pres.shape[-1] != 3:
            raise ValueError(f"need matching NHWC uint8 stacks, got "
                             f"{pres.shape} / {posts.shape}")
        if self._task is None:
            self._task = self.health()["task"]
        if self._task != "bda":  # BGR on disk -> model's RGB pin
            pres, posts = pres[..., ::-1], posts[..., ::-1]
        n, h, w = pres.shape[:3]
        # (N, 2, H, W, 3): pair i's pre then post, back to back.
        body = np.ascontiguousarray(np.stack([pres, posts], axis=1)).tobytes()
        req = urllib.request.Request(
            self.base_url + "/v1/predict", body,
            headers={
                "Content-Type": "application/octet-stream",
                "Accept": "application/octet-stream",
                "X-Height": str(h),
                "X-Width": str(w),
                "X-Count": str(n),
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                if r.headers.get("Content-Type", "").startswith("application/json"):
                    return json.loads(r.read())  # cc: {"caption": [str, ...]}
                parts = r.headers["X-Parts"]
                data = r.read()
        except urllib.error.HTTPError as e:
            try:
                reason = json.loads(e.read()).get("error", str(e))
            except Exception:  # noqa: BLE001 — non-JSON error body
                reason = str(e)
            raise RuntimeError(f"predict failed ({e.code}): {reason}") from e
        return _parse_raw_parts(parts, data)


def _parse_raw_parts(parts: str, data: bytes) -> Dict[str, np.ndarray]:
    """X-Parts ("name:d0:d1[:d2],...") + concatenated uint8 body -> arrays."""
    out: Dict[str, np.ndarray] = {}
    off = 0
    for part in parts.split(","):
        name, *dims = part.split(":")
        shape = tuple(int(d) for d in dims)
        count = int(np.prod(shape))
        chunk = data[off:off + count]
        if len(chunk) != count:
            raise RuntimeError(
                f"truncated raw response: part {name!r} declares {count} "
                f"bytes but only {len(chunk)} remain (X-Parts={parts!r}, "
                f"body={len(data)} bytes)")
        out[name] = np.frombuffer(chunk, np.uint8).reshape(shape)
        off += count
    if off != len(data):
        raise RuntimeError(
            f"mis-framed raw response: X-Parts {parts!r} consumes {off} "
            f"bytes but the body carries {len(data)}")
    return out
