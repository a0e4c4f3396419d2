"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The real decoders (PIL / soundfile / av) are NOT in this container, so the
decode kernel is stubbed: real libraries are attempted first (import-try) and
otherwise a clearly-marked deterministic fake parses our synthetic header.
Everything Ray-side — schema, batch sizing, actor signature, output layout —
is real and tested; swapping in a real decoder changes only ``_decode_one``.

Payload batches are large: keep ``batch_size`` small (default 64) so
batch × concurrency fits worker heaps, and let the object store spill.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

_MAGIC = b"PFIM"  # synthetic "image" header: magic, width, height, channels


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic 'image' corpus: binary payload + metadata."""
    rng = np.random.default_rng(seed)
    widths = rng.integers(16, 128, n)
    heights = rng.integers(16, 128, n)
    payloads = []
    for i in range(n):
        w, h = int(widths[i]), int(heights[i])
        body = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        payloads.append(_MAGIC + struct.pack("<III", w, h, 1) + body)
    return pa.table(
        {
            "image_id": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["pfim"] * n),
        }
    )


def _decode_one(payload: bytes) -> tuple[int, int, float]:
    """Decode kernel. Tries a real image library; falls back to the
    deterministic synthetic-header fake (STUB — replace body when PIL/cv2 are
    available in the runtime)."""
    try:  # pragma: no cover - real decoder absent in this container
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img, dtype=np.float64)
        return img.width, img.height, float(arr.mean())
    except ImportError:
        pass
    if payload[:4] != _MAGIC:
        raise ValueError("unknown image format (stub decoder understands PFIM only)")
    w, h, _c = struct.unpack("<III", payload[4:16])
    body = np.frombuffer(payload, dtype=np.uint8, offset=16)
    return w, h, float(body.mean())


class DecodeImages:
    """Actor-pool stage: decode → (width, height, mean_intensity), payload
    dropped from the output (decoded features only continue downstream)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col  # heavy init (model load) would go here

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, ms = [], [], []
        for payload in t[self.payload_col].to_pylist():
            w, h, m = _decode_one(payload)
            ws.append(w)
            hs.append(h)
            ms.append(m)
        t = t.drop_columns([self.payload_col])
        t = t.append_column("width", pa.array(ws, pa.int32()))
        t = t.append_column("height", pa.array(hs, pa.int32()))
        return t.append_column("mean_intensity", pa.array(ms, pa.float64()))


def decode_images(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        DecodeImages,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
