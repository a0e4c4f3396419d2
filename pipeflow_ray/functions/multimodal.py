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


def ensure_image_golden(n: int, seed: int = 42) -> str:
    """Golden stats parquet for :func:`synth_image_table`\\(n, seed):
    (image_id, width, height, mean_milli) computed straight from the
    generator's rng stream — never through the payload encode → actor-pool
    decode path, so checking the engine output against this parquet verifies
    the whole binary round-trip (round-2 VERDICT #5: multimodal gets a
    rows+schema+hash oracle instead of rows-only). mean_milli =
    floor(mean·1000) int64 — the cross-engine float discipline.

    Idempotent + atomic; returns the parquet path (DuckDB reads it in the
    oracle SQL)."""
    import os

    import pyarrow.parquet as pq

    root = "/tmp/pipeflow_fixtures"
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"image_golden_n{n}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    widths = rng.integers(16, 128, n)
    heights = rng.integers(16, 128, n)
    means = np.empty(n, np.float64)
    for i in range(n):  # identical draw order to synth_image_table
        body = rng.integers(0, 256, int(widths[i]) * int(heights[i]), dtype=np.uint8)
        means[i] = body.mean()
    t = pa.table(
        {
            "image_id": pa.array(np.arange(n), pa.int64()),
            "width": pa.array(widths.astype(np.int64), pa.int64()),
            "height": pa.array(heights.astype(np.int64), pa.int64()),
            "mean_milli": pa.array(np.floor(means * 1000).astype(np.int64), pa.int64()),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


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


# ---------------------------------------------------------------------------
# audio / video payloads (same gated-decode pattern as images)
# ---------------------------------------------------------------------------

_AMAGIC = b"PFAU"  # synthetic audio: magic, sample_rate, n_samples, int16 PCM
_VMAGIC = b"PFVI"  # synthetic video: magic, width, height, n_frames, frame bytes


def synth_audio_table(n: int, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    rates = rng.choice([8000, 16000, 44100], n)
    payloads = []
    for i in range(n):
        ns = int(rng.integers(400, 4000))
        pcm = (rng.standard_normal(ns) * 3000).astype(np.int16)
        payloads.append(_AMAGIC + struct.pack("<II", int(rates[i]), ns) + pcm.tobytes())
    return pa.table(
        {
            "audio_id": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["pfau"] * n),
        }
    )


def synth_video_table(n: int, seed: int = 44) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        w, h, nf = int(rng.integers(8, 32)), int(rng.integers(8, 32)), int(rng.integers(4, 24))
        frames = rng.integers(0, 256, w * h * nf, dtype=np.uint8).tobytes()
        payloads.append(_VMAGIC + struct.pack("<III", w, h, nf) + frames)
    return pa.table(
        {
            "video_id": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["pfvi"] * n),
        }
    )


class ExtractAudioFeatures:
    """Actor-pool stage: decode audio → (sample_rate, duration_s, rms).
    Real decoder (soundfile) attempted first; STUB parses the synthetic
    header otherwise."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    @staticmethod
    def _decode(payload: bytes):
        try:  # pragma: no cover - real decoder absent in this container
            import io

            import soundfile as sf  # noqa: F401

            data, rate = sf.read(io.BytesIO(payload))
            return rate, len(data) / rate, float(np.sqrt((data ** 2).mean()))
        except ImportError:
            pass
        if payload[:4] != _AMAGIC:
            raise ValueError("unknown audio format (stub decoder understands PFAU only)")
        rate, ns = struct.unpack("<II", payload[4:12])
        pcm = np.frombuffer(payload, dtype=np.int16, offset=12, count=ns).astype(np.float64)
        return rate, ns / rate, float(np.sqrt((pcm ** 2).mean()))

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, durs, rms = [], [], []
        for payload in t[self.payload_col].to_pylist():
            r, d, m = self._decode(payload)
            rates.append(r)
            durs.append(d)
            rms.append(m)
        t = t.drop_columns([self.payload_col])
        t = t.append_column("sample_rate", pa.array(rates, pa.int32()))
        t = t.append_column("duration_s", pa.array(durs, pa.float64()))
        return t.append_column("rms", pa.array(rms, pa.float64()))


class SampleVideoFrames:
    """Actor-pool stage: frame-sample every *stride*-th frame and emit one
    row per sampled frame (1 → N explode) with per-frame mean intensity.
    Output rows stay small: frames become feature rows, payload dropped."""

    def __init__(self, payload_col: str = "payload", stride: int = 4):
        self.payload_col = payload_col
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        vid_out, frame_out, mean_out = [], [], []
        ids = t["video_id"].to_pylist()
        for vid, payload in zip(ids, t[self.payload_col].to_pylist()):
            if payload[:4] != _VMAGIC:
                raise ValueError("unknown video format (stub decoder understands PFVI only)")
            w, h, nf = struct.unpack("<III", payload[4:16])
            frames = np.frombuffer(payload, dtype=np.uint8, offset=16).reshape(nf, h * w)
            for fi in range(0, nf, self.stride):
                vid_out.append(vid)
                frame_out.append(fi)
                mean_out.append(float(frames[fi].mean()))
        return pa.table(
            {
                "video_id": pa.array(vid_out, pa.int64()),
                "frame_idx": pa.array(frame_out, pa.int32()),
                "mean_intensity": pa.array(mean_out, pa.float64()),
            }
        )


class ResizeImages:
    """Actor-pool stage: nearest-neighbor resize of the synthetic image body
    to (out_w × out_h), re-emitting a payload column — demonstrates a
    payload→payload transform (batch sizes must stay small; see module
    docstring)."""

    def __init__(self, out_w: int = 16, out_h: int = 16, payload_col: str = "payload"):
        self.out_w, self.out_h = out_w, out_h
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for payload in t[self.payload_col].to_pylist():
            if payload[:4] != _MAGIC:
                raise ValueError("unknown image format")
            w, h, _c = struct.unpack("<III", payload[4:16])
            body = np.frombuffer(payload, dtype=np.uint8, offset=16).reshape(h, w)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = body[np.ix_(yi, xi)]
            out.append(_MAGIC + struct.pack("<III", self.out_w, self.out_h, 1) + small.tobytes())
        i = t.column_names.index(self.payload_col)
        return t.set_column(i, self.payload_col, pa.array(out, pa.binary()))


def ensure_audio_golden(n: int, seed: int = 43) -> str:
    """Golden stats parquet for :func:`synth_audio_table`\\(n, seed):
    (audio_id, sample_rate, n_samples, rms_milli) computed straight from the
    generator's rng stream (identical draw order), never through the payload
    encode → actor decode path — the audio analog of
    :func:`ensure_image_golden`."""
    import os

    import pyarrow.parquet as pq

    root = "/tmp/pipeflow_fixtures"
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"audio_golden_n{n}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    rates = rng.choice([8000, 16000, 44100], n)
    n_samples = np.empty(n, np.int64)
    rms_milli = np.empty(n, np.int64)
    for i in range(n):  # identical draw order to synth_audio_table
        ns = int(rng.integers(400, 4000))
        pcm = (rng.standard_normal(ns) * 3000).astype(np.int16).astype(np.float64)
        n_samples[i] = ns
        rms_milli[i] = int(np.floor(np.sqrt((pcm ** 2).mean()) * 1000.0))
    t = pa.table(
        {
            "audio_id": pa.array(np.arange(n), pa.int64()),
            "sample_rate": pa.array(rates.astype(np.int64), pa.int64()),
            "n_samples": pa.array(n_samples, pa.int64()),
            "rms_milli": pa.array(rms_milli, pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def ensure_video_golden(n: int, seed: int = 44, stride: int = 4) -> str:
    """Golden per-sampled-frame stats parquet for
    :func:`synth_video_table`\\(n, seed): (video_id, frame_idx, mean_milli)
    for every *stride*-th frame, from the generator's rng stream."""
    import os

    import pyarrow.parquet as pq

    root = "/tmp/pipeflow_fixtures"
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"video_golden_n{n}_s{seed}_k{stride}.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    vids, fidx, means = [], [], []
    for i in range(n):  # identical draw order to synth_video_table
        w, h, nf = int(rng.integers(8, 32)), int(rng.integers(8, 32)), int(rng.integers(4, 24))
        frames = rng.integers(0, 256, w * h * nf, dtype=np.uint8).reshape(nf, w * h)
        for j in range(0, nf, stride):
            vids.append(i)
            fidx.append(j)
            means.append(int(np.floor(frames[j].astype(np.float64).mean() * 1000.0)))
    t = pa.table(
        {
            "video_id": pa.array(np.asarray(vids, np.int64), pa.int64()),
            "frame_idx": pa.array(np.asarray(fidx, np.int64), pa.int64()),
            "mean_milli": pa.array(np.asarray(means, np.int64), pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path
