"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode libraries (PIL / soundfile / video codecs) are import-tried in the
actor ``__init__`` (once per actor, the correct place for model/codec
loading) and USED when present: a payload that does not carry this module's
synthetic magic (``IMG!``/``AUD!``/``VID!``) is handed to the real decoder.
Synthetic payloads always take the deterministic header-parse path, so the
mm_* queries stay bit-exact against their DuckDB oracles whether or not the
codec libraries are installed.  In this container neither library exists, so
real-format payloads raise a clearly marked ``NotImplementedError``;
everything Ray-side — schema, actor signature, per-stage batch size, output
layout — is identical on both branches.

Synthetic payload formats (deterministic, self-describing):
  image: b"IMG!" + uint16 w + uint16 h + (w*h) raw bytes
  video: b"VID!" + uint16 nframes + uint16 frame_len + frames
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pyarrow as pa


def _pattern(n: int, seed: int, mod: int) -> np.ndarray:
    """Deterministic quadratic-congruential byte/sample pattern.  Pure int64
    arithmetic (every intermediate < 2^63 for n <= ~40k), so a DuckDB BIGINT
    expression reproduces the payload contents exactly — the mm_* queries'
    oracle SQL regenerates these values and checks the decoded stats
    bit-for-bit (an RNG-based payload would leave the decode stages with
    rows-only verification)."""
    i = np.arange(n, dtype=np.int64)
    return (i * i * 1103515245 + i * 12345 + np.int64(seed) * 2654435761) % (
        2 ** 31
    ) % mod


def make_image_payload(w: int, h: int, seed: int) -> bytes:
    px = _pattern(w * h, seed, 256).astype(np.uint8)
    return b"IMG!" + struct.pack("<HH", w, h) + px.tobytes()


def make_video_payload(nframes: int, frame_len: int, seed: int) -> bytes:
    data = _pattern(nframes * frame_len, seed, 256).astype(np.uint8)
    return b"VID!" + struct.pack("<HH", nframes, frame_len) + data.tobytes()


class DecodeImageStage:
    """Actor-pool stage: payload -> (width, height, mean_pixel feature).

    Use with ``ds.map_batches(DecodeImageStage, batch_format="pyarrow",
    batch_size=64, concurrency=N)`` — small batches because rows are large
    binary (SURVEY memory-aware rule)."""

    def __init__(self):
        try:  # real codec path — absent in this container
            from PIL import Image

            self._image_cls = Image
        except ImportError:
            self._image_cls = None

    def _decode_payload(self, payload: bytes) -> tuple[int, int, float]:
        if payload[:4] == b"IMG!":  # synthetic payloads always parse locally
            w, h = struct.unpack("<HH", payload[4:8])
            px = np.frombuffer(payload[8: 8 + w * h], dtype=np.uint8)
            return w, h, float(px.mean()) if len(px) else 0.0
        if self._image_cls is None:
            raise NotImplementedError(
                "real image decode needs PIL (not in this container)"
            )
        img = self._image_cls.open(io.BytesIO(payload))  # pragma: no cover
        px = np.asarray(img.convert("L"), dtype=np.uint8)
        return img.width, img.height, float(px.mean()) if px.size else 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = [self._decode_payload(p) for p in batch["payload"].to_pylist()]
        w, h, m = zip(*triples) if triples else ((), (), ())
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": pa.array(np.asarray(w, np.int32)),
                "height": pa.array(np.asarray(h, np.int32)),
                "mean_pixel": pa.array(np.asarray(m, np.float64)),
            }
        )


class ResizeStage:
    """Computes the letterboxed target geometry (the resample itself is the
    codec-side stub).  Demonstrates chaining typed metadata stages."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = self.target / np.maximum(w, h)
        return batch.append_column(
            "out_w", pa.array(np.round(w * scale).astype(np.int32))
        ).append_column("out_h", pa.array(np.round(h * scale).astype(np.int32)))


class FrameSampleStage:
    """video payload -> every ``stride``-th frame's mean value (deterministic
    stand-in for frame extraction + per-frame feature)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for i, p in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            if p[:4] != b"VID!":
                raise ValueError("not a VID! payload")
            nf, fl = struct.unpack("<HH", p[4:8])
            data = np.frombuffer(p[8:], dtype=np.uint8).reshape(nf, fl)
            for f in range(0, nf, self.stride):
                ids.append(i)
                frames.append(f)
                feats.append(float(data[f].mean()))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frames, pa.int32()),
                "mean_value": pa.array(feats, pa.float64()),
            }
        )


def make_audio_payload(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """AUD! + uint32 sample_rate + uint32 n_samples + int16 PCM samples."""
    pcm = (_pattern(n_samples, seed, 65536) - 32768).astype(np.int16)
    return b"AUD!" + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


class DecodeAudioStage:
    """Actor-pool stage: audio payload -> (sample_rate, duration_s, rms).
    Real codec (torchaudio/soundfile) import-tried in __init__; absent them
    the deterministic AUD! header-parse fake decodes (same stub pattern as
    DecodeImageStage)."""

    def __init__(self):
        try:  # real codec path — absent in this container
            import soundfile

            self._soundfile = soundfile
        except ImportError:
            self._soundfile = None

    def _decode_payload(self, payload: bytes) -> tuple[int, float, float]:
        if payload[:4] == b"AUD!":  # synthetic payloads always parse locally
            sr, ns = struct.unpack("<II", payload[4:12])
            pcm = np.frombuffer(payload[12: 12 + 2 * ns], dtype=np.int16)
            rms = (
                float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if ns else 0.0
            )
            return sr, ns / sr if sr else 0.0, rms
        if self._soundfile is None:
            raise NotImplementedError(
                "real audio decode needs soundfile (not in this container)"
            )
        data, sr = self._soundfile.read(  # pragma: no cover
            io.BytesIO(payload), dtype="int16", always_2d=True
        )
        pcm = data.astype(np.float64)
        rms = float(np.sqrt(np.mean(pcm ** 2))) if pcm.size else 0.0
        return sr, len(data) / sr if sr else 0.0, rms

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples = [self._decode_payload(p) for p in batch["payload"].to_pylist()]
        sr, dur, rms = zip(*triples) if triples else ((), (), ())
        return pa.table(
            {
                "item_id": batch["item_id"],
                "sample_rate": pa.array(np.asarray(sr, np.int32)),
                "duration_s": pa.array(np.asarray(dur, np.float64)),
                "rms": pa.array(np.asarray(rms, np.float64)),
            }
        )


def decode_audio(items, concurrency: int = 2, batch_size: int = 32):
    return items.map_batches(
        DecodeAudioStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_images(items, concurrency: int = 2, batch_size: int = 64):
    return items.map_batches(
        DecodeImageStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(items, stride: int = 4, concurrency: int = 2, batch_size: int = 16):
    return items.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"stride": stride},
    )
