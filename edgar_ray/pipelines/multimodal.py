"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata
flowing through actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE kernels are stubs
(deterministic fake features, clearly marked); everything Ray-side — schema,
batch sizing for large binary rows, actor signature, output layout — is real
and tested. Swap ``_fake_decode`` for a real decoder (PIL/torchaudio) on a
production image and nothing else changes.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

PAYLOAD_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("modality", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.binary()),       # opaque encoded bytes
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
    ("meta_duration_ms", pa.int32()),
])


def synthesize_payloads(sf_dir: str):
    """Stand-in source: wrap each document's utf-8 bytes as an opaque payload
    with deterministic metadata (the testdata ships no binary column; a real
    deployment reads WARC/tar shards with ``read_binary_files``)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [s.encode() for s in t["text"].to_pylist()]
        mods, w, h, dur = [], [], [], []
        for i in ids:
            m = ("image", "audio", "video")[i % 3]
            mods.append(m)
            w.append(64 + (i % 16) * 32 if m != "audio" else 0)
            h.append(64 + (i % 9) * 32 if m != "audio" else 0)
            dur.append((i % 300) * 100 if m != "image" else 0)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "modality": pa.array(mods, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(w, pa.int32()),
            "meta_height": pa.array(h, pa.int32()),
            "meta_duration_ms": pa.array(dur, pa.int32()),
        })

    return ds.map_batches(wrap, batch_format="pyarrow")


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the payload hash.
    A real decoder raises NotImplementedError pathways here — this fake is
    used so the distributed plumbing stays testable without codecs."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(dim).astype(np.float32)


class FeatureExtractor:
    """Actor-pool stage: 'model' state built once per actor; per-batch decode
    + featurize. Small batch_size because payload rows are large."""

    def __init__(self, dim: int = 64, real_codecs: bool = False):
        self.dim = dim
        self.real_codecs = real_codecs
        # real path would load the codec/model here, once per actor

    def decode(self, payload: bytes, modality: str) -> np.ndarray:
        if self.real_codecs:
            raise NotImplementedError(
                "no image/audio codecs in this environment; "
                "plug a real decoder here"
            )
        return _fake_decode(payload, self.dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            self.decode(p, m)
            for p, m in zip(t["payload"].to_pylist(), t["modality"].to_pylist())
        ]
        return pa.table({
            "item_id": t["item_id"],
            "modality": t["modality"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
            "payload_bytes": pa.array([len(p) for p in t["payload"].to_pylist()],
                                      pa.int64()),
        })


def extract_features(sf_dir: str, dim: int = 64):
    """payloads -> features: the canonical multimodal actor-pool pipeline."""
    return synthesize_payloads(sf_dir).map_batches(
        FeatureExtractor, fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 8), num_cpus=1,
    )


def payload_stats(sf_dir: str):
    """Oracle-checkable projection: per item, payload byte length (equals
    octet_length(text) for the utf-8 stand-in source)."""
    ds = synthesize_payloads(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["item_id"],
            "payload_bytes": pa.array(
                [len(p) for p in t["payload"].to_pylist()], pa.int64()
            ),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


class Resizer:
    """Actor-pool resize stage for image payloads: target geometry fixed per
    actor; per-batch 'decode -> resize -> re-encode'. The codec is STUBBED
    (no image libs in this container): output payload is a deterministic
    hash-derived byte string of the right conceptual size, while metadata,
    schema and batch plumbing are real. Non-image rows pass through
    untouched."""

    def __init__(self, width: int = 224, height: int = 224,
                 real_codecs: bool = False):
        self.width = width
        self.height = height
        self.real_codecs = real_codecs

    def _resize(self, payload: bytes) -> bytes:
        if self.real_codecs:
            raise NotImplementedError("plug PIL/opencv here")
        h = hashlib.blake2b(payload, digest_size=16,
                            person=b"resize").digest()
        return h * max(1, (self.width * self.height) // (16 * 64))

    def __call__(self, t: pa.Table) -> pa.Table:
        mods = t["modality"].to_pylist()
        payloads = t["payload"].to_pylist()
        out_p, out_w, out_h = [], [], []
        for m, p, w0, h0 in zip(mods, payloads,
                                t["meta_width"].to_pylist(),
                                t["meta_height"].to_pylist()):
            if m == "image":
                out_p.append(self._resize(p))
                out_w.append(self.width)
                out_h.append(self.height)
            else:
                out_p.append(p)
                out_w.append(w0)
                out_h.append(h0)
        return pa.table({
            "item_id": t["item_id"],
            "modality": t["modality"],
            "payload": pa.array(out_p, pa.binary()),
            "meta_width": pa.array(out_w, pa.int32()),
            "meta_height": pa.array(out_h, pa.int32()),
            "meta_duration_ms": t["meta_duration_ms"],
        })


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: emits one row per
    sampled frame (flat_map shape — N frames out per video in), sampling at
    a fixed fps against the metadata duration. Decode is STUBBED; frame
    payloads derive deterministically from (payload, frame_idx)."""

    def __init__(self, fps: float = 1.0, max_frames: int = 16,
                 real_codecs: bool = False):
        self.fps = fps
        self.max_frames = max_frames
        self.real_codecs = real_codecs

    def _frame(self, payload: bytes, idx: int) -> bytes:
        if self.real_codecs:
            raise NotImplementedError("plug pyav/ffmpeg here")
        return hashlib.blake2b(payload + idx.to_bytes(4, "big"),
                               digest_size=32, person=b"frame").digest()

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        v = t.filter(pc.equal(t["modality"], pa.scalar("video")))
        empty = pa.table({"item_id": pa.array([], pa.int64()),
                          "frame_idx": pa.array([], pa.int32()),
                          "frame_ts_ms": pa.array([], pa.int32()),
                          "frame": pa.array([], pa.binary())})
        if v.num_rows == 0:
            return empty
        # all metadata columns vectorized (repeat/arange); only the stubbed
        # per-frame decode hash touches Python bytes — the real codec would
        # be per-frame work regardless
        dur = v["meta_duration_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.minimum(self.max_frames,
                       np.maximum(1, (dur / 1000.0 * self.fps).astype(np.int64)))
        item = v["item_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        starts = np.r_[0, np.cumsum(n)[:-1]]
        fidx = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
        ts_ms = (fidx * 1000.0 / self.fps).astype(np.int32)
        row_of = np.repeat(np.arange(len(n)), n)
        payloads = v["payload"].to_pylist()
        frames = [self._frame(payloads[r], int(k))
                  for r, k in zip(row_of, fidx)]
        return pa.table({
            "item_id": pa.array(np.repeat(item, n), pa.int64()),
            "frame_idx": pa.array(fidx.astype(np.int32), pa.int32()),
            "frame_ts_ms": pa.array(ts_ms, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def resize_images(sf_dir: str, width: int = 224, height: int = 224):
    """Image payloads resized to a fixed geometry (actor pool; stub codec)."""
    return synthesize_payloads(sf_dir).map_batches(
        Resizer, fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 8), num_cpus=1,
    )


def sample_frames(sf_dir: str, fps: float = 1.0):
    """Video payloads -> one row per sampled frame (actor pool; stub codec).
    Small batch_size because frame fan-out multiplies row sizes."""
    return synthesize_payloads(sf_dir).map_batches(
        FrameSampler, fn_constructor_kwargs={"fps": fps},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 8), num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Oracle-checkable metadata projections: the binary columns (frame/payload)
# are stub-codec output and stay rows-only; everything ELSE these stages
# compute derives from doc_id arithmetic and is SQL-expressible, so the
# driver can value-hash it against DuckDB.
# ---------------------------------------------------------------------------


def frame_sample_meta(sf_dir: str, fps: float = 1.0):
    """sample_frames minus the binary frame column: the frame schedule
    (item_id, frame_idx, frame_ts_ms)."""
    return sample_frames(sf_dir, fps=fps).map_batches(
        lambda t: t.drop_columns(["frame"]), batch_format="pyarrow")


def resize_meta(sf_dir: str, width: int = 224, height: int = 224):
    """resize_images minus the binary payload: post-resize geometry."""
    return resize_images(sf_dir, width=width, height=height).map_batches(
        lambda t: t.drop_columns(["payload"]), batch_format="pyarrow")


def features_meta(sf_dir: str, dim: int = 64):
    """extract_features minus the stub feature vector: byte accounting."""
    return extract_features(sf_dir, dim=dim).map_batches(
        lambda t: t.drop_columns(["feature"]), batch_format="pyarrow")
