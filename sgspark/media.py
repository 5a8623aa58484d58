"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not available in this container, so the
DECODE step is a clearly-marked deterministic fake (`_fake_decode`) behind
the real Spark plumbing: schema, batching, partitioning and UDF signatures
are production-shaped (binary in, array<float> features out, Arrow batches
throughout).  Swap `_fake_decode` for PIL/ffmpeg calls on a real cluster.

Pipeline: documents.spans (kind='media', media_ref NOT LIKE 'geo:%') ->
fetch stub (ref -> bytes) -> decode/feature-extract (mapInPandas) ->
(doc_id, span_pos, media_kind, width, height, features).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 16


def media_refs(docs: DataFrame) -> DataFrame:
    """Non-geo media spans as rows (doc row itself never exploded —
    span-invariant discipline, see sgspark/io.py)."""
    id_cols = [c for c in ("doc_id", "doc_index") if c in docs.columns]
    return (docs.select(*id_cols,
                        F.posexplode("spans").alias("span_pos", "span"))
            .where((F.col("span.kind") == "media") &
                   ~F.col("span.media_ref").startswith("geo:"))
            .select(*id_cols, "span_pos",
                    F.col("span.media_ref").alias("media_ref")))


def fetch_media(refs: DataFrame) -> DataFrame:
    """STUB: resolve media_ref -> raw bytes.  Deterministic fake payload
    (the ref string encoded); a real deployment replaces this with an
    object-store read inside the same mapInPandas shape."""
    return refs.withColumn("payload",
                           F.encode(F.col("media_ref"), "utf-8"))


def decode_and_featurize(media: DataFrame) -> DataFrame:
    """Decode stub + feature extraction over Arrow batches.

    `_fake_decode` stands in for the real decoder (NotImplementedError
    pathway kept explicit): it derives a deterministic (width, height) and
    a FEATURE_DIM float vector from the payload bytes, so tests can assert
    the full distributed plumbing (schema, batch shape, determinism).
    """
    cols = [c for c in media.columns if c not in ("payload",)]
    schema = (", ".join([f"{c} long" if c in ("doc_index",) else
                         (f"{c} int" if c == "span_pos" else f"{c} string")
                         for c in cols])
              + ", media_kind string, width int, height int, "
                f"features array<float>")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[cols].copy()
            kinds, ws, hs, feats = [], [], [], []
            for b in pdf["payload"]:
                k, w, hgt, f = _fake_decode(bytes(b))
                kinds.append(k)
                ws.append(w)
                hs.append(hgt)
                feats.append(f)
            out["media_kind"] = kinds
            out["width"] = ws
            out["height"] = hs
            out["features"] = feats
            yield out

    return media.mapInPandas(kernel, schema=schema)


def _fake_decode(payload: bytes) -> tuple[str, int, int, list]:
    """Deterministic fake decoder. REAL decode is NOT implemented in this
    container (no PIL/ffmpeg); see module docstring."""
    h = np.frombuffer((payload * (64 // max(len(payload), 1) + 1))[:64],
                      dtype=np.uint8).astype(np.float64)
    rng = (h.sum() % 97) / 97.0
    width = 64 + int(h[0]) % 192
    height = 64 + int(h[1]) % 192
    feats = ((h[:FEATURE_DIM] / 255.0) + rng).astype(np.float32).tolist()
    return "image", width, height, feats


def real_decode(payload: bytes):
    """The production decode hook — intentionally unimplemented here."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this container; "
        "swap _fake_decode for this hook on a real cluster")


def frame_sample(media: DataFrame, n_frames: int = 4,
                 id_cols: tuple = ("doc_id", "span_pos")) -> DataFrame:
    """VIDEO frame sampling plumbing: one row per sampled frame with a
    deterministic frame timestamp + per-frame feature vector.

    The frame DECODE is the same explicit stub discipline as images (no
    ffmpeg in this container): frame features derive deterministically
    from (payload, frame_idx), so schema/batching/ordering — the Spark
    side — is fully real and tested.  Real deployments replace
    `_fake_frame` with a seek+decode inside the same mapInPandas shape."""
    cols = [c for c in media.columns if c != "payload"]
    schema = (", ".join([f"{c} long" if c in ("doc_index",) else
                         (f"{c} int" if c == "span_pos" else f"{c} string")
                         for c in cols])
              + ", frame_idx int, frame_ts double, "
                f"features array<float>")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows_src, fidx, fts, feats = [], [], [], []
            for i in range(len(pdf)):
                payload = bytes(pdf["payload"].iloc[i])
                dur = 1.0 + (sum(payload) % 29)  # fake duration seconds
                for k in range(n_frames):
                    rows_src.append(i)
                    fidx.append(k)
                    fts.append(round(dur * (k + 0.5) / n_frames, 6))
                    feats.append(_fake_frame(payload, k))
            out = pdf.iloc[rows_src][cols].copy()
            out["frame_idx"] = fidx
            out["frame_ts"] = fts
            out["features"] = feats
            yield out

    return media.mapInPandas(kernel, schema=schema)


def _fake_frame(payload: bytes, frame_idx: int) -> list:
    h = np.frombuffer((payload * (64 // max(len(payload), 1) + 1))[:64],
                      dtype=np.uint8).astype(np.float64)
    return ((np.roll(h[:FEATURE_DIM], frame_idx) / 255.0)
            + frame_idx * 0.01).astype(np.float32).tolist()


def audio_windows(media: DataFrame, window_s: float = 1.0,
                  n_windows: int = 8) -> DataFrame:
    """AUDIO windowing plumbing: fixed-length analysis windows per clip
    with deterministic per-window energy features (decode stubbed, same
    discipline as frame_sample)."""
    cols = [c for c in media.columns if c != "payload"]
    schema = (", ".join([f"{c} long" if c in ("doc_index",) else
                         (f"{c} int" if c == "span_pos" else f"{c} string")
                         for c in cols])
              + ", window_idx int, t0 double, t1 double, energy double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows_src, widx, t0s, t1s, en = [], [], [], [], []
            for i in range(len(pdf)):
                payload = bytes(pdf["payload"].iloc[i])
                h = np.frombuffer(
                    (payload * (n_windows // max(len(payload), 1) + 2))
                    [:n_windows], dtype=np.uint8)
                for k in range(n_windows):
                    rows_src.append(i)
                    widx.append(k)
                    t0s.append(k * window_s)
                    t1s.append((k + 1) * window_s)
                    en.append(float(h[k]) / 255.0)
            out = pdf.iloc[rows_src][cols].copy()
            out["window_idx"] = widx
            out["t0"] = t0s
            out["t1"] = t1s
            out["energy"] = en
            yield out

    return media.mapInPandas(kernel, schema=schema)
