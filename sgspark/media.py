"""Multimodal column plumbing: opaque binary media + typed metadata.

IMAGE decode is REAL for PNG and binary PPM/PGM (round 6): stdlib zlib
inflate + a numpy unfilter pass (`decode_png` / `decode_ppm` /
`real_decode`), gated hash-exact against a DuckDB pixel-formula oracle
(`png_decode`) and conformance-checked against OS-shipped PNGs from
other encoders.  JPEG/video/audio codecs are not in this container, so
those formats keep the clearly-marked deterministic fake
(`_fake_decode`) behind the same production-shaped Spark plumbing
(binary in, stats/array<float> out, Arrow batches throughout).

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


# --------------------------------------------------------------------- #
# REAL image decode (round 6, VERDICT r5 #3): PNG and PPM/PGM need only
# stdlib zlib + numpy, both available — the multimodal column is
# end-to-end real for these formats.  Video/audio containers (ffmpeg)
# remain the documented environment-blocked stub (`_fake_decode`).
# --------------------------------------------------------------------- #

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray, *, filter_mode: str = "cycle") -> bytes:
    """Minimal deterministic PNG encoder (8-bit gray / RGB / RGBA, no
    interlace).  `filter_mode="cycle"` applies filter type row_idx % 5 so
    a round-trip exercises every unfilter path of the decoder;
    `"none"` writes filter 0 rows.  Fixed zlib level -> byte-stable."""
    import struct
    import zlib
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body +
                struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    bpp = c  # bytes per pixel (bit depth 8)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        ft = (y % 5) if filter_mode == "cycle" else 0
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]]) \
            if w * c > bpp else np.zeros_like(row)
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]]) \
            if w * c > bpp else np.zeros_like(prev)
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - ((left.astype(np.uint16) + prev) // 2).astype(
                np.uint8)
        else:
            p = left.astype(np.int16) + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft)).astype(
                np.uint8)
            enc = row - pred
        raw.append(ft)
        raw.extend(enc.tobytes())
        prev = row
    return (_PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(raw), 6)) +
            chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline PNG filtering (types 0-4).  Filters 1/3/4
    have an intra-row left dependency, so those rows decode with a
    per-byte loop; rows are short and this runs featurize-side in an
    Arrow batch kernel, never on the pair path."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ft == 0:
            pass
        elif ft == 2:
            row += prev
        elif ft == 1:
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                cc = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = row
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA / palette) to an (h, w, c) uint8 array — stdlib zlib + numpy
    only.  Interlaced (Adam7) and 16-bit images raise ValueError (the
    documented subset; `_fake_decode` remains the fallback)."""
    import struct
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte, trns = 8, [], None, None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack(">I4s", payload[pos:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    if depth != 8 or interlace:
        raise ValueError("unsupported PNG (16-bit or interlaced)")
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    px = _png_unfilter(raw, w, h, nchan).reshape(h, w, nchan)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        rgb = plte[px[:, :, 0]]
        if trns is not None:
            a = np.full((h, w, 1), 255, np.uint8)
            a[:, :, 0] = np.where(px[:, :, 0] < len(trns),
                                  trns[np.minimum(px[:, :, 0],
                                                  len(trns) - 1)], 255)
            return np.concatenate([rgb, a], axis=2)
        return rgb
    return px


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6, RGB) / PGM (P5, gray), maxval <= 255."""
    import re
    m = re.match(rb"(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s",
                 payload)
    if not m:
        raise ValueError("not a binary PPM/PGM")
    w, h = int(m.group(2)), int(m.group(3))
    if int(m.group(4)) > 255:
        raise ValueError("16-bit PPM unsupported")
    c = 3 if m.group(1) == b"P6" else 1
    data = payload[m.end():m.end() + w * h * c]
    return np.frombuffer(data, np.uint8).reshape(h, w, c)


def real_decode(payload: bytes) -> tuple[str, np.ndarray]:
    """Production decode hook: returns (format, (h, w, c) uint8 pixels)
    for the formats this container can decode from first principles —
    PNG (stdlib zlib inflate + numpy unfilter) and binary PPM/PGM.
    Other containers (JPEG/video/audio) raise NotImplementedError and
    callers fall back to the documented `_fake_decode` stub."""
    if payload[:8] == _PNG_SIG:
        return "png", decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        return "ppm", decode_ppm(payload)
    raise NotImplementedError(
        "only PNG and binary PPM/PGM decode from first principles here; "
        "JPEG/video/audio need external codecs not in this container")


def synth_images(ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image payloads per id — the `png_decode`
    gate's input: pixel v(ch, y, x) = (x*7 + y*13 + ch*17 + id*31) % 256
    over w = 4 + id%13, h = 4 + id%11, channels = 3 if id%3=0 else 1;
    encoded as binary PPM/PGM when id%5=0 and PNG otherwise (filter
    types cycling 0-4 per row, so every unfilter path is exercised).
    The formula is SQL-expressible, so a DuckDB oracle can check the
    decoded pixel statistics exactly."""
    id_t = [f.dataType.simpleString() for f in ids.schema.fields
            if f.name == id_col][0]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 13, 4 + did % 11
                c = 3 if did % 3 == 0 else 1
                x = np.arange(w)
                y = np.arange(h)
                ch = np.arange(c)
                v = ((x[None, :, None] * 7 + y[:, None, None] * 13 +
                      ch[None, None, :] * 17 + did * 31) % 256
                     ).astype(np.uint8)
                if did % 5 == 0:
                    tag = b"P6" if c == 3 else b"P5"
                    payloads.append(tag + b"\n%d %d\n255\n" % (w, h) +
                                    v.tobytes())
                else:
                    payloads.append(encode_png(v, filter_mode="cycle"))
            out = pdf[[id_col]].copy()
            out["payload"] = payloads
            yield out

    return ids.select(id_col).mapInPandas(
        kernel, schema=f"{id_col} {id_t}, payload binary")


def decode_image_stats(media: DataFrame, *, payload_col: str = "payload"
                       ) -> DataFrame:
    """REAL decode -> per-image pixel statistics over Arrow batches:
    (…, media_kind, width, height, channels, px_sum, px_min, px_max,
    px_mean).  Exact integer sum over all channels -> the stats are
    engine-independent and DuckDB-oracle-checkable (gate `png_decode`).
    Payloads no recognized decoder can handle fall back to
    `_fake_decode` dimensions with media_kind='fake'."""
    cols = [c for c in media.columns if c != payload_col]
    pre = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                    for f in media.schema.fields if f.name != payload_col)
    schema = (pre + ", media_kind string, width int, height int, "
              "channels int, px_sum bigint, px_min int, px_max int, "
              "px_mean double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[cols].copy()
            kinds, ws, hs, cs, sums, mins, maxs, means = \
                [], [], [], [], [], [], [], []
            for b in pdf[payload_col]:
                try:
                    kind, px = real_decode(bytes(b))
                    hh, ww, cc = px.shape
                    s = int(px.sum(dtype=np.int64))
                    kinds.append(kind)
                    ws.append(ww)
                    hs.append(hh)
                    cs.append(cc)
                    sums.append(s)
                    mins.append(int(px.min()))
                    maxs.append(int(px.max()))
                    means.append(round(s / px.size, 6))
                except (NotImplementedError, ValueError):
                    k, ww, hh, _ = _fake_decode(bytes(b))
                    kinds.append("fake")
                    ws.append(ww)
                    hs.append(hh)
                    cs.append(0)
                    sums.append(0)
                    mins.append(0)
                    maxs.append(0)
                    means.append(0.0)
            out["media_kind"] = kinds
            out["width"] = ws
            out["height"] = hs
            out["channels"] = cs
            out["px_sum"] = sums
            out["px_min"] = mins
            out["px_max"] = maxs
            out["px_mean"] = means
            yield out

    return media.mapInPandas(kernel, schema=schema)


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
