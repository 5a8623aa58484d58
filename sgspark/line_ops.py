"""Line operations: cutting/segmenting.

Reference: `cut_lines` / `cut_lines_once` / `split_lines_by_nearest_point`
(`/root/reference/src/sgis/networkanalysis/cutting_lines.py:22-278`).

Per-row kernels (no shuffle): each LineString is resampled into pieces of
at most `max_length`, preserving vertices; `split_lines_by_nearest_point`
composes the snap join (point_ops) with a per-line split kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .geom.array import LINESTRING, from_rings
from .geom.wkb import from_wkb, to_wkb


def _cut_chain(chain: np.ndarray, max_len: float) -> list[np.ndarray]:
    """Cut a polyline into pieces of length <= max_len, inserting split
    points on segments (reference cut_lines semantics)."""
    pieces = []
    cur = [chain[0]]
    budget = max_len
    i = 0
    p = chain[0].astype(float)
    while i < len(chain) - 1:
        q = chain[i + 1].astype(float)
        seg = np.hypot(*(q - p))
        if seg <= budget + 1e-12:
            cur.append(q)
            budget -= seg
            p = q
            i += 1
            if budget <= 1e-12 and (i < len(chain) - 1):
                pieces.append(np.asarray(cur))
                cur = [q]
                budget = max_len
        else:
            t = budget / seg
            mid = p + t * (q - p)
            cur.append(mid)
            pieces.append(np.asarray(cur))
            cur = [mid]
            budget = max_len
            p = mid
    if len(cur) >= 2:
        pieces.append(np.asarray(cur))
    return pieces


def cut_lines(df: DataFrame, max_length: float, *,
              geometry: str = "geometry") -> DataFrame:
    """Segment every line into pieces of at most max_length
    (cut_lines, cutting_lines.py:22-141).  Output adds `piece_idx`."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", piece_idx int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            src, blobs, pidx = [], [], []
            for g in range(len(ga)):
                chains = ga.rings_of_geom(g)
                k = 0
                for c in chains:
                    if len(c) < 2:
                        continue
                    for piece in _cut_chain(c, float(max_length)):
                        src.append(g)
                        blobs.append(to_wkb(from_rings([[piece]],
                                                       [LINESTRING]))[0])
                        pidx.append(k)
                        k += 1
            if not src:
                continue
            out = pdf.iloc[src].copy()
            out[geometry] = blobs
            out["piece_idx"] = pidx
            yield out

    return df.mapInPandas(kernel, schema=schema)


def cut_lines_once(df: DataFrame, fraction: float = 0.5, *,
                   geometry: str = "geometry") -> DataFrame:
    """Split each line once at `fraction` of its length
    (cut_lines_once, cutting_lines.py:143-214)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", piece_idx int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            lens = ga.length()
            src, blobs, pidx = [], [], []
            for g in range(len(ga)):
                c = ga.rings_of_geom(g)[0]
                pieces = _cut_chain(c, max(float(lens[g]) * fraction, 1e-12))
                # keep first piece + remainder merged
                if len(pieces) <= 1:
                    parts = pieces
                else:
                    rest = np.vstack([pieces[1][:1]] +
                                     [p[1:] for p in pieces[1:]])
                    parts = [pieces[0], rest]
                for k, piece in enumerate(parts):
                    src.append(g)
                    blobs.append(to_wkb(from_rings([[piece]],
                                                   [LINESTRING]))[0])
                    pidx.append(k)
            out = pdf.iloc[src].copy()
            out[geometry] = blobs
            out["piece_idx"] = pidx
            yield out

    return df.mapInPandas(kernel, schema=schema)
