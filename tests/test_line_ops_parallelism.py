"""Line cutting + cross-parallelism result invariance (subprocess-based)."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from sgspark.geom import from_wkb
from sgspark.io import wkt_to_wkb_df
from sgspark.line_ops import cut_lines, cut_lines_once


def test_cut_lines_lengths(spark):
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "gid": [0, 1],
        "geometry_wkt": ["LINESTRING (0 0, 100 0)",
                         "LINESTRING (0 0, 30 40, 60 80)"]})))
    out = cut_lines(df, 30.0).toPandas()
    ga = from_wkb(list(out.geometry))
    lens = ga.length()
    assert (lens <= 30.0 + 1e-9).all()
    # total length conserved per gid
    g0 = lens[out.gid.to_numpy() == 0].sum()
    assert g0 == pytest.approx(100.0)
    g1 = lens[out.gid.to_numpy() == 1].sum()
    assert g1 == pytest.approx(100.0)
    assert (out[out.gid == 0].piece_idx.sort_values().tolist()
            == list(range(4)))


def test_cut_lines_once(spark):
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "gid": [0], "geometry_wkt": ["LINESTRING (0 0, 100 0)"]})))
    out = cut_lines_once(df, 0.25).toPandas()
    assert len(out) == 2
    lens = np.sort(from_wkb(list(out.geometry)).length())
    assert np.allclose(lens, [25.0, 75.0])


_SCRIPT = r"""
import json, sys
from sgspark.session import get_spark
from sgspark.synth import synth_documents, synth_zones
from sgspark.io import extract_geometries, wkt_to_wkb_df
from sgspark.joins import sjoin_pairs
from pyspark.sql import functions as F
cores = int(sys.argv[1])
spark = get_spark("inv", cores=cores, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
docs = synth_documents(spark, 2000)
geo = extract_geometries(docs)
pts = geo.where("geom_kind = 'point' AND span_pos = 1")
zones = wkt_to_wkb_df(synth_zones(spark, 200))
pairs = sjoin_pairs(pts, zones, "within", left_id="doc_index",
                    right_id="zone_id")
row = pairs.agg(F.count("*").alias("n"),
                F.expr("bit_xor(doc_index * 1000003 + zone_id)").alias("chk")
                ).first()
print(json.dumps({"n": row["n"], "chk": row["chk"]}))
"""


def test_parallelism_invariance_subprocess():
    """Same job at local[2] and local[8]: identical row count AND content
    checksum — the N vs 4N result-equivalence contract (BASELINE.md)."""
    results = []
    for cores in (2, 8):
        out = subprocess.run([sys.executable, "-c", _SCRIPT, str(cores)],
                             capture_output=True, text=True, timeout=600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    assert results[0] == results[1]
    assert results[0]["n"] > 0
