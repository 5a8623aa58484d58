"""Reference-parity naming layer: make_all_singlepart / to_single_geom_type /
split_geom_types (reference geometry_types.py:12-136, general.py:41-44),
sort_large_first/sort_small_first (general.py:287-393), and
get_component_size (finding_isolated_networks.py:66-104).

Mirrors the reference's tests/test_geometry_types.py fixtures: a mixed
point + line + polygon frame, then the same frame dissolved into a
GEOMETRYCOLLECTION (built at the WKB byte level here — collections only
exist transiently, the engine's model is single-family per row).
"""

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from sgspark.geom.wkb import flatten_collections, from_wkt, to_wkb, wkb_gtype
from sgspark.geometry_types import (make_all_singlepart, split_geom_types,
                                    to_single_geom_type, wkb_gtype_col)

WKTS = [
    "POINT (0 0)",
    "LINESTRING (1 1, 2 2)",
    "POLYGON ((3 3, 4 4, 3 4, 3 3))",
    "MULTIPOINT (5 5, 6 6)",
    "MULTILINESTRING ((7 7, 8 8), (9 9, 10 10))",
]


def _wkb_rows():
    return to_wkb(from_wkt(WKTS))


def _collection(children: list[bytes]) -> bytes:
    return (b"\x01" + struct.pack("<I", 7) + struct.pack("<I", len(children))
            + b"".join(children))


def _mixed_df(spark, with_collection=False):
    blobs = _wkb_rows()
    if with_collection:
        blobs = blobs + [_collection(blobs[:3])]
    schema = T.StructType([T.StructField("gid", T.LongType()),
                           T.StructField("geometry", T.BinaryType())])
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], schema)


def test_wkb_gtype_col_matches_python(spark):
    df = _mixed_df(spark, with_collection=True)
    got = {r["gid"]: r["gt"] for r in
           df.select("gid", wkb_gtype_col().alias("gt")).collect()}
    blobs = _wkb_rows() + [_collection(_wkb_rows()[:3])]
    assert got == {i: wkb_gtype(b) for i, b in enumerate(blobs)}


def test_wkb_gtype_col_big_endian(spark):
    # byte-order marker 0: type code sits in the header's LAST byte
    be_point = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 1.0, 2.0)
    df = spark.createDataFrame(
        [(0, bytearray(be_point))],
        T.StructType([T.StructField("gid", T.LongType()),
                      T.StructField("geometry", T.BinaryType())]))
    assert df.select(wkb_gtype_col().alias("gt")).first()["gt"] == 1


def test_make_all_singlepart_explodes_collections(spark):
    df = _mixed_df(spark, with_collection=True)
    out = make_all_singlepart(df)
    rows = out.select("gid", wkb_gtype_col().alias("gt")).collect()
    # 5 originals -> 1+1+1+2+2 = 7 parts; collection -> 3 more singleparts
    assert len(rows) == 10
    assert all(r["gt"] in (1, 2, 3) for r in rows)
    from collections import Counter
    assert Counter(r["gid"] for r in rows) == {0: 1, 1: 1, 2: 1, 3: 2,
                                               4: 2, 5: 3}


def test_to_single_geom_type_families(spark):
    df = _mixed_df(spark, with_collection=True)
    line = to_single_geom_type(df, "line")
    # row 1 (LINESTRING), row 4 (MULTILINESTRING kept multi),
    # + the collection's exploded LINESTRING child
    got = sorted((r["gid"], r["gt"]) for r in
                 line.select("gid", wkb_gtype_col().alias("gt")).collect())
    assert got == [(1, 2), (4, 5), (5, 2)]
    poly = to_single_geom_type(df, "polygon")
    assert sorted(r["gid"] for r in poly.select("gid").collect()) == [2, 5]
    pt = to_single_geom_type(df, "point")
    assert sorted(r["gid"] for r in pt.select("gid").collect()) == [0, 3, 5]
    with pytest.raises(ValueError):
        to_single_geom_type(df, "surface")


def test_split_geom_types(spark):
    df = _mixed_df(spark)
    splits = split_geom_types(df)
    assert len(splits) == 5  # five distinct WKB types present
    counts = sorted(s.count() for s in splits)
    assert counts == [1, 1, 1, 1, 1]
    assert sum(s.count() for s in splits) == df.count()


def test_flatten_collections_nested():
    blobs = _wkb_rows()
    nested = _collection([_collection(blobs[:2]), blobs[2]])
    kids = flatten_collections(nested)
    assert [wkb_gtype(k) for k in kids] == [1, 2, 3]


def test_sort_large_small_first(spark):
    from sgspark.conversion import sort_large_first, sort_small_first
    wkts = ["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",     # area 4
            "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",     # area 1
            "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"]     # area 9
    blobs = to_wkb(from_wkt(wkts))
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)],
        T.StructType([T.StructField("gid", T.LongType()),
                      T.StructField("geometry", T.BinaryType())]))
    assert [r["gid"] for r in sort_large_first(df).collect()] == [2, 0, 1]
    assert [r["gid"] for r in sort_small_first(df).collect()] == [1, 0, 2]
    areas = [r["area_col"] for r in sort_large_first(df).collect()]
    assert areas == [9.0, 4.0, 1.0]


def test_get_component_size(spark):
    from sgspark.network import get_component_size
    edges = spark.createDataFrame(
        pd.DataFrame({
            "source": ["a", "b", "x", "p"],
            "target": ["b", "c", "y", "q"],
            "length": [1.0, 1.0, 1.0, 1.0],
        }))
    out = get_component_size(edges)
    sizes = {(r["source"], r["target"]): r["component_size"]
             for r in out.collect()}
    assert sizes[("a", "b")] == 3 and sizes[("b", "c")] == 3
    assert sizes[("x", "y")] == 2 and sizes[("p", "q")] == 2
    assert "component_index" in out.columns
