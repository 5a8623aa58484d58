"""Kill-and-resume equivalence on a REAL spatial job (BASELINE.md protocol):
the bucketed checkpoint runner executes the tile-assignment + PIP-join
pipeline bucket by bucket; a killed run (2 of 6 buckets) resumed must equal
the fresh run row-for-row, and the manifest must carry lineage metrics."""

import pandas as pd
from pyspark.sql import functions as F

from sgspark.checkpoint import metrics, read_result, run_checkpointed
from sgspark.io import extract_geometries, wkt_to_wkb_df
from sgspark.joins import sjoin_pairs
from sgspark.tiling import add_grid_id


def _pipeline_factory(zones):
    zones_pdf = zones.cache()

    def transform(docs_part):
        geo = extract_geometries(docs_part)
        pts = geo.where("geom_kind = 'point' AND span_pos = 1")
        tiled = add_grid_id(pts.withColumnRenamed("minx", "x")
                            .withColumnRenamed("miny", "y"), 1000,
                            out_col="tile_id")
        pairs = sjoin_pairs(
            pts, zones_pdf, "within", left_id="doc_index", right_id="zone_id")
        return tiled.select("doc_index", "tile_id").join(pairs, "doc_index",
                                                         "left")

    return transform


def test_spatial_resume_equals_fresh(spark, docs500, zones50, tmp_path):
    zones = wkt_to_wkb_df(zones50)
    transform = _pipeline_factory(zones)

    fresh = str(tmp_path / "fresh")
    n = run_checkpointed(spark, docs500, transform, key_col="doc_id",
                         path=fresh, job_id="spatial", n_buckets=6)
    assert n == 6
    want = read_result(spark, fresh).orderBy("doc_index", "zone_id").toPandas()

    part = str(tmp_path / "killed")
    assert run_checkpointed(spark, docs500, transform, key_col="doc_id",
                            path=part, job_id="spatial", n_buckets=6,
                            max_buckets=2) == 2
    # resume
    assert run_checkpointed(spark, docs500, transform, key_col="doc_id",
                            path=part, job_id="spatial", n_buckets=6) == 4
    got = read_result(spark, part).orderBy("doc_index", "zone_id").toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))
    m = metrics(spark, part).toPandas()
    assert len(m) == 6 and (m.rows_out > 0).any()
    assert m.rows_in.sum() == 500
