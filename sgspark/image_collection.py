"""ImageCollection discovery + groupby-merge — the reference's path-regex
catalog model re-expressed as DataFrames.

Reference: `/root/reference/src/sgis/raster/image_collection.py` —
`DEFAULT_FILENAME_REGEX` / `DEFAULT_IMAGE_REGEX` (lines 126-135) extract
(date, band) from file names and (date,) from image directory names;
`ImageCollection.groupby` + `ImageCollectionGroupBy.merge(_by_band)`
(lines 271-390, 2129-2180) merge each group's arrays with a method
("mean"/"median"/"max"/...).

Spark-first shape: discovery is a CATALOG DataFrame (one row per band
file: path, image_dir, date, band, tile) built with `regexp_extract` —
pure JVM, no Python in the listing path; a collection of a billion files
is just a big DataFrame.  groupby().merge() composes the catalog with the
tile table (`sgspark.zonal` schema: x0 y0 res nx ny values) and
`merge_tiles`: grouping keys come from the catalog, pixel math from the
existing halo-free merge kernel.  The raster decode step stays a loader
callback (this container has no rasterio; parquet-backed tile tables are
the storage twin, `SURVEY.md` §7.4.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Spark regexp_extract needs numbered groups; these are the reference's
# named groups (image_collection.py:126-135) rewritten positionally.
DATE_REGEX = r"(\d{8}(?:T\d{6})?)"
BAND_REGEX = r"_(B\d{1,2}A|B\d{1,2})"
TILE_REGEX = r"_(T\d{2}[A-Z]{3})"
FILE_SUFFIX = r"\.(?:tif|tiff|jp2)$"


def discover_images(files: DataFrame, path_col: str = "path") -> DataFrame:
    """Catalog a listing (one row per file path) into
    (path, image_dir, filename, date, band, tile).

    Matches the reference's regex semantics: date/band/tile parsed from
    the FILE name when present, falling back to the parent image
    directory name for the date (reference `Band.date`,
    image_collection.py:978-985: filename_patterns + image_patterns).
    Non-raster files (no .tif/.tiff/.jp2 suffix) are dropped."""
    df = files.where(F.col(path_col).rlike(FILE_SUFFIX))
    fname = F.element_at(F.split(F.col(path_col), "/"), -1)
    image_dir = F.element_at(F.split(F.col(path_col), "/"), -2)
    date_file = F.regexp_extract(fname, DATE_REGEX, 1)
    date_dir = F.regexp_extract(image_dir, DATE_REGEX, 1)
    return df.select(
        F.col(path_col).alias("path"),
        image_dir.alias("image_dir"),
        fname.alias("filename"),
        F.when(date_file != "", date_file)
         .when(date_dir != "", date_dir).alias("date"),
        F.nullif(F.regexp_extract(fname, BAND_REGEX, 1), F.lit(""))
         .alias("band"),
        F.nullif(F.regexp_extract(fname, TILE_REGEX, 1), F.lit(""))
         .alias("tile"))


def discover_images_fs(spark, path_glob: str) -> DataFrame:
    """Discovery straight from the filesystem (reference `_glob_func`,
    image_collection.py:100-117) via the Hadoop FS listing already used by
    `check_files`."""
    from .io import check_files
    pdf = check_files(spark, path_glob)
    return discover_images(spark.createDataFrame(pdf[["path"]]))


def filter_dates(catalog: DataFrame, date_ranges) -> DataFrame:
    """Reference `ImageCollection.filter(date_ranges=...)`
    (image_collection.py:2276-2292 / _filter_dates): keep rows whose date
    falls in ANY (from, to) range; None = open end."""
    if not isinstance(date_ranges[0], (tuple, list)):
        date_ranges = (date_ranges,)
    cond = None
    for lo, hi in date_ranges:
        c = F.lit(True)
        if lo is not None:
            c = c & (F.col("date") >= str(lo).replace("-", ""))
        if hi is not None:
            c = c & (F.col("date") <= str(hi).replace("-", ""))
        cond = c if cond is None else (cond | c)
    return catalog.where(cond)


def collection_groupby_merge(catalog: DataFrame, tiles: DataFrame,
                             by: list[str], how: str = "mean",
                             tile_key: str = "path") -> DataFrame:
    """`collection.groupby(by).merge(method=how)` — reference
    ImageCollectionGroupBy.merge / merge_by_band (image_collection.py:
    295-390): one merged raster per group.

    `tiles` carries the pixel arrays (zonal tile schema + `tile_key`
    linking each tile row to its catalog file row).  Grouping keys come
    from the catalog (regex-derived), pixel aggregation from merge_tiles
    (per-pixel mean/median/min/max/sum across each group's overlapping
    tiles).  merge_by_band == groupby [...,'band'] by construction."""
    cat = catalog.select(F.col("path").alias(tile_key), *by)
    joined = tiles.join(cat, tile_key)
    from .zonal import merge_tiles
    return merge_tiles(joined.drop(tile_key), by=by, how=how)
