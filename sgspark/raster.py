"""OO raster facade: Band / Image / ImageCollection over tile tables.

The engine's raster model is a DataFrame of tiles
(tile_id, x0, y0, res, nx, ny, values array<double>) processed by the
distributed functions in sgspark.zonal / sgspark.image_collection.
These classes add the reference's method-chaining surface (reference
image_collection.py:772-1001 `Band`, 271-390 `ImageCollectionGroupBy`,
plus the `Image`/`ImageCollection` containers) as THIN wrappers — no
new engine logic, every method delegates to an existing gated function
and returns a new facade over the resulting DataFrame.

Out-of-scope parity (declared): file-path metadata regexes and cloud
masking (reference Sentinel-2 specifics) — the catalog functions in
sgspark.image_collection carry the date/tile/band discovery instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import zonal as Z


class Band:
    """A single raster band as a distributed tile table (reference
    `Band`, image_collection.py:772-1468).  Methods chain: each returns
    a new Band over the transformed tiles DataFrame; nothing collects
    to the driver except the explicitly driver-side accessors
    (`bounds`, `value_counts`)."""

    def __init__(self, tiles: DataFrame, *, band_id: str = "b1",
                 date: str | None = None, tile: str | None = None):
        self.tiles = tiles
        self.band_id = band_id
        self.date = date
        self.tile = tile

    def _wrap(self, tiles: DataFrame) -> "Band":
        return Band(tiles, band_id=self.band_id, date=self.date,
                    tile=self.tile)

    # ---- accessors ---------------------------------------------------
    @property
    def res(self):
        """Pixel resolution (reference Band.res) — from the first tile;
        tiles of one band share it by construction."""
        row = self.tiles.select("res").first()
        return None if row is None else float(row[0])

    def bounds(self) -> tuple:
        """(minx, miny, maxx, maxy) of the band (reference Band.bounds)."""
        r = self.tiles.agg(
            F.min("x0"), F.min("y0"),
            F.max(F.expr("x0 + nx * res")),
            F.max(F.expr("y0 + ny * res"))).first()
        return tuple(float(v) for v in r)

    def value_counts(self, round_to: int = 6):
        """Pixel-value histogram as a pandas Series (reference
        Band.value_counts) — explicit driver materialization."""
        pdf = (self.tiles
               .select(F.explode("values").alias("v"))
               .groupBy(F.round("v", round_to).alias("v"))
               .agg(F.count("*").alias("n"))
               .orderBy(F.col("n").desc(), "v").toPandas())
        return pdf.set_index("v")["n"]

    def load(self) -> "Band":
        """Materialize the tiles executor-locally (reference Band.load
        reads the file into .values; tiles here are already columnar)."""
        return self._wrap(self.tiles.localCheckpoint())

    # ---- transforms (all distributed, all gated functions) ------------
    def clip(self, bbox: tuple) -> "Band":
        return self._wrap(Z.band_clip(self.tiles, bbox))

    def apply(self, fn: str, scale: float = 1.0,
              offset: float = 0.0) -> "Band":
        return self._wrap(Z.band_apply(self.tiles, fn, scale, offset))

    def buffer(self, distance: int) -> "Band":
        return self._wrap(Z.band_buffer(self.tiles, int(distance)))

    def gradient(self, degrees: bool = False) -> "Band":
        out = Z.band_gradient(self.tiles)
        if degrees:
            out = out.withColumn(
                "values", F.expr("transform(values, v -> degrees(atan(v)))"))
        return self._wrap(out)

    def sample(self, size: int = 1000, seed: int = 42) -> DataFrame:
        return Z.band_sample(self.tiles, size, seed)

    def zonal(self, polygons: DataFrame, *, id_col: str = "zone_id",
              stats: tuple = ("count", "sum", "min", "max", "mean"),
              gridsize: float = 1000.0) -> DataFrame:
        return Z.zonal_stats(polygons, self.tiles, id_col=id_col,
                             stats=stats, gridsize=gridsize)

    def to_geopandas(self, column: str = "value") -> DataFrame:
        """Raster -> one point row per pixel (reference
        Band.to_geopandas) — distributed, not a driver GeoDataFrame."""
        out = Z.raster_to_points(self.tiles)
        return out.withColumnRenamed("value", column) \
            if column != "value" else out

    def __repr__(self) -> str:
        return (f"Band(band_id={self.band_id!r}, date={self.date!r}, "
                f"tile={self.tile!r})")


class Image:
    """A date/tile capture holding one Band per band_id (reference
    `Image`, image_collection.py:1471+): `img["B04"]` returns the Band."""

    def __init__(self, bands: dict[str, Band], *, date: str | None = None,
                 tile: str | None = None):
        self.bands = dict(bands)
        self.date = date
        self.tile = tile

    def __getitem__(self, band_id: str) -> Band:
        return self.bands[band_id]

    def __contains__(self, band_id: str) -> bool:
        return band_id in self.bands

    def band_ids(self) -> list[str]:
        return sorted(self.bands)

    def ndvi(self, nir: str = "B08", red: str = "B04") -> Band:
        """(nir - red) / (nir + red) per pixel (reference ndvi)."""
        return Band(Z.ndvi(self.bands[nir].tiles, self.bands[red].tiles),
                    band_id="ndvi", date=self.date, tile=self.tile)

    def __repr__(self) -> str:
        return (f"Image(date={self.date!r}, tile={self.tile!r}, "
                f"bands={self.band_ids()})")


class ImageCollection:
    """A catalog of captures + their tile tables (reference
    `ImageCollection`): filter by date, group-merge across captures,
    and hand out Band facades.

    `catalog`: DataFrame with (path, tile, date, band) rows (the
    discover_images output); `tiles`: the tile table carrying the same
    (tile, date, band) key columns alongside the raster columns."""

    def __init__(self, catalog: DataFrame, tiles: DataFrame):
        self.catalog = catalog
        self.tiles = tiles

    def filter(self, date_ranges=None, bbox: tuple | None = None
               ) -> "ImageCollection":
        from .image_collection import filter_dates
        cat = self.catalog
        if date_ranges is not None:
            cat = filter_dates(cat, date_ranges)
        # tiles link to catalog rows by file path (same key
        # collection_groupby_merge uses)
        t = self.tiles.join(cat.select("path").distinct(), "path",
                            "left_semi")
        if bbox is not None:
            t = Z.band_clip(t, bbox)
        return ImageCollection(cat, t)

    def groupby(self, by: list[str]) -> "_CollectionGroupBy":
        return _CollectionGroupBy(self, list(by))

    def band(self, band_id: str) -> Band:
        paths = self.catalog.where(F.col("band") == band_id) \
            .select("path").distinct()
        return Band(self.tiles.join(paths, "path", "left_semi"),
                    band_id=band_id)

    def __len__(self) -> int:
        return self.catalog.select("tile", "date").distinct().count()

    def __repr__(self) -> str:
        return f"ImageCollection(images={len(self)})"


class _CollectionGroupBy:
    """reference `ImageCollectionGroupBy` (image_collection.py:271-390):
    merge captures within groups via the distributed per-pixel merge."""

    def __init__(self, collection: ImageCollection, by: list[str]):
        self.collection = collection
        self.by = by

    def merge(self, how: str = "mean") -> DataFrame:
        from .image_collection import collection_groupby_merge
        return collection_groupby_merge(self.collection.catalog,
                                        self.collection.tiles,
                                        by=self.by, how=how)

    def merge_by_band(self, how: str = "mean") -> DataFrame:
        return _CollectionGroupBy(
            self.collection, sorted(set(self.by) | {"band"})).merge(how)
