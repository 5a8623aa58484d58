"""Reference-parity geometry-type APIs.

Named twins of the reference's type-normalization helpers
(`geometry_types.py:12-136`, `general.py:41-44`): `make_all_singlepart`,
`to_single_geom_type`, `split_geom_types`.  The engine's geometry model is
already single-family per row (the `geom_kind` column), but users porting
reference code expect these names and their GeometryCollection-explode-first
nuance.

Type dispatch is JVM-side: the WKB header's type code is read with
`substring`/`conv` codegen expressions (plain ISO WKB, both byte orders),
so filtering by geometry family never leaves whole-stage codegen.  Only the
rare collection-explode path runs an Arrow kernel, and only over the
collection rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# family name -> WKB type codes (LinearRing has no WKB code; lines cover it)
_FAMILY_CODES = {"polygon": (3, 6), "line": (2, 5), "point": (1, 4)}


def wkb_gtype_col(geometry: str = "geometry") -> Column:
    """WKB geometry-type code (1..7) as a codegen Column.

    Decodes the FULL uint32 type field (byte-order marker selects byte
    order), masks EWKB dimension/SRID flag bits (0xE0000000) and
    normalizes ISO 3D/M codes with ``pmod(.., 1000)`` — matching the
    Python twin ``wkb_gtype`` — so ISO 1003 (PolygonZ) classifies as 3,
    not as its low byte 235, and EWKB-flagged inputs classify by base
    type instead of garbage."""
    g = geometry
    le = (f"conv(concat(hex(substring({g},5,1)), hex(substring({g},4,1)), "
          f"hex(substring({g},3,1)), hex(substring({g},2,1))), 16, 10)")
    be = f"conv(hex(substring({g},2,4)), 16, 10)"
    raw = (f"cast((CASE WHEN hex(substring({g},1,1)) = '01' THEN {le} "
           f"ELSE {be} END) AS bigint)")
    return F.expr(
        f"CASE WHEN {g} IS NULL OR length({g}) < 5 THEN 1 "
        f"ELSE cast(pmod(({raw} & 536870911), 1000) AS int) END"
    )


def make_all_singlepart(df: DataFrame, geometry: str = "geometry",
                        index_parts: bool = False,
                        ignore_index: bool = False) -> DataFrame:
    """Make all geometries single part (reference `make_all_singlepart`,
    geometry_types.py:12-36: explode until nothing multi remains —
    GeometryCollections explode recursively).  `index_parts` /
    `ignore_index` are accepted for drop-in signature compatibility;
    DataFrames carry no pandas index, so both are no-ops beyond the
    explode itself."""
    from .dissolve import explode_parts
    return explode_parts(df, geometry)


def to_single_geom_type(df: DataFrame, geom_type: str,
                        geometry: str = "geometry") -> DataFrame:
    """Keep only the given geometry family (reference `to_single_geom_type`,
    geometry_types.py:39-136): GeometryCollections are exploded to
    singleparts first and their children then filtered; multipart AND
    singlepart members of the family are kept."""
    fam = next((k for k in _FAMILY_CODES if k in geom_type), None)
    if fam is None:
        raise ValueError(
            f"Invalid geom_type {geom_type!r}. "
            "Should be 'polygon', 'line' or 'point'")
    code = wkb_gtype_col(geometry)
    collections = df.where(code == 7)
    exploded = make_all_singlepart(collections, geometry)
    both = df.unionByName(exploded)
    return both.where(wkb_gtype_col(geometry).isin(
        list(_FAMILY_CODES[fam])))


def get_geom_type(df: DataFrame, geometry: str = "geometry") -> str:
    """The 3-family geometry type of a layer: "polygon", "line", "point"
    or "mixed" (reference `get_geom_type`, geometry_types.py:146-186 —
    NULL/empty rows don't break family purity there either: its family
    lists include None).  One tiny distinct aggregate (<= 7 rows)."""
    code = wkb_gtype_col(geometry)
    # NULL geometries are family-neutral in the reference (None sits in
    # every family list), so exclude them before the subset checks; the
    # check order (polygon, line, point) mirrors the reference's.
    present = {int(r[0]) for r in
               df.where(F.col(geometry).isNotNull())
               .select(code.alias("gt")).distinct().collect()}
    for fam in ("polygon", "line", "point"):
        if present <= set(_FAMILY_CODES[fam]):
            return fam
    return "mixed"


def is_single_geom_type(df: DataFrame, geometry: str = "geometry") -> bool:
    """True when all geometries are one family — multipart and singlepart
    count as the same type (reference `is_single_geom_type`,
    geometry_types.py:189-222)."""
    return get_geom_type(df, geometry) != "mixed"


def split_geom_types(df: DataFrame, geometry: str = "geometry"
                     ) -> tuple[DataFrame, ...]:
    """One DataFrame per distinct geometry type present (reference
    `split_geom_types`, general.py:41-44).  The distinct-type probe is one
    tiny aggregate (<=7 rows) — legitimately driver-sized."""
    code = wkb_gtype_col(geometry)
    present = sorted(
        r[0] for r in
        df.select(code.alias("gt")).distinct().collect())
    return tuple(df.where(code == int(t)) for t in present)
