"""sgspark — a from-scratch PySpark-native spatial-join + tiling engine with
the query/data-processing capabilities of statisticsnorway/ssb-sgis.

Architecture (SURVEY.md §1.7/§7): DataFrames carry geometry as WKB
BinaryType columns plus bbox stats columns; spatial joins are cell-prefix
hash joins (sgspark.cells) refined by Arrow-batched numpy kernels
(sgspark.geom); tile semantics replicate the reference's SSB grid
arithmetic exactly.  No per-row Python; no GeoPandas.
"""

__version__ = "0.1.0"
