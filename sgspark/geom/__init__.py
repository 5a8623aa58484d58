"""Pure-numpy geometry kernels (no GEOS available in this environment).

Public surface used by the Spark operators:
  array.GeomArray, array.points, wkb.from_wkb/to_wkb/from_wkt/to_wkt,
  predicates.refine_pairs/geom_pair_distance, buffer.buffer/point_buffer,
  clip.polygon_boolean/clip_ring_convex/union_many.
"""

from .array import (FAMILY_OF, GeomArray, LINESTRING, MULTILINESTRING,  # noqa: F401
                    MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, from_rings, points)
from .buffer import buffer, point_buffer  # noqa: F401
from .clip import (clip_ring_convex, polygon_boolean, ring_area,  # noqa: F401
                   ring_boolean, rings_to_polygons, union_many)
from .predicates import geom_pair_distance, refine_pairs  # noqa: F401
from .wkb import from_wkb, from_wkt, to_wkb, to_wkt  # noqa: F401
