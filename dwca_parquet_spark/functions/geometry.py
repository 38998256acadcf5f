"""Geometry primitives without a geometry engine.

The reference produces a real geometry column via DuckDB spatial's
``ST_GeomFromText`` / ``ST_Point`` (``/root/reference/src/dwca_parquet/
templates/query.sql:1``) and writes (Geo)Parquet that OGR consumes
downstream (``libs/geoapi.py:53-62``). Neither Sedona nor shapely is
available in this environment, so the engine carries geometry as:

- validated WKT text (bulk-friendly: validation is a JVM regex in the scan
  stage — malformed input degrades to NULL instead of failing the job, the
  behavior you want at 100 TB where one bad row must not kill a pipeline);
- WKB binary for the GeoParquet contract (sinks/geoparquet.py), produced by
  a self-contained WKT parser running as an Arrow-batched pandas UDF.

Swapping in Sedona later replaces ``validate_wkt``/``wkt_to_wkb`` with
``ST_GeomFromText`` and its native GeoParquet writer; nothing upstream
changes.
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

# WKB geometry type codes (little-endian, 2D).
_WKB_TYPES = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
}

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_PT = rf"{_NUM}\s+{_NUM}"                       # "x y"
_RING = rf"\(\s*{_PT}(?:\s*,\s*{_PT})*\s*\)"    # "(x y, x y, …)"

# Structural validators per type (2D, non-EMPTY). Anchored and total: a
# string either matches the full grammar for its declared type or it is not
# valid WKT for our purposes.
_WKT_PATTERNS = {
    "POINT": rf"POINT\s*\(\s*{_PT}\s*\)",
    "LINESTRING": rf"LINESTRING\s*{_RING}",
    "POLYGON": rf"POLYGON\s*\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\)",
    "MULTIPOINT": rf"MULTIPOINT\s*\(\s*(?:{_PT}|\(\s*{_PT}\s*\))"
    rf"(?:\s*,\s*(?:{_PT}|\(\s*{_PT}\s*\)))*\s*\)",
    "MULTILINESTRING": rf"MULTILINESTRING\s*\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\)",
    "MULTIPOLYGON": rf"MULTIPOLYGON\s*\(\s*\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\)"
    rf"(?:\s*,\s*\(\s*{_RING}(?:\s*,\s*{_RING})*\s*\))*\s*\)",
}

_FULL_WKT_RE = "^\\s*(?:" + "|".join(_WKT_PATTERNS.values()) + ")\\s*$"


def validate_wkt(col: Column) -> Column:
    """WKT string → itself if structurally valid, else NULL.

    Catalyst ``rlike`` against the full 2D simple-features grammar — pure
    JVM, codegens into the scan stage, no shuffle. Mirrors the *null-in →
    null-out* half of ST_GeomFromText while replacing its throw-on-garbage
    half with NULL (at scale a malformed row must not kill the job).
    """
    up = F.upper(F.trim(col))
    return F.when(up.rlike(_FULL_WKT_RE), F.trim(col))


def geometry_type(col: Column) -> Column:
    """Leading WKT keyword (POINT, POLYGON, …) or NULL — used for GeoParquet
    ``geometry_types`` metadata aggregation."""
    return F.upper(F.regexp_extract(F.trim(col), r"^\s*([A-Za-z]+)", 1))


# ---------------------------------------------------------------------------
# WKT → WKB (self-contained parser; runs Arrow-batched on executors)
# ---------------------------------------------------------------------------


def _parse_points(body: str) -> list[tuple[float, float]]:
    pts = []
    for pair in body.split(","):
        xy = pair.replace("(", " ").replace(")", " ").split()
        pts.append((float(xy[0]), float(xy[1])))
    return pts


def _split_rings(body: str) -> list[str]:
    """Split "(…), (…)" at depth-0 commas; returns inner ring bodies."""
    rings, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                rings.append(body[start:i])
    return rings


def wkt_to_wkb_py(wkt: str | None) -> bytes | None:
    """One WKT string → little-endian 2D WKB. None/invalid/EMPTY → None."""
    if not wkt:
        return None
    s = wkt.strip()
    m = s.split(None, 1) if "(" not in s.split(" ", 1)[0] else [s[: s.index("(")], s[s.index("("):]]
    gtype = m[0].strip().upper()
    if gtype not in _WKB_TYPES or len(m) < 2 or "EMPTY" in s.upper():
        return None
    body = m[1].strip()
    if not (body.startswith("(") and body.endswith(")")):
        return None
    inner = body[1:-1]
    code = _WKB_TYPES[gtype]
    head = struct.pack("<BI", 1, code)
    try:
        if gtype == "POINT":
            (pt,) = _parse_points(inner)
            return head + struct.pack("<2d", *pt)
        if gtype == "LINESTRING":
            pts = _parse_points(inner)
            return head + struct.pack("<I", len(pts)) + b"".join(
                struct.pack("<2d", *p) for p in pts
            )
        if gtype == "POLYGON":
            rings = [_parse_points(r) for r in _split_rings(inner)]
            out = head + struct.pack("<I", len(rings))
            for ring in rings:
                out += struct.pack("<I", len(ring)) + b"".join(
                    struct.pack("<2d", *p) for p in ring
                )
            return out
        if gtype == "MULTIPOINT":
            pts = _parse_points(inner)
            out = head + struct.pack("<I", len(pts))
            for p in pts:
                out += struct.pack("<BI2d", 1, 1, *p)
            return out
        if gtype == "MULTILINESTRING":
            lines = [_parse_points(r) for r in _split_rings(inner)]
            out = head + struct.pack("<I", len(lines))
            for pts in lines:
                out += struct.pack("<BII", 1, 2, len(pts)) + b"".join(
                    struct.pack("<2d", *p) for p in pts
                )
            return out
        if gtype == "MULTIPOLYGON":
            polys = [
                [_parse_points(r) for r in _split_rings(poly)]
                for poly in _split_rings(inner)
            ]
            out = head + struct.pack("<I", len(polys))
            for rings in polys:
                out += struct.pack("<BII", 1, 3, len(rings))
                for ring in rings:
                    out += struct.pack("<I", len(ring)) + b"".join(
                        struct.pack("<2d", *p) for p in ring
                    )
            return out
    except (ValueError, IndexError):
        return None
    return None


@pandas_udf(BinaryType())
def _wkt_to_wkb_udf(wkt: pd.Series) -> pd.Series:
    return wkt.map(wkt_to_wkb_py)


def wkt_to_wkb(col: Column) -> Column:
    """WKT string column → WKB binary column (Arrow-batched on executors).

    Geometry strings are short relative to document text, so unlike the
    near-dup verify the per-row transfer here is genuinely the payload, not
    overhead; a Sedona deployment swaps this for a JVM expression.
    """
    return _wkt_to_wkb_udf(col)


# ---------------------------------------------------------------------------
# Point analytics (the dominant DwC-A case: occurrence coordinates).
# A real geometry engine (Sedona) owns polygons/CRS; these JVM-expression
# helpers cover what occurrence pipelines actually run — coordinate
# extraction, bbox predicates, great-circle distance — without leaving
# whole-stage codegen.
# ---------------------------------------------------------------------------

_POINT_XY_RE = rf"^\s*POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)\s*$"


def point_x(col: Column) -> Column:
    """X (longitude) of a WKT POINT, NULL for non-points/invalid WKT."""
    x = F.regexp_extract(F.upper(F.trim(col)), _POINT_XY_RE, 1)
    return F.when(x != "", x.cast("double"))


def point_y(col: Column) -> Column:
    """Y (latitude) of a WKT POINT, NULL for non-points/invalid WKT."""
    y = F.regexp_extract(F.upper(F.trim(col)), _POINT_XY_RE, 2)
    return F.when(y != "", y.cast("double"))


def within_bbox(
    col: Column, minx: float, miny: float, maxx: float, maxy: float
) -> Column:
    """Boolean: WKT POINT inside [minx,miny,maxx,maxy] (inclusive edges,
    the GeoParquet/EML bbox convention). NULL geometry / non-point → false,
    so the predicate is filter-safe. Pure regexp + compare — pushes into
    the scan stage; at 100 TB pair it with write_clustered on (x, y) so
    file-level min-max statistics prune before the predicate even runs."""
    x, y = point_x(col), point_y(col)
    inside = (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
    return F.coalesce(inside, F.lit(False))


def haversine_km(
    lon_a: Column, lat_a: Column, lon_b: Column, lat_b: Column
) -> Column:
    """Great-circle distance in km (haversine, R=6371.0088 — the IUGG mean
    earth radius). All JVM trig built-ins; accuracy ~0.5% vs ellipsoidal,
    the standard trade for proximity filtering/joins at scale."""
    r = 6371.0088
    la, lb = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b - lat_a)
    dlon = F.radians(lon_b - lon_a)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(la) * F.cos(lb) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * r * F.asin(F.sqrt(a))
