"""Geometry tests: WKT validation (malformed → NULL), WKT→WKB byte
correctness against hand-computed encodings, and the GeoParquet sink's
``geo`` footer metadata (SURVEY §4.3), including the DwC-A e2e output."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

import tests.dwca_fixtures as FX
from dwca_parquet_spark.functions.geometry import (
    validate_wkt,
    wkt_to_wkb_py,
)
from dwca_parquet_spark.plans.flatten import dwca_flatten
from dwca_parquet_spark.sinks.geoparquet import write_geoparquet
from dwca_parquet_spark.sources.dwca import read_dwca

VALID = [
    "POINT (30 10)",
    "POINT (-1.5 2.25e1)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT ((10 40), (40 30))",
    "MULTIPOINT (10 40, 40 30)",
    "MULTILINESTRING ((10 10, 20 20), (40 40, 30 30))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)))",
    "  point (1 2)  ",  # case/space tolerant
]

INVALID = [
    "",
    "banana",
    "POINT 30 10",
    "POINT (30)",
    "POINT (a b)",
    "POLYGON (30 10, 40 40)",  # missing ring parens
    "POINT ((30 10)",  # unbalanced
    "POINT EMPTY",  # EMPTY unsupported by design
    "LINESTRING ()",
]


def test_validate_wkt(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(VALID + INVALID)], "i long, wkt string"
    )
    out = {r["i"]: r["v"] for r in df.select("i", validate_wkt(F.col("wkt")).alias("v")).collect()}
    for i in range(len(VALID)):
        assert out[i] is not None, VALID[i]
    for j in range(len(VALID), len(VALID) + len(INVALID)):
        assert out[j] is None, INVALID[j - len(VALID)]


def test_wkb_point_bytes():
    # POINT (1 2): 01 01000000 + two little-endian doubles
    expected = struct.pack("<BI2d", 1, 1, 1.0, 2.0)
    assert wkt_to_wkb_py("POINT (1 2)") == expected
    assert wkt_to_wkb_py(None) is None
    assert wkt_to_wkb_py("garbage") is None


def test_wkb_polygon_bytes():
    wkb = wkt_to_wkb_py("POLYGON ((0 0, 4 0, 4 4, 0 0))")
    assert wkb is not None
    order, code = struct.unpack_from("<BI", wkb)
    assert (order, code) == (1, 3)
    (nrings,) = struct.unpack_from("<I", wkb, 5)
    assert nrings == 1
    (npts,) = struct.unpack_from("<I", wkb, 9)
    assert npts == 4
    assert struct.unpack_from("<2d", wkb, 13) == (0.0, 0.0)


def test_wkb_multipolygon_roundtrip_structure():
    wkb = wkt_to_wkb_py(
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((1 1, 2 1, 2 2, 1 1)))"
    )
    order, code, n = struct.unpack_from("<BII", wkb)
    assert (order, code, n) == (1, 6, 2)


def test_geoparquet_sink(spark, tmp_path):
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [
            (1, "POINT (4.5 60.0)"),
            (2, "POINT (10.0 63.5)"),
            (3, "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
            (4, None),
        ],
        "fid long, geom string",
    )
    out = write_geoparquet(df, tmp_path / "geo.parquet")
    meta = pq.read_table(out).schema.metadata
    geo = json.loads(meta[b"geo"])
    assert geo["version"] == "1.0.0"
    assert geo["primary_column"] == "geom"
    col = geo["columns"]["geom"]
    assert col["encoding"] == "WKB"
    assert set(col["geometry_types"]) == {"Point", "Polygon"}
    # bbox over the POINT rows
    assert col["bbox"] == [4.5, 60.0, 10.0, 63.5]
    # geometry column is binary WKB now
    table = pq.read_table(out)
    wkbs = table.column("geom").to_pylist()
    assert wkbs[0] == wkt_to_wkb_py("POINT (4.5 60.0)")
    assert wkbs[3] is None


def test_geoparquet_sink_file_uri(spark, tmp_path):
    """file:// URI takes the Hadoop-FS staging path (the same dispatch an
    s3a:// output takes: glob parts → copyToLocalFile → pyarrow footer
    rewrite → copyFromLocalFile), and the geo metadata must still land."""
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(1, "POINT (4.5 60.0)"), (2, "POINT (10.0 63.5)")],
        "fid long, geom string",
    )
    uri = f"file://{tmp_path}/geo_uri.parquet"
    out = write_geoparquet(df, uri, single_file=False)
    assert str(out) == uri
    local_dir = tmp_path / "geo_uri.parquet"
    parts = sorted(local_dir.glob("*.parquet"))
    assert parts, "directory-layout write produced no part files"
    for part in parts:
        meta = pq.read_table(part).schema.metadata
        geo = json.loads(meta[b"geo"])
        assert geo["primary_column"] == "geom"
        assert geo["columns"]["geom"]["encoding"] == "WKB"
    # payload survived the footer rewrite round-trip
    table = pq.read_table(str(local_dir))
    assert sorted(table.column("fid").to_pylist()) == [1, 2]


def test_dwca_e2e_geoparquet(spark, tmp_path):
    rows = FX.core_rows()
    z = FX.build_archive(tmp_path, "geo_e2e", rows, FX.CORE_HEADERS)
    archive, core_df, ext_dfs = read_dwca(spark, z, tmp_path / "staging")
    flat = dwca_flatten(archive, core_df, ext_dfs)
    out = write_geoparquet(flat, tmp_path / "occ.parquet")

    import pyarrow.parquet as pq

    table = pq.read_table(out)
    geo = json.loads(table.schema.metadata[b"geo"])
    assert geo["primary_column"] == "geom"
    assert "fid" in table.column_names and "geom" in table.column_names
    # every non-null geom decodes as WKB point (fixture has lat/lon coords)
    for b in table.column("geom").to_pylist():
        if b is not None:
            order, code = struct.unpack_from("<BI", b)
            assert (order, code) == (1, 1)


def test_point_analytics(spark):
    import math

    from dwca_parquet_spark.functions.geometry import (
        haversine_km,
        point_x,
        point_y,
        within_bbox,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "POINT (4.5 60.0)"),
            (2, "point(10.75 59.91)"),          # case/space variants parse
            (3, "POLYGON ((0 0, 1 0, 1 1, 0 0))"),  # non-point -> NULL coords
            (4, None),
            (5, "POINT (-122.42 37.77)"),
        ],
        "fid long, geom string",
    )
    rows = {
        r.fid: r
        for r in df.select(
            "fid",
            point_x(F.col("geom")).alias("x"),
            point_y(F.col("geom")).alias("y"),
            within_bbox(F.col("geom"), 4.0, 57.0, 31.5, 71.5).alias("in_norway"),
        ).collect()
    }
    assert (rows[1].x, rows[1].y) == (4.5, 60.0)
    assert (rows[2].x, rows[2].y) == (10.75, 59.91)
    assert rows[3].x is None and rows[4].x is None
    assert rows[1].in_norway and rows[2].in_norway
    assert not rows[3].in_norway and not rows[4].in_norway and not rows[5].in_norway

    # haversine vs an independent Python computation (Oslo -> Bergen)
    got = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(10.7522), F.lit(59.9139), F.lit(5.3221), F.lit(60.3913)
            ).alias("km")
        )
        .collect()[0]
        .km
    )
    r = 6371.0088
    la, lb = math.radians(59.9139), math.radians(60.3913)
    dlat = math.radians(60.3913 - 59.9139)
    dlon = math.radians(5.3221 - 10.7522)
    a = math.sin(dlat / 2) ** 2 + math.cos(la) * math.cos(lb) * math.sin(dlon / 2) ** 2
    want = 2 * r * math.asin(math.sqrt(a))
    assert abs(got - want) < 1e-9
    assert 300 < got < 310  # ~305 km Oslo-Bergen great-circle


def test_flatten_nullifies_malformed_footprint(spark, tmp_path):
    headers = FX.CORE_HEADERS_WKT
    rows = FX.core_rows()
    # one malformed footprint: falls back to the lat/lon point
    rows[0]["footprintWKT"] = "POLYGON ((broken"
    rows[1]["footprintWKT"] = "POLYGON ((1 1, 2 1, 2 2, 1 1))"
    z = FX.build_archive(tmp_path, "badwkt", rows, headers)
    archive, core_df, ext_dfs = read_dwca(spark, z, tmp_path / "staging")
    flat = dwca_flatten(archive, core_df, ext_dfs)
    got = {r["fid"]: r["geom"] for r in flat.select("fid", "geom").collect()}
    assert got[rows[1]["id"]] == "POLYGON ((1 1, 2 1, 2 2, 1 1))"
    bad = got[rows[0]["id"]]
    assert bad is None or bad.startswith("POINT (")


def test_payload_neardup_pairs(spark):
    """Frame-hash near-dup: a payload sharing 7/8 frames with its source
    pairs up; disjoint payloads don't; jaccard matches an independent
    python computation over the same frame hashes."""
    from dwca_parquet_spark.functions.hashing import HASH_MOD
    from dwca_parquet_spark.operators.multimodal import (
        payload_neardup_pairs,
        to_binary_table,
    )

    base = "".join(chr(65 + (i * 7) % 26) for i in range(800))
    variant = base[:700] + "x" * 100          # last frame differs
    other = "".join(chr(97 + (i * 5) % 26) for i in range(800))
    df = spark.createDataFrame(
        [(1, base), (2, variant), (3, other)], "doc_id long, text string"
    )
    pairs = payload_neardup_pairs(
        to_binary_table(df, "doc_id", "text"), n_frames=8, threshold=0.5
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 2) in got and len(got) == 1

    # independent reference: frame hashes in plain python
    def fhashes(payload: bytes, n=8):
        size = -(-len(payload) // n)
        out = set()
        for i in range(n):
            chunk = payload[i * size : (i + 1) * size]
            if not chunk:
                break
            total = sum(chunk) % HASH_MOD
            out.add((total * 31 + len(chunk)) % HASH_MOD)
        return out

    a, b = fhashes(base.encode()), fhashes(variant.encode())
    want = round(len(a & b) / len(a | b), 6)
    assert got[(1, 2)] == want
