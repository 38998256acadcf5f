"""DwC-A end-to-end golden tests (SURVEY §5.3).

Oracle = DuckDB executing the reference query's semantics (star inner-join
on the meta.xml keys + fid + coalesce(footprint, point) geometry — the
behavior declared at /root/reference/src/dwca_parquet/templates/query.sql:1-5
and libs/dwca.py:8-44) over the SAME extracted CSVs. Values compare as
canonical strings so CSV type-inference differences between engines don't
mask real semantic breaks.

Variant coverage (FIXTURES.md §B): core-only, tab-sep, footprintWKT with
NULLs, multi-extension fan-out, unmatched core rows (inner-join drop),
extension-held footprintWKT (the core-only quirk), latin-1 encoding,
colliding column names, NULL lat/lon.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from dwca_parquet_spark.plans.flatten import dwca_flatten
from dwca_parquet_spark.sources.dwca import read_dwca
from tests import dwca_fixtures as FX


def _flatten(spark, zpath: Path, tmp: Path, **kw):
    archive, core_df, ext_dfs = read_dwca(spark, zpath, tmp / "staging")
    return archive, dwca_flatten(archive, core_df, ext_dfs, **kw)


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    s = str(v)
    return s[:-2] if s.endswith(".0") else s


def _rowlist(cols, rows) -> list[str]:
    """Canonical sorted row multiset — duplicates count (a fan-out join that
    duplicates rows must not pass a set-based compare)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def _duck_oracle(archive, fix_core_only_quirk: bool = True):
    """Build the reference-semantics SQL over the extracted files."""
    con = duckdb.connect()
    core = archive.core
    parts = [
        f"read_csv('{archive.root / core.location}', header=true, "
        f"delim='{core.sep}', sample_size=-1) AS {core.alias}"
    ]
    joins = []
    for ext in archive.extensions:
        joins.append(
            f"JOIN read_csv('{archive.root / ext.location}', header=true, "
            f"delim='{ext.sep}', sample_size=-1) AS {ext.alias} "
            f'ON {ext.alias}."{ext.id_col}" = {core.alias}."{core.id_col}"'
        )
    headers_for_geom = core.headers  # the reference's core-only quirk
    has_wkt = "footprintWKT" in headers_for_geom
    lat_ok = "decimalLatitude" in core.headers and "decimalLongitude" in core.headers
    if lat_ok:
        point = (
            "CASE WHEN decimalLatitude IS NOT NULL AND decimalLongitude IS NOT NULL "
            "THEN 'POINT (' || CAST(decimalLatitude AS VARCHAR) || ' ' || "
            "CAST(decimalLongitude AS VARCHAR) || ')' END"
        )
    else:
        point = "NULL"
    geom = f"coalesce(CAST(footprintWKT AS VARCHAR), {point})" if has_wkt else point
    sql = (
        f'SELECT {core.alias}."{core.id_col}" AS fid, {geom} AS geom, * '
        f"FROM {parts[0]} {' '.join(joins)}"
    )
    rel = con.sql(sql)
    cols, rows = list(rel.columns), rel.fetchall()
    con.close()
    return cols, rows


def _compare(sdf, oracle, name: str, cols: list[str]):
    srows = sdf.select(*cols).collect()
    slist = _rowlist(cols, [tuple(r) for r in srows])
    ocols, orows = oracle
    idx = [ocols.index(c) for c in cols]
    olist = _rowlist(cols, [tuple(row[i] for i in idx) for row in orows])
    only_s = [r for r in slist if r not in olist][:3]
    only_o = [r for r in olist if r not in slist][:3]
    assert slist == olist, (
        f"{name}: row multiset mismatch ({len(slist)} vs {len(olist)} rows)"
        f"\nspark-only={only_s}\nduck-only={only_o}"
    )


def test_core_only(spark, tmp_path):
    z = FX.build_archive(tmp_path, "v1", FX.core_rows(), FX.CORE_HEADERS)
    archive, flat = _flatten(spark, z, tmp_path)
    assert archive.extensions == []
    _compare(flat, _duck_oracle(archive), "core_only", ["fid", "geom", "scientificName"])


def test_tab_separated_with_extension(spark, tmp_path):
    ext = FX.mof_extension([1, 2, 3, 4, 5, 6])
    ext["sep"] = "\t"
    z = FX.build_archive(
        tmp_path, "v2", FX.core_rows(), FX.CORE_HEADERS,
        extensions=[ext], core_sep="\t",
    )
    archive, flat = _flatten(spark, z, tmp_path)
    assert archive.core.sep == "\t"
    _compare(
        flat, _duck_oracle(archive), "tab_ext",
        ["fid", "geom", "measurementType", "measurementValue"],
    )


def test_footprint_wkt_coalesce(spark, tmp_path):
    z = FX.build_archive(
        tmp_path, "v3", FX.core_rows(with_wkt=True), FX.CORE_HEADERS_WKT
    )
    archive, flat = _flatten(spark, z, tmp_path)
    rows = {r["fid"]: r["geom"] for r in flat.collect()}
    # even ids carry a polygon footprint; odd ids fall back to the point
    assert rows[2].startswith("POLYGON")
    assert rows[1].startswith("POINT")
    _compare(flat, _duck_oracle(archive), "wkt", ["fid", "geom"])


def test_fanout_two_extensions(spark, tmp_path):
    z = FX.build_archive(
        tmp_path, "v4", FX.core_rows(), FX.CORE_HEADERS,
        extensions=[FX.mof_extension([1, 2, 3, 4, 5, 6], per_id=2),
                    FX.multimedia_extension([1, 2, 3, 4, 5, 6])],
    )
    archive, flat = _flatten(spark, z, tmp_path)
    # fan-out: 6 core × 2 mof × 1 media = 12 rows
    assert flat.count() == 12
    _compare(flat, _duck_oracle(archive), "fanout", ["fid", "measurementValue", "identifier"])


def test_inner_join_drops_unmatched(spark, tmp_path):
    z = FX.build_archive(
        tmp_path, "v5", FX.core_rows(), FX.CORE_HEADERS,
        extensions=[FX.mof_extension([1, 3, 5])],  # 2,4,6 unmatched
    )
    archive, flat = _flatten(spark, z, tmp_path)
    fids = {r["fid"] for r in flat.select("fid").collect()}
    assert fids == {1, 3, 5}
    _compare(flat, _duck_oracle(archive), "inner_drop", ["fid", "measurementValue"])


def test_extension_wkt_ignored_core_only_quirk(spark, tmp_path):
    """Reference quirk (libs/dwca.py:37-42): footprintWKT in an EXTENSION
    must NOT feed geom — only core headers are consulted."""
    ext = {
        "file": "measurementorfact.txt",
        "headers": ["coreid", "footprintWKT"],
        "rows": [{"coreid": i, "footprintWKT": "POLYGON ((9 9, 9 8, 8 8, 9 9))"} for i in range(1, 7)],
    }
    z = FX.build_archive(tmp_path, "v6", FX.core_rows(), FX.CORE_HEADERS, extensions=[ext])
    archive, flat = _flatten(spark, z, tmp_path)
    for r in flat.collect():
        assert r["geom"] is None or r["geom"].startswith("POINT"), r
    # fixed mode uses the extension column
    _, flat_fixed = _flatten(spark, z, tmp_path / "f", footprint_from_core_only=False)
    assert all(
        r["geom"].startswith("POLYGON") for r in flat_fixed.select("geom").collect()
    )


def test_latin1_encoding(spark, tmp_path):
    rows = FX.core_rows(3)
    rows[0]["scientificName"] = "Ærø señor"
    z = FX.build_archive(tmp_path, "v7", rows, FX.CORE_HEADERS, core_enc="ISO-8859-1")
    archive, flat = _flatten(spark, z, tmp_path)
    assert archive.core.encoding == "ISO-8859-1"
    names = {r["scientificName"] for r in flat.collect()}
    assert "Ærø señor" in names


def test_colliding_columns_renamed(spark, tmp_path):
    ext = {
        "file": "multimedia.txt",
        "headers": ["coreid", "scientificName"],
        "rows": [{"coreid": i, "scientificName": f"ext-{i}"} for i in range(1, 7)],
    }
    z = FX.build_archive(tmp_path, "v8", FX.core_rows(), FX.CORE_HEADERS, extensions=[ext])
    archive, flat = _flatten(spark, z, tmp_path)
    assert "multimedia_scientificName" in flat.columns
    assert "scientificName" in flat.columns
    # parquet round-trip must succeed despite the original collision
    out = tmp_path / "out.parquet"
    flat.write.mode("overwrite").parquet(str(out))
    assert spark.read.parquet(str(out)).count() == 6


def test_null_latlon_geom_null(spark, tmp_path):
    z = FX.build_archive(
        tmp_path, "v9", FX.core_rows(null_latlon=True), FX.CORE_HEADERS
    )
    archive, flat = _flatten(spark, z, tmp_path)
    rows = {r["fid"]: r["geom"] for r in flat.collect()}
    assert rows[3] is None and rows[6] is None
    assert rows[1].startswith("POINT")
    _compare(flat, _duck_oracle(archive), "null_latlon", ["fid", "geom"])


def test_fix_latlon_mode(spark, tmp_path):
    z = FX.build_archive(tmp_path, "v10", FX.core_rows(1), FX.CORE_HEADERS)
    archive, flat_verbatim = _flatten(spark, z, tmp_path)
    _, flat_fixed = _flatten(spark, z, tmp_path / "f", fix_latlon=True)
    g_v = flat_verbatim.select("geom").first()["geom"]
    g_f = flat_fixed.select("geom").first()["geom"]
    assert g_v == "POINT (58.12 7.15)"  # reference order: lat first (query.sql:1)
    assert g_f == "POINT (7.15 58.12)"  # corrected lon-lat


def test_malformed_archive_errors(tmp_path):
    """Missing meta.xml / missing <core> fail with messages naming the
    broken contract (a many-dataset harvest needs actionable failures)."""
    import zipfile

    import pytest

    from dwca_parquet_spark.sources.dwca import parse_meta, stage_archive

    # an archive with no meta.xml at all
    z = tmp_path / "no_meta.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("occurrence.txt", "id\tname\n1\tx\n")
    extracted = stage_archive(z, tmp_path / "s1")
    with pytest.raises(FileNotFoundError, match="no meta.xml"):
        parse_meta(extracted)

    # meta.xml present but without a <core> element
    z2 = tmp_path / "no_core.zip"
    with zipfile.ZipFile(z2, "w") as zf:
        zf.writestr(
            "meta.xml",
            '<?xml version="1.0"?>'
            '<archive xmlns="http://rs.tdwg.org/dwc/text/"></archive>',
        )
    extracted2 = stage_archive(z2, tmp_path / "s2")
    with pytest.raises(ValueError, match="no <core>"):
        parse_meta(extracted2)


def _oracle_readable(archive):
    """DuckDB's read_csv caps delim at ONE byte; Spark reads multi-char
    separators natively. For any multi-byte-sep layer, write a
    0x1F-unit-separator copy next to the original (data is quote-free in
    these fixtures) and return an archive descriptor pointing at the
    copies — the ORACLE-side translation only, Spark keeps reading the
    hostile original."""
    import dataclasses

    def fix(layer):
        multi = len(layer.sep.encode()) > 1
        non_utf8 = layer.encoding.upper() not in ("UTF-8", "UTF8")
        if not (multi or non_utf8):
            return layer
        src = archive.root / layer.location
        dst = src.with_suffix(src.suffix + ".oracle")
        text = src.read_text(encoding=layer.encoding)
        sep = "\x1f" if multi else layer.sep
        if multi:
            text = text.replace(layer.sep, "\x1f")
        dst.write_text(text, encoding="utf-8")  # duckdb reads UTF-8 only
        return dataclasses.replace(layer, location=dst.name, sep=sep)

    return dataclasses.replace(
        archive,
        core=fix(archive.core),
        extensions=[fix(e) for e in archive.extensions],
    )


def _duck_oracle_honored(archive):
    """Oracle for the HONORED ignoreHeaderLines semantics: skip the
    declared header lines entirely and supply column names explicitly
    (DuckDB has no skip-after-header, so header=false + skip=N +
    names=[...] expresses 'header from meta, data from line N+1')."""
    con = duckdb.connect()
    core = archive.core

    def rd(layer):
        names = ", ".join(f"'{h}'" for h in layer.headers)
        return (
            f"read_csv('{archive.root / layer.location}', header=false, "
            f"skip={layer.ignore_header_lines}, names=[{names}], "
            f"delim='{layer.sep}', sample_size=-1)"
        )

    joins = [
        f'JOIN {rd(ext)} AS {ext.alias} '
        f'ON {ext.alias}."{ext.id_col}" = {core.alias}."{core.id_col}"'
        for ext in archive.extensions
    ]
    point = (
        "CASE WHEN decimalLatitude IS NOT NULL AND decimalLongitude IS NOT NULL "
        "THEN 'POINT (' || CAST(decimalLatitude AS VARCHAR) || ' ' || "
        "CAST(decimalLongitude AS VARCHAR) || ')' END"
    )
    geom = (
        f"coalesce(CAST(footprintWKT AS VARCHAR), {point})"
        if "footprintWKT" in core.headers
        else point
    )
    sql = (
        f'SELECT {core.alias}."{core.id_col}" AS fid, {geom} AS geom, * '
        f"FROM {rd(core)} AS {core.alias} {' '.join(joins)}"
    )
    rel = con.sql(sql)
    cols, rows = list(rel.columns), rel.fetchall()
    con.close()
    return cols, rows


@pytest.mark.slow
def test_hostile_archive_matrix(spark, tmp_path):
    """VERDICT r11 #6 — the §5.3 hostile list as ONE full cross product:
    {UTF-8, ISO-8859-1} × {',', TAB, multi-char '~~'} ×
    {all-matched, missing extension matches} × {ignoreHeaderLines 1, 2}
    × {no collision, duplicate column name} — every combination reads,
    flattens, and matches the rendered-query.sql DuckDB oracle. The
    ignoreHeaderLines=2 combos additionally prove BOTH modes: verbatim
    (the reference never consults it — DuckDB read_csv skips exactly one
    line, so the junk line leaks into typing, both engines alike) and
    honored (the trimmed-staging path drops it; skip-N oracle)."""
    import itertools

    from dwca_parquet_spark.sources.dwca import read_dwca

    n = 0
    for enc, sep, matched, ihl, collide in itertools.product(
        ("UTF-8", "ISO-8859-1"),
        (",", "\t", "~~"),
        (True, False),
        (1, 2),
        (False, True),
    ):
        n += 1
        tag = f"m{n}"
        rows = FX.core_rows(6)
        rows[0]["scientificName"] = "Ærø señor"  # latin-1-encodable
        ext_ids = [1, 2, 3, 4, 5, 6] if matched else [1, 3, 5]
        ext = FX.mof_extension(ext_ids)
        if collide:
            ext["headers"] = ext["headers"] + ["eventDate"]
            for i, r in enumerate(ext["rows"]):
                r["eventDate"] = f"1999-01-{i + 1:02d}"
        if not matched:  # plus a dangling extension row
            ext["rows"].append(
                {"coreid": 99, "measurementType": "t", "measurementValue": "0"}
            )
        ext["sep"], ext["enc"] = sep, enc
        z = FX.build_archive(
            tmp_path, tag, rows, FX.CORE_HEADERS,
            extensions=[ext], core_sep=sep, core_enc=enc,
            ignore_header_lines=ihl,
            junk_lines=["#junk-comment-line"] if ihl == 2 else None,
        )
        case = f"enc={enc} sep={sep!r} matched={matched} ihl={ihl} collide={collide}"

        # verbatim mode (reference parity; junk leaks like DuckDB's
        # 1-header-line read)
        staging = tmp_path / f"s{n}"
        archive, core_df, ext_dfs = read_dwca(spark, z, staging)
        flat = dwca_flatten(archive, core_df, ext_dfs)
        assert archive.core.sep == sep and archive.core.encoding == enc
        assert archive.core.ignore_header_lines == ihl
        cols = ["fid", "geom", "scientificName", "measurementValue"]
        _compare(
            flat, _duck_oracle(_oracle_readable(archive)),
            f"verbatim {case}", cols,
        )
        got = flat.collect()
        fids = {str(r["fid"]) for r in got}
        assert "99" not in fids, case  # dangling ext row inner-join-dropped
        if ihl == 1:
            # without junk the fid set is exactly the matched core ids
            assert fids == {str(i) for i in ext_ids}, case
        else:
            # verbatim quirk, both engines alike: the junk line exists in
            # BOTH files, so junk-id joins junk-coreid and survives — the
            # oracle compare above already proved DuckDB agrees
            assert fids - {"#junk-comment-line"} == {
                str(i) for i in ext_ids
            }, case
        if collide:
            assert "measurementorfact_eventDate" in flat.columns, case
            assert {
                str(r["measurementorfact_eventDate"]) for r in got
            } - {"None"} <= {f"1999-01-{i:02d}" for i in range(1, 8)}, case
            assert any(
                str(r["eventDate"]).startswith("2024-03") for r in got
            ), case
        name_col = {r["scientificName"] for r in got}
        assert "Ærø señor" in name_col, case

        # honored mode only differs when ihl > 1
        if ihl == 2:
            archive2, core2, exts2 = read_dwca(
                spark, z, tmp_path / f"h{n}", honor_ignore_header_lines=True
            )
            flat2 = dwca_flatten(archive2, core2, exts2)
            _compare(
                flat2, _duck_oracle_honored(_oracle_readable(archive2)),
                f"honored {case}", cols,
            )
