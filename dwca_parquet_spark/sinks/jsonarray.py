"""JSON-array sink: one file containing a single JSON array (not JSONL).

Reference: ``COPY records TO 's3://…' (FORMAT json, ARRAY true)``
(``/root/reference/src/dwca_parquet/libs/geoapi.py:73-75``). Spark's json
writer emits JSONL directories, so for byte parity the rows serialize via
``to_json(struct(*))`` on executors and only the small serialized strings
collect for the single-file write — acceptable because this sink exists for
catalog/config outputs (hundreds of rows), never bulk data.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_json_array(
    df: DataFrame,
    path: str | Path,
    indent: int | None = None,
    max_rows: int = 100_000,
) -> Path:
    """``max_rows`` guards the driver-side collect: this sink is for
    catalog-sized outputs only, and failing fast beats OOM-ing the driver
    if someone points bulk data at it."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    serialized = (
        df.limit(max_rows + 1)
        .select(F.to_json(F.struct(*df.columns)).alias("j"))
        .collect()
    )
    if len(serialized) > max_rows:
        raise ValueError(
            f"write_json_array is a catalog sink (≤{max_rows} rows); "
            "use write_parquet for bulk data"
        )
    sep = ",\n" if indent is None else ",\n"
    body = sep.join(r["j"] for r in serialized)
    path.write_text("[\n" + body + "\n]\n", encoding="utf-8")
    return path
