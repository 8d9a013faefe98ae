"""Small result-shaping helpers for query outputs."""

from __future__ import annotations

import pyarrow as pa


def ensure_schema(ds, schema: pa.Schema):
    """Guarantee a stable schema on a possibly-empty small result.

    A Ray Dataset whose every block is empty (e.g. a pair-mining query
    with no hits) loses its column schema entirely; downstream
    consumers (and the driver's schema check) then see zero columns.
    Small results are converted to an Arrow table with the declared
    schema; non-empty results pass through as the Dataset.
    """
    cnt = ds.count()
    if cnt == 0:
        return schema.empty_table()
    out = ds
    try:
        names = out.schema().names
    except Exception:
        names = None
    if names != schema.names:
        # column order drift (pandas group outputs): rebuild via Arrow
        tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
        return tbl.select(schema.names).cast(schema)
    return out
