"""Batch sources/sinks — the FileStorage analogue.

Reference: FileStorage.read/write handles json/jsonl/csv/parquet/pickle
(/root/reference/dataflow/utils/storage.py:124-135, 264-275) plus remote
hf:/ms: datasets (storage.py:153-155,176-202 — URI parse/dispatch is
implemented and unit-tested here; the hub download itself is a documented
seam, no network in this environment), and cleans invalid unicode
surrogates on write (storage.py:212-277). Spark-side: format inference
from the extension, surrogate cleaning as a native regexp, no pickle (no
Spark analogue). The paginated-DB source (MyScaleDBStorage.read,
storage.py:341-490) is ``read_db_paginated`` below.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = {
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
    ".parquet": "parquet",
}


def _fmt(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _FORMATS:
        return _FORMATS[ext]
    if ext in (".pkl", ".pickle"):
        raise ValueError("pickle has no distributed reader — convert to parquet")
    return "parquet"


@dataclass(frozen=True)
class HubDatasetRef:
    hub: str  # "hf" | "ms"
    dataset: str
    config: str | None
    split: str


def parse_dataset_uri(source: str) -> HubDatasetRef | None:
    """Parse the reference's remote-dataset URIs (storage.py:176-202):

    - ``hf:{name}`` / ``hf:{name}:{split}`` / ``hf:{name}:{config}:{split}``
      (exactly the reference's arity rules: 1 trailing part = split,
      2 = config+split, 0 or 3+ = defaults config=None split='train')
    - ``ms:{name}`` / ``ms:{name}:{split}`` (split defaults to 'train')

    Returns None for non-hub paths so ``read_any`` can fall through to the
    local-file formats.
    """
    if source.startswith("hf:"):
        _, dataset, *parts = source.split(":")
        if len(parts) == 1:
            config, split = None, parts[0]
        elif len(parts) == 2:
            config, split = parts
        else:
            config, split = None, "train"
        return HubDatasetRef("hf", dataset, config, split)
    if source.startswith("ms:"):
        _, dataset, *parts = source.split(":")
        return HubDatasetRef("ms", dataset, None, parts[0] if parts else "train")
    return None


def read_hub_dataset(spark: SparkSession, ref: HubDatasetRef) -> DataFrame:
    """Load a hub dataset ref via the optional ``datasets`` / ``modelscope``
    packages (the reference's exact load calls), then parallelize. Neither
    package ships in this environment, so the fetch is an import-gated seam
    — the URI dispatch above is the tested part."""
    if ref.hub == "hf":
        try:
            from datasets import load_dataset  # type: ignore
        except ImportError as e:  # pragma: no cover - seam
            raise RuntimeError(
                "hf: datasets requires the 'datasets' package (network hub seam)"
            ) from e
        ds = (
            load_dataset(ref.dataset, ref.config, split=ref.split)
            if ref.config
            else load_dataset(ref.dataset, split=ref.split)
        )
        return spark.createDataFrame(ds.to_pandas())
    try:
        from modelscope import MsDataset  # type: ignore
    except ImportError as e:  # pragma: no cover - seam
        raise RuntimeError(
            "ms: datasets requires the 'modelscope' package (network hub seam)"
        ) from e
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(MsDataset.load(ref.dataset, split=ref.split)))


def read_any(spark: SparkSession, path: str, schema=None) -> DataFrame:
    ref = parse_dataset_uri(path)
    if ref is not None:
        return read_hub_dataset(spark, ref)
    fmt = _fmt(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", schema is None).csv(path)
    if fmt == "json":
        return reader.json(path)
    return reader.parquet(path)


def read_db_paginated(
    spark: SparkSession,
    make_conn,
    table: str,
    schema,
    page_size: int = 10_000,
    where_sql: str = "",
    order_col: str | None = None,
    columns: str = "*",
    keyset: bool = False,
) -> DataFrame:
    """Paginated DB scan — MyScaleDBStorage.read analogue (storage.py:
    341-490; the LIMIT/OFFSET page construction is :405-415), parallelized
    one page per Spark task instead of the reference's single-client loop.

    ``make_conn`` must be a picklable zero-arg factory returning a DB-API
    connection (each task opens its own — the Spark-JDBC partitioned-read
    shape). One driver-side COUNT sizes the page range; every page then
    reads ``SELECT {columns} FROM table [WHERE ...] ORDER BY {order_col}
    LIMIT page_size OFFSET page*page_size`` inside ``mapInPandas``.
    ``order_col`` is required when the source engine does not guarantee a
    stable scan order (OFFSET without ORDER BY is engine-dependent — the
    reference inherits ClickHouse's stable parts order), and it must be
    UNIQUE: each page runs as an independent query, and ties spanning a
    page boundary are ordered arbitrarily per execution, duplicating some
    rows and dropping others. The WHERE clause is pushed into every page
    query, so source-side predicate pruning happens before rows ever
    reach Spark.

    SNAPSHOT CONTRACT (default OFFSET mode): each page is an independent
    query/transaction, so concurrent inserts or deletes shift LIMIT/OFFSET
    boundaries *between* page fetches and silently duplicate or drop rows
    even with a unique ``order_col``. The source table must be static for
    the duration of the scan (or each page must read from the same
    snapshot/consistent view — e.g. a REPEATABLE READ session per page
    pinned to one snapshot, which plain DB-API cannot express generically).

    ``keyset=True`` (requires ``order_col``) is the scale-safe variant:
    one driver-side probe computes the first key of every page via
    ``row_number() OVER (ORDER BY order_col)`` — a single O(N) server-side
    pass — and each Spark task then range-scans
    ``WHERE order_col >= lo AND order_col < hi ORDER BY order_col``.
    No OFFSET anywhere, so the source engine never re-scans earlier pages
    (OFFSET mode is O(pages²) server-side) and an index on ``order_col``
    turns every page into a seek. Because the key ranges PARTITION the key
    space, concurrent inserts can never be read twice (a row falls in
    exactly one range); rows inserted into an already-fetched range are
    simply not seen — append-mostly tables degrade gracefully instead of
    corrupting the scan."""
    # Parenthesize the pushed predicate: keyset mode appends
    # " AND order_col >= ?" to this clause, and a top-level OR in
    # where_sql would otherwise bind the range condition to only the
    # right disjunct (every page re-returning the left disjunct's rows).
    where = f" WHERE ({where_sql})" if where_sql else ""
    if keyset:
        if not order_col:
            raise ValueError("keyset pagination requires order_col")
        return _read_db_keyset(
            spark, make_conn, table, schema, page_size, where, order_col, columns
        )
    order = f" ORDER BY {order_col}" if order_col else ""
    conn = make_conn()
    try:
        cur = conn.execute(f"SELECT count(*) FROM {table}{where}")
        total = cur.fetchone()[0]
    finally:
        conn.close()
    n_pages = max((total + page_size - 1) // page_size, 1)

    def fetch_pages(batches):
        import pandas as pd

        for pdf in batches:
            for page in pdf["id"].tolist():
                c = make_conn()
                try:
                    cur = c.execute(
                        f"SELECT {columns} FROM {table}{where}{order} "
                        f"LIMIT {page_size} OFFSET {int(page) * page_size}"
                    )
                    rows = cur.fetchall()
                    cols = [d[0] for d in cur.description]
                finally:
                    c.close()
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(n_pages)
        .repartition(min(n_pages, spark.sparkContext.defaultParallelism))
        .mapInPandas(fetch_pages, schema=schema)
    )


def _read_db_keyset(
    spark, make_conn, table, schema, page_size, where, order_col, columns
) -> DataFrame:
    """Keyset page plan: probe boundaries once, range-scan per task."""
    conn = make_conn()
    try:
        cur = conn.execute(
            f"SELECT {order_col} FROM ("
            f"SELECT {order_col}, row_number() OVER (ORDER BY {order_col}) AS __rn"
            f" FROM {table}{where}) AS __b WHERE __rn % {int(page_size)} = 1"
            f" ORDER BY {order_col}"
        )
        bounds = [r[0] for r in cur.fetchall()]
    finally:
        conn.close()
    if not bounds:
        return spark.createDataFrame([], schema)
    # page i covers [bounds[i], bounds[i+1]); the last page is unbounded
    pages = [(bounds[i], bounds[i + 1] if i + 1 < len(bounds) else None) for i in range(len(bounds))]

    def fetch_ranges(batches):
        import pandas as pd

        for pdf in batches:
            for page in pdf["id"].tolist():
                lo, hi = pages[int(page)]
                c = make_conn()
                try:
                    import sys as _sys

                    style = getattr(
                        _sys.modules.get(type(c).__module__.split(".")[0]),
                        "paramstyle",
                        "qmark",
                    )
                    ph = "%s" if style in ("format", "pyformat") else "?"
                    cond = f"{order_col} >= {ph}"
                    params = [lo]
                    if hi is not None:
                        cond += f" AND {order_col} < {ph}"
                        params.append(hi)
                    joiner = " AND " if where else " WHERE "
                    cur = c.execute(
                        f"SELECT {columns} FROM {table}{where}{joiner}{cond}"
                        f" ORDER BY {order_col}",
                        tuple(params),
                    )
                    rows = cur.fetchall()
                    cols = [d[0] for d in cur.description]
                finally:
                    c.close()
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(len(pages))
        .repartition(min(len(pages), spark.sparkContext.defaultParallelism))
        .mapInPandas(fetch_ranges, schema=schema)
    )


def write_db(
    df: DataFrame,
    make_conn,
    table: str,
    pipeline_id: str = "p0",
    task_id: str = "t0",
) -> int:
    """DB write — MyScaleDBStorage.write analogue (storage.py:441-490):
    non-system columns pack into a JSON ``data`` field, system columns
    (pipeline_id, task_id, raw_data_id, min_hashes) fill in, rows
    batch-INSERT through an ``executemany`` per Arrow batch over one
    per-task DB-API connection (the reference's single
    ``client.execute(insert_sql, values)``, parallelized per partition).
    Returns the total row count written (this is an action).

    Delivery is AT-LEAST-ONCE: a task retry or speculative duplicate
    re-runs already-committed batches, so the target table (or a
    downstream view) must dedupe on its natural key — e.g. make
    (pipeline_id, task_id, raw_data_id) a primary/merge key, exactly the
    contract ``streaming.sink.KeyedMergeSink`` implements for files. Run
    with ``spark.speculation=false`` when the target cannot dedupe.

    The INSERT placeholder style is derived from the driver module's
    DB-API ``paramstyle`` (qmark '?', format/pyformat '%s', numeric ':1');
    sqlite3/duckdb (qmark) and psycopg2/MySQLdb (format) all work."""
    cols = list(df.columns)

    def write_part(batches):
        import json as _json
        import sys as _sys

        import pandas as pd

        conn = make_conn()
        style = getattr(
            _sys.modules.get(type(conn).__module__.split(".")[0]), "paramstyle", "qmark"
        )
        if style in ("format", "pyformat"):
            ph = ", ".join(["%s"] * 5)
        elif style == "numeric":
            ph = ", ".join(f":{i}" for i in range(1, 6))
        else:  # qmark (sqlite3, duckdb) and the safe default
            ph = ", ".join(["?"] * 5)
        try:
            n = 0
            for pdf in batches:
                rows = []
                for rec in pdf.to_dict(orient="records"):
                    data = {k: rec[k] for k in cols}
                    raw_id = int(data.get("raw_data_id") or 0)
                    rows.append(
                        (
                            pipeline_id,
                            task_id,
                            raw_id,
                            "[0]",
                            _json.dumps(data, ensure_ascii=False, default=str),
                        )
                    )
                if rows:
                    conn.executemany(
                        f"INSERT INTO {table} (pipeline_id, task_id, raw_data_id,"
                        f" min_hashes, data) VALUES ({ph})",
                        rows,
                    )
                    conn.commit()
                    n += len(rows)
            yield pd.DataFrame({"rows_written": [n]})
        finally:
            conn.close()

    out = df.mapInPandas(write_part, schema="rows_written long")
    return sum(r.rows_written for r in out.collect())


def clean_surrogates(c) -> "F.Column":
    """Strip unpaired UTF-16 surrogate codepoints (FileStorage.write's
    invalid-unicode cleaning, storage.py:231-247) — native regexp."""
    return F.regexp_replace(c, "[\\x{D800}-\\x{DFFF}]", "")


def write_any(df: DataFrame, path: str, mode: str = "overwrite", clean_text_cols=()) -> None:
    for col in clean_text_cols:
        df = df.withColumn(col, clean_surrogates(F.col(col)))
    fmt = _fmt(path)
    w = df.write.mode(mode)
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)


def micro_batch_apply(df: DataFrame, fn, schema, batch_size: int = 10_000) -> DataFrame:
    """BatchWrapper analogue (wrapper/batch_wrapper.py:42-98): run ``fn``
    (pandas DataFrame -> pandas DataFrame) over size-bounded Arrow batches.
    Unlike the reference there is no index-merge step — each batch maps to
    output rows directly inside one distributed stage."""

    def runner(batches):
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            while len(pdf) >= batch_size:
                yield fn(pdf.iloc[:batch_size])
                pdf = pdf.iloc[batch_size:].reset_index(drop=True)
            carry = pdf
        if carry is not None and len(carry):
            yield fn(carry)

    return df.mapInPandas(runner, schema=schema)
