"""Local mirror of the driver's t2 differential-oracle compare
(SURVEY.md §5.2): row count + column-name set + order-insensitive multiset of
normalized values, Spark vs DuckDB on the same parquet tables."""

from __future__ import annotations

import datetime
import math

from mapreduce_machine_learning_spark.io import duckdb_connect


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # exact — queries must round themselves; the driver hashes raw values
        return ("f", v)
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", str(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def run_spark(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_oracle(sql, sf_dir, con=None):
    own = con is None
    if own:
        con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        if own:
            con.close()


def result_hash(cols, rows) -> tuple[int, str]:
    """Order-insensitive digest of a result set (golden-hash freeze)."""
    import hashlib

    normalized = _normalize_rows(cols, rows)
    h = hashlib.sha256(repr(normalized).encode()).hexdigest()
    return len(rows), h


def assert_parity(spark, name, fn, sql, sf_dir, con=None):
    s_cols, s_rows = run_spark(spark, fn, sf_dir)
    o_cols, o_rows = run_oracle(sql, sf_dir, con)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sn = _normalize_rows(s_cols, s_rows)
    on = _normalize_rows(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs {diffs}")


def fingerprint_testdata(sf_dir):
    """md5 over the bytes of every parquet file in sf_dir — identifies the
    exact testdata generation. Golden hashes are only meaningful against
    the data they were frozen on; the driver regenerates testdata between
    rounds, so test_golden skips (with re-freeze instructions) on mismatch
    instead of failing every query."""
    import glob
    import hashlib
    import os

    h = hashlib.md5()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        h.update(os.path.basename(path).encode())
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()
