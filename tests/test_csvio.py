"""CSV interchange laws: quoted specials survive byte-exact and corrupt
lines route to _corrupt_record instead of failing the read."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from dronedb_spark.sources.csvio import CSV_SCHEMA, read_csv, write_csv


def test_specials_survive_roundtrip(spark, tmp_path):
    rows = [
        (1, "s", 'comma, "quote", and\ttab', 10),
        (2, "s", "  leading and trailing  ", 20),
        (3, "s", "", 0),
    ]
    df = spark.createDataFrame(rows, CSV_SCHEMA)
    p = str(tmp_path / "rt")
    write_csv(df, p, n_shards=1)
    back = {r["doc_id"]: r["notes"] for r in read_csv(spark, p).collect()}
    assert back[1] == 'comma, "quote", and\ttab'
    assert back[2] == "  leading and trailing  "
    assert back[3] in ("", None)  # empty string vs null: CSV cannot tell


def test_corrupt_line_routes_not_fails(spark, tmp_path):
    p = tmp_path / "bad"
    os.makedirs(p)
    with gzip.open(p / "part-0.csv.gz", "wt") as f:
        f.write("doc_id,source,notes,n_chars\n")
        f.write('1,"s","fine",10\n')
        f.write('not_a_number,"s","busted",zz\n')
    out = read_csv(spark, str(p)).collect()
    ok = [r for r in out if r["_corrupt_record"] is None]
    bad = [r for r in out if r["_corrupt_record"] is not None]
    assert len(ok) == 1 and ok[0]["doc_id"] == 1
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]
