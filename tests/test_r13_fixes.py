"""Pins for the round-13 fixes (r12 verdict #2/#3 + ADVICE):

- gini_source_balance's oracle casts SUM(mass) back to BIGINT — DuckDB
  sums BIGINT into HUGEINT, which pandas (the driver's render path)
  turns into float64, hashing '149174.0' against Spark's '149174'.
- setexif_gps_roundtrip's oracle projects (lat, lon) in the Spark
  column order — the outer projection had them swapped.
- Krippendorff coder c1 maps a NULL lang to 0 (the oracle's CASE WHEN
  semantics), never NULL — a NULL would silently drop the unit from
  the disagreement sums while n_units still counts it.
"""

from __future__ import annotations

import duckdb

from dronedb_spark.suite import load_all

REGISTRY = load_all()


def _duck(sf_dir: str):
    from dronedb_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_gini_oracle_total_mass_renders_integer(sf_dir):
    pdf = _duck(sf_dir).execute(REGISTRY["gini_source_balance"].oracle).df()
    assert pdf["total_mass"].dtype.kind == "i", (
        f"total_mass renders {pdf['total_mass'].dtype} — the uncast "
        "HUGEINT->float64 driver hash mismatch (r12 red row)"
    )
    # every other column stays integral too
    for col in pdf.columns:
        assert pdf[col].dtype.kind == "i", (col, pdf[col].dtype)


def test_setexif_oracle_projects_lat_before_lon():
    sql = REGISTRY["setexif_gps_roundtrip"].oracle
    head = sql.split("FROM")[0]
    assert head.index(" lat,") < head.index(" lon,"), (
        "oracle outer projection must read lat, lon (the Spark column "
        "order); it shipped swapped through r12"
    )


def test_alpha_coder_c1_null_lang_counts_as_zero(spark):
    from dronedb_spark.text.alpha import coder_ratings, krippendorff_alpha

    docs = spark.createDataFrame(
        [
            (1, "a b c", None, 500),  # NULL lang: c1 must be 0, not NULL
            (2, "d e f", "en", 500),
            (3, "g h i", "fr", 100),
        ],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    rows = {r["doc_id"]: r for r in coder_ratings(docs).collect()}
    assert rows[1]["c1"] == 0 and rows[2]["c1"] == 1 and rows[3]["c1"] == 0
    agg = krippendorff_alpha(coder_ratings(docs)).collect()[0]
    # the NULL-lang unit contributes to the value sums, not just n_units
    assert agg["n_units"] == 3
    assert agg["n_zero"] + agg["n_one"] == 3 * agg["n_units"]
