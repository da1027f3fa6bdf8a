"""Band-algebra ("formula engine") registry — Spark Column expressions.

Re-expresses the reference's 17 registered vegetation/thermal formulas
(src/library/vegetation.cpp:85-113) as Catalyst column expressions over a
band-struct pixel DataFrame (columns R, G, B, N, Re, T as present).

Semantics ported exactly (vegetation.cpp:214-325):
  * nodata propagation: if ANY referenced input band equals nodata the
    output is nodata (we use NULL, the relational nodata),
  * ε-guarded division: |denominator| < EPS → nodata, never inf,
  * vNDVI requires R,G,B > EPS (negative bases would NaN under pow).

Everything stays JVM-side in whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1e-10
NODATA = -9999.0


def _guard_div(num: Column, den: Column) -> Column:
    return F.when(F.abs(den) < EPS, F.lit(None).cast("double")).otherwise(num / den)


def _b(bands: dict[str, Column], sym: str) -> Column:
    # Missing band reads as 0 (vegetation.cpp:240-244)
    return bands.get(sym, F.lit(0.0))


# formula id -> (builder(bands) -> Column, required band symbols)
FORMULAS: dict[str, tuple[Callable[[dict[str, Column]], Column], str]] = {
    "VARI": (lambda b: _guard_div(_b(b, "G") - _b(b, "R"), _b(b, "G") + _b(b, "R") - _b(b, "B")), "RGB"),
    "EXG": (lambda b: 2 * _b(b, "G") - (_b(b, "R") + _b(b, "B")), "RGB"),
    "GLI": (lambda b: _guard_div(2 * _b(b, "G") - _b(b, "R") - _b(b, "B"), 2 * _b(b, "G") + _b(b, "R") + _b(b, "B")), "RGB"),
    "vNDVI": (
        lambda b: F.when(
            (_b(b, "R") > EPS) & (_b(b, "G") > EPS) & (_b(b, "B") > EPS),
            0.5268 * F.pow(_b(b, "R"), -0.1294) * F.pow(_b(b, "G"), 0.3389) * F.pow(_b(b, "B"), -0.3118),
        ).otherwise(F.lit(None).cast("double")),
        "RGB",
    ),
    "NDVI": (lambda b: _guard_div(_b(b, "N") - _b(b, "R"), _b(b, "N") + _b(b, "R")), "RN"),
    "NDWI": (lambda b: _guard_div(_b(b, "G") - _b(b, "N"), _b(b, "G") + _b(b, "N")), "GN"),
    "GNDVI": (lambda b: _guard_div(_b(b, "N") - _b(b, "G"), _b(b, "N") + _b(b, "G")), "GN"),
    "SAVI": (lambda b: _guard_div(1.5 * (_b(b, "N") - _b(b, "R")), _b(b, "N") + _b(b, "R") + 0.5), "RN"),
    "EVI": (lambda b: _guard_div(2.5 * (_b(b, "N") - _b(b, "R")), _b(b, "N") + 6 * _b(b, "R") - 7.5 * _b(b, "B") + 1), "RBN"),
    "NDRE": (lambda b: _guard_div(_b(b, "N") - _b(b, "Re"), _b(b, "N") + _b(b, "Re")), "NRe"),
    "NDYI": (lambda b: _guard_div(_b(b, "G") - _b(b, "B"), _b(b, "G") + _b(b, "B")), "GB"),
    "MPRI": (lambda b: _guard_div(_b(b, "G") - _b(b, "R"), _b(b, "G") + _b(b, "R")), "RG"),
    "OSAVI": (lambda b: _guard_div(_b(b, "N") - _b(b, "R"), _b(b, "N") + _b(b, "R") + 0.16), "RN"),
    "GRVI": (lambda b: _guard_div(_b(b, "N"), _b(b, "G")), "GN"),
    "ENDVI": (lambda b: _guard_div(_b(b, "N") + _b(b, "G") - 2 * _b(b, "B"), _b(b, "N") + _b(b, "G") + 2 * _b(b, "B")), "GBN"),
    "ARVI": (lambda b: _guard_div(_b(b, "N") - 2 * _b(b, "R") + _b(b, "B"), _b(b, "N") + 2 * _b(b, "R") + _b(b, "B")), "RBN"),
    "CELSIUS": (lambda b: _b(b, "T"), "T"),
    "KELVIN": (lambda b: _b(b, "T") + 273.15, "T"),
}


def apply_formula(pixels: DataFrame, formula_id: str, nodata: float = NODATA) -> Column:
    """Build the output column for ``formula_id`` over band columns named
    R/G/B/N/Re/T, with reference nodata-propagation semantics."""
    builder, required = FORMULAS[formula_id]
    # tokenize required bands ("Re" is one token — vegetation.cpp:120-136)
    syms, i = [], 0
    while i < len(required):
        if required[i] == "R" and i + 1 < len(required) and required[i + 1] == "e":
            syms.append("Re")
            i += 2
        elif required[i] == "N" and i + 1 < len(required) and required[i + 1] == "R":
            syms.append("N")
            i += 1
        else:
            syms.append(required[i])
            i += 1
    present = [s for s in syms if s in pixels.columns]
    bands = {s: F.col(s) for s in present}
    any_nodata = None
    for s in present:
        cond = F.col(s) == nodata
        any_nodata = cond if any_nodata is None else (any_nodata | cond)
    out = builder(bands)
    if any_nodata is not None:
        out = F.when(any_nodata, F.lit(None).cast("double")).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# Engine-portable SQL fragments for the rational formulas (everything except
# vNDVI's pow) — shared verbatim by the Spark side and the DuckDB oracle.
# Each entry: (numerator, denominator|None, used bands).
FORMULA_SQL: dict[str, tuple[str, str | None, str]] = {
    "VARI": ("(G - R)", "(G + R - B)", "RGB"),
    "EXG": ("((2.0 * G) - (R + B))", None, "RGB"),
    "GLI": ("((G * 2.0) - R - B)", "((G * 2.0) + R + B)", "RGB"),
    "NDVI": ("(N - R)", "(N + R)", "RN"),
    "NDWI": ("(G - N)", "(G + N)", "GN"),
    "GNDVI": ("(N - G)", "(N + G)", "GN"),
    "SAVI": ("(1.5 * (N - R))", "(N + R + 0.5)", "RN"),
    "EVI": ("(2.5 * (N - R))", "(N + 6.0 * R - 7.5 * B + 1.0)", "RBN"),
    "NDRE": ("(N - Re)", "(N + Re)", "NRe"),
    "NDYI": ("(G - B)", "(G + B)", "GB"),
    "MPRI": ("(G - R)", "(G + R)", "RG"),
    "OSAVI": ("(N - R)", "(N + R + 0.16)", "RN"),
    "GRVI": ("N", "G", "GN"),
    "ENDVI": ("((N + G) - (2.0 * B))", "((N + G) + (2.0 * B))", "GBN"),
    "ARVI": ("(N - (2.0 * R) + B)", "(N + (2.0 * R) + B)", "RBN"),
    "CELSIUS": ("T", None, "T"),
    "KELVIN": ("(T + 273.15)", None, "T"),
}


def _band_tokens(required: str) -> list[str]:
    syms, i = [], 0
    while i < len(required):
        if required[i] == "R" and i + 1 < len(required) and required[i + 1] == "e":
            syms.append("Re")
            i += 2
        else:
            syms.append(required[i])
            i += 1
    return syms


def formula_case_sql(fid: str, nodata: float = -9999.0) -> str:
    """Full CASE expression for a formula with reference nodata + ε-guard
    semantics (vegetation.cpp:243-325), as engine-portable SQL."""
    num, den, bands = FORMULA_SQL[fid]
    nd = " OR ".join(f"{b} = {nodata}" for b in _band_tokens(bands))
    if den is None:
        return f"CASE WHEN {nd} THEN NULL ELSE {num} END"
    return (
        f"CASE WHEN {nd} THEN NULL"
        f" WHEN abs({den}) < 1e-10 THEN NULL"
        f" ELSE {num} / {den} END"
    )
