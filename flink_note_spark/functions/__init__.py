"""Scalar expression helpers — always JVM-side Catalyst expressions.

These cover the reference's scalar-function closure (SURVEY.md §2.2
"Scalar functions"): strings, date/time, math, arrays, JSON. Everything
here compiles into whole-stage codegen; no Python executes per row.
"""

from flink_note_spark.functions.scalar import (
    epoch_us,
    fmt_date,
    fmt_ts,
    json_int,
    l2_norm_sq,
    vec_cosine,
    vec_dot,
    word_shingles,
    words,
)

__all__ = [
    "epoch_us",
    "fmt_date",
    "fmt_ts",
    "json_int",
    "l2_norm_sq",
    "vec_cosine",
    "vec_dot",
    "word_shingles",
    "words",
]
