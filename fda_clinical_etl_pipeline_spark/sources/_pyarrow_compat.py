"""Compatibility guards for the pyarrow-based partition readers.

The custom Python DataSource streams materialize data files with
pyarrow on the executors. pyarrow 16.x cannot parse parquet footers
that carry the VARIANT logical type (Spark 4 writes it for
VariantType columns), failing with an opaque
``OSError: Metadata contains Thrift LogicalType that is not
recognized`` deep inside a micro-batch. Refuse up front, at source
construction, with an actionable message instead."""

from __future__ import annotations

from pyspark.sql import types as T


def refuse_variant_columns(
    schema: T.StructType | None, source: str
) -> None:
    if schema is None:
        return  # reader resolves its schema later
    bad = [
        f.name for f in schema.fields
        if isinstance(f.dataType, T.VariantType)
    ]
    if bad:
        raise ValueError(
            f"{source} cannot stream VARIANT column(s) {bad}: its "
            "partition readers materialize parquet via pyarrow, and "
            "the installed pyarrow cannot parse the variant logical "
            "type. Read the table via snapshot() (JVM parquet reader "
            "handles variant), or shred the variant into typed "
            "columns (operators/variant.shred_variant) before "
            "streaming."
        )
