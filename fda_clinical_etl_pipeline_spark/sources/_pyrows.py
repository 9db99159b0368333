"""Row-materialization helper shared by the pure-Python streaming
sources (hudi/iceberg/delta append + changelog readers).

Their ``read()`` methods yield plain Python tuples built from parquet
(pyarrow ``to_pylist``) or Avro log decodes. Parquet written under the
engine's UTC session stores session-naive timestamps (Spark's default
output type carries no UTC flag), so those values come back as NAIVE
datetimes — and Arrow refuses a naive value into a ``TimestampType``
(timestamptz) column when a Python data source materializes rows:
``TypeError: Cannot convert tz-naive Timestamp``. The values ARE UTC
instants (the engine pins ``spark.sql.session.timeZone=UTC``), so the
fix is to attach the UTC tzinfo — for TimestampType columns only;
TimestampNTZ must stay naive.
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T


def ts_fixer(fields):
    """``fix(name, value)`` for a list of StructFields: localizes naive
    datetimes to UTC on the TimestampType columns, passes everything
    else through. Returns a plain function (picklable closure) safe to
    use inside DataSourceStreamReader.read on executors."""
    ts_names = frozenset(
        f.name for f in fields if isinstance(f.dataType, T.TimestampType)
    )

    def fix(name, value):
        if (name in ts_names
                and isinstance(value, datetime.datetime)
                and value.tzinfo is None):
            return value.replace(tzinfo=datetime.timezone.utc)
        return value

    return fix
