"""Streaming clinical pipeline: the reference's polling state machine
(etl/validate.py:42-50 etc.) as ONE Structured Streaming flow.

The reference runs 4 processes that each poll Postgres for work in the
prior status. Here a single streaming query watches the source directory;
every micro-batch runs the SAME validate→scrub→canonicalize plan the
batch pipeline uses (plans are shared — only the source differs) inside
``foreachBatch``, with provenance recorded per micro-batch. The
checkpoint replaces the status-machine's "which files have I seen"
bookkeeping; replayed batches keep their batchId, so provenance writes
can be made idempotent exactly like the reference's ON CONFLICT insert.

At scale: maxFilesPerTrigger bounds micro-batch size; the per-batch plan
is the narrow no-shuffle ETL spine, so streaming throughput is scan-bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import SourceMeta
from ..functions.scrub import DEFAULT_PHI_RULES, scrub_dataframe
from ..plans import canonical
from ..plans.provenance import ProvenanceStore
from ..plans.validate import validate


class StreamingClinicalPipeline:
    """Continuous ingest for one CSV source: every new file that lands in
    ``source_dir`` flows through validate → scrub → canonicalize into the
    QLM zone, with quarantine and provenance per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        source: SourceMeta,
        source_dir: str,
        out_root: str,
    ):
        self.spark = spark
        self.source = source
        self.source_dir = source_dir
        self.out_root = out_root
        self.prov = ProvenanceStore(spark, os.path.join(out_root, "provenance"))

    def _schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.column_name, T.StringType(), True)
                for c in self.source.columns
            ]
        )

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The shared stage plans, applied to one micro-batch."""
        if batch_df.isEmpty():
            return
        src = self.source
        meta = [c.as_dict() for c in src.columns]
        bid = f"{src.source_name}_stream_{batch_id}"

        n_total = batch_df.count()
        self.prov.register_batch(bid, src.source_name, self.source_dir, "")
        self.prov.record_step(bid, "INGEST", {"micro_batch": batch_id,
                                              "rows": n_total})

        result = validate(batch_df.drop("_input_file"), meta)
        n_bad = result.quarantine.count()
        if n_bad:
            result.quarantine.withColumn(
                "_errors", F.to_json("_errors")
            ).write.mode("append").parquet(
                os.path.join(self.out_root, "quarantine", src.source_name)
            )
            self.prov.record_step(bid, "QUARANTINE_MOVED", {"rows": n_bad})
        valid = result.valid
        if valid.isEmpty():
            self.prov.update_status(bid, "FAILED_VALIDATION",
                                    total_rows=n_total,
                                    error_details=f"{n_bad} invalid rows")
            return
        self.prov.record_step(bid, "VALIDATION_PASSED",
                              {"rows": n_total - n_bad})

        scrubbed = scrub_dataframe(valid, meta, DEFAULT_PHI_RULES)
        self.prov.record_step(bid, "SCRUB_PHI", {})

        out = canonical.canonicalize_hospital_a(scrubbed) if (
            src.source_type == "csv"
        ) else canonical.canonicalize_clinic_b(scrubbed)
        out.write.mode("append").parquet(
            os.path.join(self.out_root, "qlm_ready", src.source_name)
        )
        self.prov.record_step(bid, "TRANSFORM", {})
        self.prov.update_status(bid, "COMPLETED", total_rows=n_total - n_bad)

    def start(self, checkpoint_dir: str, max_files_per_trigger: int = 100,
              available_now: bool = True):
        """Build and start the streaming query. Returns the StreamingQuery."""
        stream = (
            self.spark.readStream.schema(self._schema())
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("header", True)
            .csv(self.source_dir)
            .withColumn("_input_file", F.input_file_name())
        )
        writer = stream.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
