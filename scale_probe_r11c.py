"""Round-11 continuation probe: Hilbert vs Z-order file-bound quality.

Both curves give every output file a bounding box on BOTH clustered
columns; the difference is box tightness. The Z-curve takes long
diagonal jumps at power-of-two boundaries, so some files' boxes span
half the domain on one axis; consecutive Hilbert indexes are always
grid neighbors, so boxes stay compact. Tighter boxes = fewer files
overlap a range predicate = more skipping at 100 TB.

The probe lays the same 200k independent-uniform (x, y) rows into 64
files under each curve and reports (a) the mean and p95 per-file
bounding-box area, (b) how many files overlap each of 100 small query
boxes (the skipping proxy).

Usage:
    python scale_probe_r11c.py
"""

from __future__ import annotations

import time


def main() -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.layout import (
        hilbert_frame,
        zorder_frame,
    )
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    n, files, domain = 200_000, 64, 10_000
    df = spark.range(n).select(
        ((F.col("id") * 48271 + 11) % domain).alias("x"),
        ((F.col("id") * 69621 + 7) % domain).alias("y"),
    )

    results = {}
    for name, frame in (("zorder", zorder_frame),
                        ("hilbert", hilbert_frame)):
        t0 = time.monotonic()
        laid = frame(df, ["x", "y"], files)
        bounds = (
            laid.withColumn("f", F.spark_partition_id())
            .groupBy("f")
            .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                 F.min("y").alias("y0"), F.max("y").alias("y1"))
            .collect()
        )  # O(files) rows
        wall = time.monotonic() - t0
        areas = sorted(
            (r["x1"] - r["x0"] + 1) * (r["y1"] - r["y0"] + 1)
            for r in bounds
        )
        mean_area = sum(areas) / len(areas)
        p95 = areas[int(0.95 * len(areas))]

        # skipping proxy: 100 deterministic 5%-of-domain query boxes
        side = domain // 20
        overlaps = 0
        for q in range(100):
            qx = (q * 97) % (domain - side)
            qy = (q * 131) % (domain - side)
            overlaps += sum(
                1 for r in bounds
                if not (r["x1"] < qx or r["x0"] > qx + side
                        or r["y1"] < qy or r["y0"] > qy + side)
            )
        results[name] = (mean_area, p95, overlaps / 100, wall,
                         len(areas))
        print(f"{name:>7}: files={len(areas)} mean_area={mean_area:,.0f} "
              f"p95_area={p95:,} files_per_query={overlaps / 100:.1f} "
              f"wall={wall:.1f}s")

    za, ha = results["zorder"][0], results["hilbert"][0]
    zq, hq = results["zorder"][2], results["hilbert"][2]
    print(f"hilbert/zorder mean-area ratio: {ha / za:.2f}")
    print(f"hilbert/zorder files-touched ratio: {hq / zq:.2f}")


if __name__ == "__main__":
    main()
