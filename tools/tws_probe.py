"""Standing environment probe: is `transformWithStateInPandas` usable yet?

SURVEY §2.2-L documents TWS as environment-blocked: the Spark 4 TWS
Python worker speaks a state-server protocol that imports
``google.protobuf``, which is absent (and not installable) in this
container.  The verdict keeps a once-a-round re-probe item; this script
IS that probe, kept in-repo so the result is reproducible.

Exit 0 + "TWS USABLE" means the block has lifted (then build the gated
TWS twin of ``stream_stateful``); exit 0 + "TWS BLOCKED: <why>" means
the documented state stands.  Any other outcome is a probe bug.

Run:  python tools/tws_probe.py
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # Stage 1: the import the TWS python worker needs at runtime.
    try:
        import google.protobuf  # noqa: F401

        proto = "present"
    except ImportError as e:
        proto = f"ABSENT ({e})"

    # Stage 2: the API class itself.
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
            StatefulProcessorHandle,
        )
    except ImportError as e:
        print(f"TWS BLOCKED: StatefulProcessor import failed: {e}")
        return 0

    # Stage 3: a minimal end-to-end rate-source run (the r11 probe shape:
    # the class imports fine but the query dies at runtime when the TWS
    # worker can't import protobuf).
    import pandas as pd

    from pyspark.sql import SparkSession
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()
            total = (prev[0] if prev else 0) + n
            self._count.update((total,))
            yield pd.DataFrame({"key": [key[0]], "n": [total]})

        def close(self) -> None:
            pass

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("tws-probe")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        from pyspark.sql import functions as F

        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .select((F.col("value") % 3).alias("key"), "value")
        )
        out_schema = StructType(
            [StructField("key", LongType()), StructField("n", LongType())]
        )
        q = (
            src.groupBy("key")
            .transformWithStateInPandas(
                CountProcessor(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.format("memory")
            .queryName("tws_probe")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM tws_probe").collect()
            print(
                f"TWS USABLE: protobuf={proto}; end-to-end run produced "
                f"{len(rows)} rows — lift the SURVEY block and build the "
                "gated stream_stateful TWS twin"
            )
        finally:
            q.stop()
    except Exception as e:  # noqa: BLE001 — the probe exists to classify this
        first = str(e).splitlines()[0] if str(e) else type(e).__name__
        print(f"TWS BLOCKED: protobuf={proto}; runtime failure: {first}")
        traceback.print_exc(limit=2, file=sys.stderr)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    main()
