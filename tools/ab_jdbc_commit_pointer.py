# python tools/ab_jdbc_commit_pointer.py [--rounds 3]
#
# r13 task 5 (VERDICT r12): interleaved A/B of the JDBC exactly-once
# sink patterns on the full q_stream_jdbc_exactly_once protocol (two
# availableNow drains + committed readback, 100k events at sf0.1):
#   arm A: r12 staging-swap (stage append + DELETE target + INSERT..
#          SELECT copy + DELETE stage per epoch) — inlined verbatim
#   arm B: r13 versioned epochs + commit pointer (append once + flip
#          + garbage-collect)
# Both arms assert the same (n_rows, n_distinct, value_fp_sum) readout.
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def foreach_batch_jdbc_sink_staging(
    spark, sf_dir, checkpoint_dir, table_name
) -> str:
    """The r12 staging-swap sink, verbatim (pre-r13 form)."""
    from bigdata_deepfakeanalysis_spark.operators.sources import _derby_url
    from bigdata_deepfakeanalysis_spark.streaming.batch_equiv import (
        stream_events,
    )

    url = _derby_url(spark)
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    stage_name = f"{table_name}_stage"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        for t in (table_name, stage_name):
            meta = conn.getMetaData().getTables(None, None, t.upper(), None)
            if not meta.next():
                st = conn.createStatement()
                st.execute(
                    f"CREATE TABLE {t} (epoch BIGINT, event_id BIGINT,"
                    f" user_id BIGINT, value DOUBLE)"
                )
                st.close()
    finally:
        conn.close()

    stream = stream_events(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        c = jvm.java.sql.DriverManager.getConnection(url)
        try:
            s = c.createStatement()
            s.execute(f"DELETE FROM {stage_name} WHERE epoch = {e}")
            s.close()
        finally:
            c.close()
        (
            df.withColumn("epoch", F.lit(e))
            .select("epoch", "event_id", "user_id", "value")
            .write.mode("append")
            .format("jdbc")
            .option("url", url)
            .option("dbtable", stage_name)
            .option("driver", driver)
            .option("batchsize", "10000")
            .save()
        )
        c = jvm.java.sql.DriverManager.getConnection(url)
        try:
            c.setAutoCommit(False)
            s = c.createStatement()
            try:
                s.execute(f"DELETE FROM {table_name} WHERE epoch = {e}")
                s.execute(
                    f"INSERT INTO {table_name}"
                    f" SELECT epoch, event_id, user_id, value"
                    f" FROM {stage_name} WHERE epoch = {e}"
                )
                s.execute(f"DELETE FROM {stage_name} WHERE epoch = {e}")
                c.commit()
            except Exception:
                c.rollback()
                raise
            finally:
                s.close()
        finally:
            c.close()

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return url


def main() -> int:
    rounds = 3
    argv = iter(sys.argv[1:])
    for a in argv:
        if a == "--rounds":
            rounds = int(next(argv))
    sf_dir = "/root/testdata/sf0.1"

    from bigdata_deepfakeanalysis_spark.session import tune
    from bigdata_deepfakeanalysis_spark.catalog import staging_dir
    from bigdata_deepfakeanalysis_spark.streaming import batch_equiv as BE

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune(spark)
    tag = Path(sf_dir).name.replace(".", "_")

    def readout(url, dbtable):
        df = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", dbtable)
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .option("fetchsize", "10000")
            .load()
        )
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("event_id").alias("n_distinct"),
            F.sum(F.expr("CAST(FLOOR(value * 1000) AS BIGINT)"))
            .cast("bigint")
            .alias("value_fp_sum"),
        ).collect()[0]

    def run(arm: str, i: int):
        name = f"ab_eo_{arm}_{tag}_{i}"
        t0 = time.time()
        url = None
        for attempt in range(2):
            ckpt = staging_dir(f"ab_eo_ckpt_{arm}_{i}_{attempt}")
            shutil.rmtree(ckpt, ignore_errors=True)
            if arm == "staging":
                url = foreach_batch_jdbc_sink_staging(
                    spark, sf_dir, str(ckpt), name
                )
            else:
                url = BE.foreach_batch_jdbc_sink(
                    spark, sf_dir, str(ckpt), name
                )
        dbt = (
            name if arm == "staging" else BE.jdbc_committed_view(name)
        )
        row = readout(url, dbt)
        return round(time.time() - t0, 3), tuple(row)

    ta, tb = [], []
    ra = rb = None
    for i in range(rounds):
        dt, ra = run("staging", i)
        ta.append(dt)
        dt, rb = run("pointer", i)
        tb.append(dt)
        print(f"round {i}: staging {ta[-1]}  pointer {tb[-1]}", flush=True)
        assert ra == rb, (ra, rb)
    print("readout equal:", ra == rb, ra)
    print(
        f"RESULT staging(min={min(ta)}, all={ta})"
        f" pointer(min={min(tb)}, all={tb})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
