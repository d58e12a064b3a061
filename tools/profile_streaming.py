"""Profile the micro-batch machinery of the two most expensive streaming
bench entries (r4 verdict item 3): stream_stream_left_join and
stream_session_windows.

Splits wall-clock into query-START overhead, per-micro-batch durations
(triggerExecution / addBatch / getBatch / walCommit / stateOperators commit
times), and drain TEARDOWN — across shuffle-partition counts, because
streaming state stores are instantiated one per shuffle partition at query
start (a stream-stream join keeps FOUR stores per partition) and are never
AQE-coalesced: at fixture scale the store lifecycle, not the data, is the
hypothesis for the cost.

Usage: python tools/profile_streaming.py [sf_dir]
"""
import json
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from forgottenlandapp_etl_spark.session import build_session  # noqa: E402
from forgottenlandapp_etl_spark.streaming.sessions import GAP  # noqa: E402
from forgottenlandapp_etl_spark.streaming.ts import staged_events_stream  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def drain_profiled(stream_df, name):
    spark = stream_df.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="prof_ckpt_")
    t0 = time.perf_counter()
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        t_started = time.perf_counter()
        q.awaitTermination()
        t_done = time.perf_counter()
        prog = [json.loads(p.json) for p in q.recentProgress]
        n_rows = spark.table(qname).count()
        t_read = time.perf_counter()
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)
    batches = []
    for p in prog:
        d = p.get("durationMs", {})
        st = [
            {
                k: so.get(k)
                for k in (
                    "operatorName",
                    "commitTimeMs",
                    "timeTakenMs",
                    "numRowsTotal",
                    "numShufflePartitions",
                )
            }
            for so in p.get("stateOperators", [])
        ]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
                "state": st,
            }
        )
    return {
        "rows": n_rows,
        "start_s": round(t_started - t0, 3),
        "run_s": round(t_done - t_started, 3),
        "read_s": round(t_read - t_done, 3),
        "total_s": round(t_read - t0, 3),
        "batches": batches,
    }


def left_join_stream(spark, sf_dir, band="2 hours", watermark="1 hour"):
    ctx = staged_events_stream(spark, sf_dir)
    base = ctx.__enter__()
    errors = (
        base.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id"),
            F.col("ets").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ets").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("error_ts"))
        & (F.col("click_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {band}")),
        "leftOuter",
    ).select("error_id", "click_id", "user_id")
    return joined, ctx


def sessions_stream(spark, sf_dir):
    ctx = staged_events_stream(spark, sf_dir)
    base = ctx.__enter__()
    sess = (
        base.withWatermark("ets", "0 seconds")
        .groupBy(F.session_window("ets", GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("session_start"),
            F.col("w.end").cast("string").alias("session_end"),
            "user_id",
            "n",
        )
    )
    return sess, ctx


def main():
    spark = build_session(app_name="profile-streaming")
    for parts in (32, 8, 4, 1):
        for label, builder in (
            ("left_join", left_join_stream),
            ("sessions", sessions_stream),
        ):
            sdf, ctx = builder(spark, SF)
            # AFTER the staging context is entered: staged_events_stream
            # applies sized_state_partitions on entry, which would clamp
            # every sweep leg to the sized value — the whole point of this
            # tool is to measure the un-sized grid, so override it here
            # (state layout is fixed at query START, i.e. inside the drain)
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                # warm run then measured run, matching bench policy
                r = drain_profiled(sdf, f"{label}_w")
                r2 = drain_profiled(sdf, label)
            finally:
                ctx.__exit__(None, None, None)
            print(f"== {label} parts={parts} rows={r2['rows']} "
                  f"total={r2['total_s']}s (warm {r['total_s']}s) "
                  f"start={r2['start_s']} run={r2['run_s']}")
            for b in r2["batches"]:
                d = b["durationMs"]
                print(
                    f"   batch {b['batchId']}: in={b['numInputRows']} "
                    f"trigger={d.get('triggerExecution')}ms "
                    f"addBatch={d.get('addBatch')}ms "
                    f"getBatch={d.get('getBatch')}ms "
                    f"wal={d.get('walCommit')}ms "
                    f"state={[(s['commitTimeMs'], s['numShufflePartitions']) for s in b['state']]}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
