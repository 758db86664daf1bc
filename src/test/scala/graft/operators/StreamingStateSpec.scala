package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}
import graft.{SparkTestBase, Tables}

/** Custom stateful streaming (KeyValueGroupedDataset.mapGroupsWithState):
  * the per-key state path the built-in aggregations don't cover. The
  * invariant under test is batch/stream parity — the streamed per-user
  * event count must equal the batch groupBy, with state maintained across
  * micro-batches. */
class StreamingStateSpec extends SparkTestBase {

  test("mapGroupsWithState running counts equal batch counts") {
    import spark.implicits._
    val dir = StreamingOps.stagedEventsDir(spark, sf0001)
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema)
      // two micro-batches so state genuinely carries across batches
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("user_id").as[Long])
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, events: Iterator[Long],
         state: org.apache.spark.sql.streaming.GroupState[Long]) => {
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
        })
      .toDF("user_id", "n_events")

    val q = stream.writeStream
      .format("memory").queryName("graft_state_sink")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // update mode emits one row per key per micro-batch; the final count
    // per key is the max
    val streamed = spark.table("graft_state_sink")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
