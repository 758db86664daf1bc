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

  test("late stragglers to sealed windows are dropped, open windows accept") {
    val result = graft.SparkEntry.queries("stream_late_data")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf0001)
    val b1 = ev.filter(!StreamingOps.isLateStraggler(col("event_id")))
    val wm1 = b1.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime -
      53000L
    // batch recomputation of the no-drop world: every straggler counted
    val noDrop = ev
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("n"), (col("w.end").cast("long") * 1000).as("endMs"))
      .collect()
    // sealed windows (end <= wm1) must carry b1-only counts — i.e. any
    // sealed window containing a straggler shows count < the no-drop
    // count; and at least one such drop must exist in the corpus
    val b1Counts = b1
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var drops = 0L
    noDrop.filter(_.getLong(2) <= wm1).foreach { r =>
      val (ws, nAll) = (r.getString(0), r.getLong(1))
      // a sealed window whose rows were ALL stragglers vanishes entirely
      assert(result.getOrElse(ws, 0L) == b1Counts.getOrElse(ws, 0L),
        s"sealed window $ws must hold batch-1-only rows")
      drops += nAll - b1Counts.getOrElse(ws, 0L)
    }
    assert(drops > 0, "corpus should exercise the late-drop path")
  }

  test("stream_rolling_anomaly equals the batch rolling z-score") {
    val stream = graft.SparkEntry.queries("stream_rolling_anomaly")(
      spark, sf0001).collect().map(_.toSeq).toSeq
    val batch = graft.SparkEntry.queries("q_rolling_anomaly")(
      spark, sf0001).collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("stream_psi_drift: per-day PSI matches a driver-side recompute") {
    val rows = graft.SparkEntry.queries("stream_psi_drift")(spark, sf0001)
      .collect()
    // raw observations, using Spark's own date semantics for the day key
    val obs = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def bin(v: Double): Int =
      if (v < 10) 0 else if (v < 25) 1 else if (v < 50) 2
      else if (v < 100) 3 else 4
    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val baseCnt = obs.groupBy(o => bin(o._2)).view.mapValues(_.length.toLong)
    val nb = obs.length.toLong
    val byDay = obs.groupBy(_._1)
    // one output row per observed day, ascending
    assert(rows.map(_.getString(0)).toSeq == byDay.keys.toSeq.sorted)
    rows.foreach { r =>
      val (day, nDay, psi, alert) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))
      val dayObs = byDay(day)
      assert(nDay == dayObs.length.toLong)
      val dayCnt = dayObs.groupBy(o => bin(o._2)).view
        .mapValues(_.length.toLong)
      val expected = rnd((0 until 5).map { b =>
        val pa = rnd((dayCnt.getOrElse(b, 0L) + 1).toDouble / (nDay + 5), 8)
        val pb = rnd((baseCnt.getOrElse(b, 0L) + 1).toDouble / (nb + 5), 8)
        rnd((pa - pb) * math.log(pa / pb), 6)
      }.sum, 4)
      assert(psi == expected, s"day $day psi $psi != $expected")
      assert(psi >= 0.0 && alert == (if (psi >= 0.1) 1 else 0))
    }
  }

  test("stream_ab_monitor: one-row z readout with both arms populated") {
    val rows = graft.SparkEntry.queries("stream_ab_monitor")(
      spark, sf0001).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    assert(!r.isNullAt(r.fieldIndex("z_stat")))
  }
}
