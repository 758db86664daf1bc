package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-loop skew attribution for ONE gated query: runs it with a
  * per-stage task listener and prints every stage's task count, median
  * and max task millis, and the stage NAME (callsite) — so a SCALESMOKE
  * "SKEWED" verdict is attributed to a specific exchange instead of
  * guessed (the AfpProbe/PhashProbe convention, generalized).
  * Run: `runMain graft.tools.SkewProbe <query> [dir]` — dir defaults to
  * the 10× replicated corpus ScaleSmoke stages. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewProbe <queryName> [dataDir]")
    val name = args(0)
    val dir = if (args.length > 1) args(1)
      else "/root/repo/target/scale-heavy"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tasks = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(t.taskInfo.duration)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        names.put(s.stageInfo.stageId,
          s.stageInfo.name + "\n" + s.stageInfo.details)
    })

    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(2000) // let the listener bus drain

    import scala.jdk.CollectionConverters._
    val rows = tasks.asScala.toSeq.map { case (sid, q) =>
      val ds = q.asScala.toSeq.sorted
      val med = math.max(ds(ds.length / 2), 1L)
      (sid, ds.length, med, ds.last, ds.last.toDouble / med)
    }.sortBy(-_._4)
    println(f"${"stage"}%6s ${"tasks"}%6s ${"med ms"}%8s ${"max ms"}%8s ${"skew"}%6s  name")
    rows.take(15).foreach { case (sid, n, med, mx, sk) =>
      val nm = Option(names.get(sid)).getOrElse("?")
        .linesIterator.next().take(90)
      println(f"$sid%6d $n%6d $med%8d $mx%8d $sk%6.1f  $nm")
    }
    // full callsites of the skewed stages — the graft frames involved
    rows.filter(r => r._5 > 5.0 && r._3 >= 300).foreach { case (sid, _, _, _, _) =>
      println(s"--- stage $sid details")
      Option(names.get(sid)).getOrElse("?").linesIterator
        .filter(l => l.contains("graft") || l.contains("Exchange") ||
          l.contains("at "))
        .take(12).foreach(l => println(s"  $l"))
    }
    graft.CacheRegistry.releaseAll()
    graft.CacheRegistry.releaseShared()
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0)
  }
}
