package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run ONE SparkEntry query with a listener that prints
  * every Spark job's wall time and call site — the "which of this entry's
  * 15 jobs is the expensive one" question the UI would answer if it were
  * enabled. Dev tooling only; never part of the bench or verify surface.
  *
  * Usage: runMain graft.JobTrace <entryName> [repeat]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobtrace")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(si =>
          si.name.takeWhile(_ != '\n').take(90) +
            s" [${js.stageInfos.size} stages]").getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"[job ${je.jobId}%3d] $ms%8.1f ms  $site")
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to repeat).foreach { i =>
      println(s"=== run $i of $name ===")
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // let listener drain
      println(f"=== total ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
    }
    spark.stop()
  }
}
