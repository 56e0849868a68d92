package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement helper: run named queries once (after an
  * untimed warmup) and print a per-stage breakdown — duration, input bytes,
  * shuffle read/write bytes — from a SparkListener, so the expensive stage
  * of a slow query is identifiable without the UI (headless box).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile <query substring>..."
  */
object Profile {

  private case class StageRow(
      id: Int, name: String, seconds: Double,
      inputMB: Double, shReadMB: Double, shWriteMB: Double,
      spillMB: Double, tasks: Int)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query substring>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    spark.sparkContext.setLogLevel("WARN")

    val stages = ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val secs = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1e3).getOrElse(0.0)
        stages.synchronized {
          stages += StageRow(
            si.stageId, si.name.takeWhile(_ != '\n').take(90), secs,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.memoryBytesSpilled / 1e6,
            si.numTasks)
        }
      }
    }

    def execute(name: String): Unit = {
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.exists(n.contains))
    names.foreach { n =>
      try execute(n) catch { case scala.util.control.NonFatal(_) => () } // warmup
      stages.synchronized(stages.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try execute(n) catch {
        case scala.util.control.NonFatal(ex) =>
          println(s"[profile] $n FAILED: ${ex.getMessage}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // a late-finishing stage can still race the report; snapshot
      val snap = stages.synchronized(stages.sortBy(-_.seconds).toVector)
      println(f"%n=== $n  wall=$wall%.3f s  stages=${snap.size} ===")
      println(f"${"sec"}%8s ${"input"}%9s ${"shRead"}%9s ${"shWrite"}%9s ${"spill"}%8s ${"tasks"}%5s  name")
      snap.take(18).foreach { r =>
        println(f"${r.seconds}%8.3f ${r.inputMB}%8.1fM ${r.shReadMB}%8.1fM ${r.shWriteMB}%8.1fM ${r.spillMB}%7.1fM ${r.tasks}%5d  [${r.id}] ${r.name}")
      }
      val totalStageSecs = snap.map(_.seconds).sum
      println(f"[profile] $n stage-seconds total=$totalStageSecs%.3f (wall $wall%.3f)")
    }
    spark.stop()
  }
}
