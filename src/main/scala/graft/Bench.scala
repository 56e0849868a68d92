package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Measurement discipline (round-1 + round-5 verdict fixes):
  *   - the timed action is a noop-format write, not count() — count() lets
  *     Catalyst prune projection-only queries down to a scan-count;
  *   - one untimed warmup pass over all queries absorbs JVM/codegen warmup;
  *   - reported value is the median of 5 timed runs per query, and the
  *     runs are INTERLEAVED (pass 1 runs every query once, then pass 2,
  *     ...), so one query's samples are minutes apart: a multi-minute
  *     host disturbance (this box is a shared-host VM — load invisible
  *     to /proc/loadavg) corrupts at most 2 of 5 samples of any query
  *     instead of every consecutive sample, and the median rejects it;
  *   - /proc/loadavg is recorded before and after so a load-contaminated
  *     run is identifiable from the artifact alone (three rounds of
  *     3x per-query swings on untouched code traced to box load);
  *   - per-query timings print with 3-decimal precision: the driver
  *     captures a bounded tail of the sbt output, and the full-precision
  *     line (~3.5 KB for 68 queries) was getting head-truncated in the
  *     round-5 artifact. Full per-run detail goes to BENCH_RUNS.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // optional reliable-checkpoint dir for iterative CC (see etl.Sessions)
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "" }

    // Full-query action: forces every operator/column to execute without
    // writing bytes anywhere. Each run starts cache-cold: queries that
    // persist() intermediates (LSH/MinHash) would otherwise accumulate
    // never-unpersisted frames across the 4 passes (1 warmup + 3 timed)
    // over all catalog queries and churn the block manager, contaminating
    // later timings.
    def execute(name: String): Unit = {
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    // optional args: query-name substrings to bench in isolation
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (args.isEmpty) all else all.filter(n => args.exists(n.contains))
    val loadBefore = loadavg()
    names.foreach { n => // warmup (untimed)
      try execute(n) catch { case scala.util.control.NonFatal(_) => () }
    }
    val passes = 5
    val samples: Seq[Seq[(String, Double)]] = (1 to passes).map { _ =>
      names.map { n =>
        val t0 = System.nanoTime()
        try execute(n)
        catch { case scala.util.control.NonFatal(_) => () }
        n -> (System.nanoTime() - t0) / 1e9
      }
    }
    val runsByQuery: Seq[(String, Seq[Double])] =
      names.map(n => n -> samples.map(_.toMap.apply(n)))
    val loadAfter = loadavg()
    val timings = runsByQuery.map { case (n, runs) =>
      n -> runs.sorted.apply(passes / 2)
    }
    // Locale.ROOT: default-locale formatting would emit "12,345" on a
    // comma-decimal JVM and corrupt the JSON artifacts
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = timings.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":$passes,""" +
        s""""load_before":"$loadBefore","load_after":"$loadAfter",""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
    val runsJson = runsByQuery.map { case (k, rs) =>
      s"\"" + k + "\":[" + rs.map(f3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val runsLine =
      s"""{"load_before":"$loadBefore","load_after":"$loadAfter","runs":$runsJson,"sf":"$sfDir"}"""
    // The metrics line must survive log-tail truncation: persist it to a
    // dedicated file, print it immediately, and print it again as the very
    // last line after spark.stop() so neither head- nor tail-truncation of
    // the sbt output can lose it.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_OUT.json"), line + "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_RUNS.json"), runsLine + "\n")
    println(line)
    Console.out.flush()
    spark.stop()
    println(line)
    Console.out.flush()
  }
}
