package graft.streaming

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Crash-window recovery for the landing-dir compaction
  * (StreamingEtl.foldLanding + landingState). The publish order —
  * parquet base, then commit marker, then sweep — is load-bearing for
  * never losing or double-counting a row: these tests inject crashes at
  * each window via the fold's seams and assert the SELECTION (what the
  * next trigger would read) still covers exactly the original rows.
  * Mirrors the StableCsvCrashSpec pattern for the admission log.
  */
class LandingCompactionCrashSpec extends SparkSpec {

  private def mkLanding(): (Path, org.apache.hadoop.fs.FileSystem, Set[(String, Double)]) = {
    import spark.implicits._
    val dir = tmpDir("lcc")
    val out = new Path(dir.toString)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = (0 until 3).map { i =>
      val r = (s"L$i", 100.0 + i)
      Seq(r).toDF("loan_id", "amount")
        .write.mode("overwrite").parquet(f"$out/batch-$i%05d")
      r
    }
    (out, fs, rows.toSet)
  }

  /** Every row the selection rule would feed the next trigger. */
  private def selectedRows(fs: org.apache.hadoop.fs.FileSystem, out: Path): Set[(String, Double)] = {
    val (b, l) = StreamingEtl.landingState(fs, out)
    val paths = (b.map(_._2).toSeq ++ l.map(_._2)).map(_.toString)
    spark.read.parquet(paths: _*)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
  }

  private def foldAll(out: Path, fs: org.apache.hadoop.fs.FileSystem,
      beforeMarker: () => Unit = () => (), afterMarker: () => Unit = () => ()): Unit = {
    val (base, live) = StreamingEtl.landingState(fs, out)
    StreamingEtl.foldLanding(spark, fs, out, batchId = 3, base, live.filter(_._1 < 3),
      crashBeforeMarker = beforeMarker, crashAfterMarker = afterMarker)
  }

  test("happy path: fold leaves one marked base holding every row") {
    val (out, fs, rows) = mkLanding()
    foldAll(out, fs)
    val (b, l) = StreamingEtl.landingState(fs, out)
    assert(b.exists(_._1 == 3L) && l.isEmpty, s"expected only base-3: ${(b, l)}")
    assert(fs.exists(new Path(b.get._2, StreamingEtl.CommitMarker)))
    assert(selectedRows(fs, out) == rows)
  }

  test("crash between base publish and marker: base ignored on markerless clusters, no loss either way") {
    val (out, fs, rows) = mkLanding()
    intercept[RuntimeException](foldAll(out, fs,
      beforeMarker = () => throw new RuntimeException("injected: before marker")))
    // the local committer wrote _SUCCESS, so the complete-but-unmarked
    // base is already recognized — selection is exact
    assert(selectedRows(fs, out) == rows)
    // on a cluster with _SUCCESS disabled the same window leaves NO
    // commit evidence; with the covered dirs still present the base
    // must be ignored and the originals read — still exact
    fs.delete(new Path(s"$out/base-00003/_SUCCESS"), false)
    val (b, _) = StreamingEtl.landingState(fs, out)
    assert(b.isEmpty, "an unmarked base with its covered dirs present must be ignored")
    assert(selectedRows(fs, out) == rows)
    // recovery: the next fold at the same id republishes and completes
    foldAll(out, fs)
    assert(selectedRows(fs, out) == rows)
    assert(StreamingEtl.landingState(fs, out)._2.isEmpty, "retry must complete the sweep")
  }

  test("compaction toggled OFF over a base with crash leftovers: rows still counted exactly once") {
    // a run with compaction on suffers a marker-crash (sweep never ran,
    // leftover dirs below the base), then the operator restarts the
    // SAME checkpoint with compactInterval=0. The faithful mode must
    // still read through the base-aware selection — a blind recursive
    // read would count the leftovers alongside the base that already
    // holds their rows
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("loan_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount", org.apache.spark.sql.types.DoubleType)))
    val in = tmpDir("lcc-off-in"); val outD = tmpDir("lcc-off-out")
    val agg = tmpDir("lcc-off-agg"); val ckpt = tmpDir("lcc-off-ckpt")
    val n = 8
    (0 until n).foreach(i => writeFile(in, s"loan_$i.csv", s"loan_id,amount\nL$i,${i * 10.0}\n"))
    def stream() = StreamingEtl.csvFileStream(spark, in.toString, schema, maxFilesPerTrigger = 1)
    StreamingEtl.runWithBatchReport(stream(), outD.toString, agg.toString,
      tmpDir("lcc-off-rep1").toString, ckpt.toString, compactInterval = 3)
    val out = new Path(outD.toString)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (base, _) = StreamingEtl.landingState(fs, out)
    assert(base.isDefined)
    // plant an unswept leftover BELOW the base, duplicating a folded
    // row — exactly what a crash between marker and sweep leaves behind
    Seq(("L0", 0.0)).toDF("loan_id", "amount")
      .write.parquet(f"$out/batch-${base.get._1 - 1}%05d")

    // restart the same checkpoint with compaction OFF + one new file
    writeFile(in, s"loan_$n.csv", s"loan_id,amount\nL$n,${n * 10.0}\n")
    StreamingEtl.runWithBatchReport(stream(), outD.toString, agg.toString,
      tmpDir("lcc-off-rep2").toString, ckpt.toString) // compactInterval = 0
    val total = spark.read.parquet(agg.toString).collect()
      .map(_.getAs[Long]("loan_count")).sum
    assert(total == n + 1,
      s"expected the ${n + 1} landed rows exactly once, leftover excluded; got $total")
  }

  test("randomized land/fold/crash sequences: selection is exact after every step") {
    // generalizes the pinned windows: any interleaving of landings,
    // completed folds, and folds crashed at either seam (optionally on
    // a marker-less cluster) must leave the selection covering exactly
    // the landed rows — no loss, no double count — at EVERY step, not
    // just at quiescence. Fixed seeds keep failures reproducible.
    import spark.implicits._
    for (seed <- Seq(7L, 41L, 1913L)) {
      val rng = new scala.util.Random(seed)
      val dir = tmpDir(s"lccr$seed")
      val out = new Path(dir.toString)
      val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val expected = scala.collection.mutable.Set.empty[(String, Double)]
      (0 until 10).foreach { id =>
        val row = (s"L$seed-$id", id * 10.0)
        Seq(row).toDF("loan_id", "amount")
          .write.mode("overwrite").parquet(f"$out/batch-$id%05d")
        expected += row
        val (base, live) = StreamingEtl.landingState(fs, out)
        val foldable = live.filter(_._1 < id)
        if (foldable.size >= 3) rng.nextInt(3) match {
          case 0 => // completed fold
            StreamingEtl.foldLanding(spark, fs, out, id, base, foldable)
          case 1 => // crash before the marker; sometimes marker-less cluster
            intercept[RuntimeException](StreamingEtl.foldLanding(
              spark, fs, out, id, base, foldable,
              crashBeforeMarker = () => throw new RuntimeException("injected")))
            if (rng.nextBoolean())
              fs.delete(new Path(f"$out/base-$id%05d/_SUCCESS"), false)
          case _ => // crash after the marker, before the sweep
            intercept[RuntimeException](StreamingEtl.foldLanding(
              spark, fs, out, id, base, foldable,
              crashAfterMarker = () => throw new RuntimeException("injected")))
        }
        assert(selectedRows(fs, out) == expected.toSet,
          s"seed=$seed step=$id: selection diverged from the landed rows")
      }
    }
  }

  test("crash between marker and sweep: base authoritative, leftovers excluded (no double count)") {
    val (out, fs, rows) = mkLanding()
    intercept[RuntimeException](foldAll(out, fs,
      afterMarker = () => throw new RuntimeException("injected: after marker")))
    // marker landed, sweep never ran: every batch dir is a redundant
    // leftover whose rows the base already holds — selection must pick
    // the base and exclude them, or aggregates double
    val (b, l) = StreamingEtl.landingState(fs, out)
    assert(b.exists(_._1 == 3L), "marked base must be authoritative")
    assert(l.isEmpty, s"leftover dirs below the base must be excluded: $l")
    assert(selectedRows(fs, out) == rows)
    // and they are re-swept by a later fold (id 4, nothing to read below
    // it but the sweep clears the orphans)
    StreamingEtl.foldLanding(spark, fs, out, batchId = 4, b, Seq.empty)
    val names = fs.listStatus(out).map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith("batch-")),
      s"orphaned batch dirs must be swept by the next fold: $names")
    assert(selectedRows(fs, out) == rows)
  }
}
