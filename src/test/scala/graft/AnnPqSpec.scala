package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.AnnPq
import graft.functions.{PqCompute, PqFunctions}

/** Contract for product-quantized ANN (q107): the native encode/LUT
  * expressions reproduce the documented arithmetic exactly, null/dirty
  * vectors stay total, results are partitioning-independent, and the
  * ADC shortlist keeps usable recall against the exact q24 baseline.
  */
class AnnPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** The documented encode, recomputed independently on the driver. */
  private def refEncode(x: Array[Float], cb: Seq[Seq[Seq[Double]]],
      subDim: Int): Array[Int] =
    cb.zipWithIndex.map { case (cbj, j) =>
      var best = Double.MaxValue
      var bestR = 0
      cbj.zipWithIndex.foreach { case (c, r) =>
        var acc = 0.0
        (0 until subDim).foreach { d =>
          val diff = x(j * subDim + d).toDouble - c(d)
          acc += diff * diff
        }
        val dist = PqCompute.round6(acc)
        if (dist < best) { best = dist; bestR = r }
      }
      bestR
    }.toArray

  test("pq_encode equals the reference argmin-round6 computation") {
    val cb = AnnPq.codebook(emb)
    val rows = emb
      .select(col("embedding"),
        PqFunctions.pqEncode(col("embedding"), cb, AnnPq.SubDim).as("codes"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val x = r.getSeq[Float](0).toArray
      val codes = r.getSeq[Int](1).toArray
      assert(codes.sameElements(refEncode(x, cb, AnnPq.SubDim)))
      assert(codes.forall(c => c >= 0 && c < cb.head.length))
    }
  }

  test("pq_lut equals the reference quantized sub-dots") {
    val cb = AnnPq.codebook(emb)
    val rows = emb.filter(col("vec_id") < 5)
      .select(col("embedding"),
        PqFunctions.pqLut(col("embedding"), cb, AnnPq.SubDim).as("lut"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getSeq[Float](0).toArray
      val lut = r.getSeq[Long](1).toArray
      val ksub = cb.head.length
      cb.zipWithIndex.foreach { case (cbj, j) =>
        cbj.zipWithIndex.foreach { case (c, rr) =>
          var acc = 0.0
          (0 until AnnPq.SubDim).foreach(d => acc += q(j * AnnPq.SubDim + d).toDouble * c(d))
          assert(lut(j * ksub + rr) === math.floor(acc * 1000000.0 + 0.5).toLong)
        }
      }
    }
  }

  test("dirty vectors (null / wrong length / null element) encode to NULL") {
    val cb = AnnPq.codebook(emb)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val dirty = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, null),
        Row(2L, Seq.fill(7)(0.5f)),                       // wrong length
        Row(3L, Seq.fill[Any](63)(0.5f) :+ (null: Any)),  // null element
        Row(4L, Seq.fill(64)(0.25f))),                    // clean
      schema)
    val out = dirty
      .select(col("vec_id"),
        PqFunctions.pqEncode(col("embedding"), cb, AnnPq.SubDim).as("codes"),
        PqFunctions.pqLut(col("embedding"), cb, AnnPq.SubDim).as("lut"))
      .collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2)))
      .toMap
    assert(out(1L) === ((true, true)))
    assert(out(2L) === ((true, true)))
    assert(out(3L) === ((true, true)))
    assert(out(4L) === ((false, false)))
  }

  test("q107 recall vs exact q24 is >= 0.4") {
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q24_ann_cosine")
    val pq = pairs("q107_ann_pq")
    assert(exact.nonEmpty)
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall: missed ${(exact -- pq).size} of ${exact.size}")
    info(s"PQ recall = $recall")
  }

  test("q107 exact-re-rank cosines agree with q24 on shared pairs") {
    def scored(name: String): Map[(Long, Long), Double] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = scored("q24_ann_cosine")
    val pq = scored("q107_ann_pq")
    val shared = exact.keySet & pq.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(exact(k) === pq(k)))
  }

  test("q107 is partition-independent") {
    val a = AnnPq.annTopK(emb).collect().toSeq
    val b = AnnPq.annTopK(emb.repartition(7)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q109 ivf-pq: cells genuinely bound the candidate set") {
    // widening the probe to every cell must recover the pure-PQ ranking:
    // nprobe = nlist makes the cell equi-join a no-op filter, so any
    // difference between q109@full-probe and q107 would mean the cell
    // stage changes scores (it must only SELECT candidates)
    val full = AnnPq.ivfPqTopK(emb, nprobe = graft.ops.AnnIvf.NList).collect().toSeq
    val pq = AnnPq.annTopK(emb).collect().toSeq
    assert(full === pq)
    assert(full.nonEmpty)
  }

  test("q109 recall vs exact q24 is >= 0.3") {
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q24_ann_cosine")
    val ivfpq = pairs("q109_ann_ivfpq")
    assert(exact.nonEmpty)
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall: missed ${(exact -- ivfpq).size} of ${exact.size}")
    info(s"IVF-PQ recall = $recall")
  }

  test("q109 exact-re-rank cosines agree with q24 on shared pairs") {
    def scored(name: String): Map[(Long, Long), Double] =
      SparkEntry.queries(name)(spark, sf)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = scored("q24_ann_cosine")
    val ivfpq = scored("q109_ann_ivfpq")
    val shared = exact.keySet & ivfpq.keySet
    assert(shared.nonEmpty)
    shared.foreach(k => assert(exact(k) === ivfpq(k)))
  }

  test("q109 is partition-independent") {
    val a = AnnPq.ivfPqTopK(emb).collect().toSeq
    val b = AnnPq.ivfPqTopK(emb.repartition(7)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("pq index store: querying the store is bit-equal to the in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    AnnPq.writePqIndex(emb, dir)
    val stored = AnnPq.ivfPqTopKFromIndex(emb, dir).collect().toSeq
    val mem = AnnPq.ivfPqTopK(emb).collect().toSeq
    assert(stored === mem)
    assert(stored.nonEmpty)
  }

  test("pq index store: base + appended delta equals the union with base quantizers") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    // base keeps every vec_id < 16 so the first-k quantizers of base and
    // union coincide (any append split — the q98 store contract)
    val base = emb.filter(col("vec_id") % 50 =!= 17 || col("vec_id") < 16)
    val delta = emb.filter(col("vec_id") % 50 === 17 && col("vec_id") >= 16)
    AnnPq.writePqIndex(base, dir)
    AnnPq.appendPqIndex(delta, dir)
    val stored = AnnPq.ivfPqTopKFromIndex(emb, dir).collect().toSeq
    val full = AnnPq.ivfPqTopK(emb).collect().toSeq
    assert(stored === full)
    assert(stored.nonEmpty)
  }

  test("pq index store: delete evicts a former top hit; compact folds the log in losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    AnnPq.writePqIndex(emb, dir)
    val before = AnnPq.ivfPqTopKFromIndex(emb, dir).collect()
    assert(before.nonEmpty)
    // delete every query's current TOP hit — the strongest eviction test
    val victims = before.filter(_.getLong(3) == 1L).map(_.getLong(1)).distinct
    import spark.implicits._
    AnnPq.deleteFromPqIndex(victims.toSeq.toDF("vec_id"), dir)
    val after = AnnPq.ivfPqTopKFromIndex(emb, dir).collect()
    assert(!after.exists(r => victims.contains(r.getLong(1))),
      "deleted vectors still surfaced")
    assert(after.nonEmpty)

    // compact: codes frame == original minus the deleted set (bit-equal,
    // quantizers untouched by contract), probe unchanged, log gone
    import graft.ops.StoreManifest
    def codes(): Set[Seq[Any]] = {
      val snap = StoreManifest.currentSnapshot(spark, dir).get
      StoreManifest.readComponent(spark, dir, snap, "codes",
          Some("vec_id LONG, codes ARRAY<INT>, list_id LONG")).get
        .collect().map(_.toSeq).toSet
    }
    val origCodes = codes()
    val quantizerDirs = StoreManifest.currentSnapshot(spark, dir).get
      .components.filter { case (k, _) => k == "centroids" || k == "codebook" }
    AnnPq.compactPqIndex(spark, dir)
    val compactedSnap = StoreManifest.currentSnapshot(spark, dir).get
    assert(codes() === origCodes.filterNot(r =>
      victims.contains(r.head.asInstanceOf[Long])))
    assert(compactedSnap.components.getOrElse("tombstones", Nil).isEmpty)
    assert(compactedSnap.components.filter {
      case (k, _) => k == "centroids" || k == "codebook" } === quantizerDirs,
      "compaction must carry the quantizer dirs by reference, never rewrite them")
    assert(AnnPq.ivfPqTopKFromIndex(emb, dir).collect().toSeq === after.toSeq)
  }

  test("pq index store: the search never re-encodes the corpus (no embedding scan feeds the code table)") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    AnnPq.writePqIndex(emb, dir)
    val df = AnnPq.ivfPqTopKFromIndex(emb, dir)
    df.collect()
    // every pq_encode in the executed plan would mean the corpus was
    // re-encoded at query time; the stored code table must be the only
    // code source
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pq_encode"), plan.linesIterator.take(30).mkString("\n"))
    assert(plan.contains("pq_lut"), "queries still build their LUTs map-side")
  }

  test("pq index store: readAsOf(v) serves exactly the first-v-batches index") {
    import graft.ops.StoreManifest
    val dir = java.nio.file.Files.createTempDirectory("pqasof").toString
    val baseDir = java.nio.file.Files.createTempDirectory("pqasofbase").toString
    val base = emb.filter(col("vec_id") % 50 =!= 17 || col("vec_id") < 16)
    val delta = emb.filter(col("vec_id") % 50 === 17 && col("vec_id") >= 16)
    AnnPq.writePqIndex(base, dir)   // v1
    AnnPq.appendPqIndex(delta, dir) // v2
    AnnPq.writePqIndex(base, baseDir)
    val asOf1 = AnnPq.ivfPqTopKFromIndex(emb, dir, asOfVersion = Some(1L))
      .collect().toSeq
    assert(asOf1 === AnnPq.ivfPqTopKFromIndex(emb, baseDir).collect().toSeq,
      "the v1 snapshot must serve exactly the base-only index")
    assert(asOf1.nonEmpty)
    // non-vacuous: the append IS visible at the current version
    val codesSchema = Some("vec_id LONG, codes ARRAY<INT>, list_id LONG")
    def codeCount(snap: StoreManifest.Snapshot): Long =
      StoreManifest.readComponent(spark, dir, snap, "codes", codesSchema)
        .get.count()
    val v1 = StoreManifest.snapshotAt(spark, dir, 1L)
    val cur = StoreManifest.currentSnapshot(spark, dir).get
    assert(codeCount(cur) === codeCount(v1) + delta.count(),
      "current snapshot must carry exactly the appended codes on top of v1")
  }
}
