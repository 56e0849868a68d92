package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{vecDotI8, vecQuantizeI8}

/** Contract for int8 embedding quantization ([[graft.functions.QuantizeI8]] /
  * [[graft.functions.VecDotI8]]) and the q82 quantized ANN built on them:
  * the expression reproduces the documented floor(x·scale+0.5) arithmetic
  * exactly, dots are exact integers, null semantics follow the vec_dot
  * discipline, results are partitioning-independent, and quantized top-k
  * keeps high recall vs the exact float baseline (q24).
  */
class QuantizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The documented quantization, recomputed independently on the driver. */
  private def refQuantize(xs: Array[Float]): Array[Byte] = {
    var maxAbs = 0.0
    xs.foreach(x => maxAbs = math.max(maxAbs, math.abs(x.toDouble)))
    val out = new Array[Byte](xs.length)
    if (maxAbs == 0.0) return out
    val scale = 127.0 / maxAbs
    var i = 0
    while (i < xs.length) {
      out(i) = math.floor(xs(i).toDouble * scale + 0.5).toByte
      i += 1
    }
    out
  }

  test("vec_quantize_i8 equals the reference floor(x*scale+0.5) computation") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding"), vecQuantizeI8(col("embedding")).as("qv"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val emb = r.getSeq[Float](0).toArray
      val qv = r.getAs[Array[Byte]]("qv")
      assert(qv.sameElements(refQuantize(emb)),
        s"quantization mismatch for ${emb.take(4).mkString(",")}…")
      // every quantized value is in the symmetric int8 range
      assert(qv.forall(b => b >= -127 && b <= 127))
      // the max-|x| dimension maps to exactly ±127
      assert(qv.exists(b => b == 127 || b == -127))
    }
  }

  test("vec_dot_i8 is the exact integer dot of the quantized bytes") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .limit(50)
      .select(
        vecQuantizeI8(col("embedding")).as("qv"),
        vecDotI8(vecQuantizeI8(col("embedding")), vecQuantizeI8(col("embedding")))
          .as("selfdot"))
      .collect()
    rows.foreach { r =>
      val qv = r.getAs[Array[Byte]]("qv")
      val expected = qv.map(b => b.toLong * b.toLong).sum
      assert(r.getAs[Long]("selfdot") === expected)
      assert(expected > 0L) // real embeddings are never zero vectors
    }
  }

  test("null semantics: null array, null element, zero vector, length mismatch") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, Seq(1f, 2f)),                 // null array
        Row(Seq(1f, null, 3f), Seq(1f, 2f, 3f)), // null element
        Row(Seq(0f, 0f, 0f), Seq(0f, 0f, 0f)),  // zero vector
        Row(Seq(1f, 2f), Seq(1f, 2f, 3f)),      // length mismatch (dot)
        Row(Seq(Float.NaN, 1f), Seq(1f, 2f)),   // NaN element
        Row(Seq(Float.NaN, Float.NaN), Seq(1f, 2f)), // all-NaN
        Row(Seq(Float.PositiveInfinity, 1f), Seq(1f, 2f))), // Inf element
        2),
      schema)
    val out = df.select(
      vecQuantizeI8(col("a")).as("qa"),
      vecDotI8(vecQuantizeI8(col("a")), vecQuantizeI8(col("b"))).as("d"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // null array propagates
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null element propagates
    val zeroQ = out(2).getAs[Array[Byte]]("qa")
    assert(zeroQ.length == 3 && zeroQ.forall(_ == 0) && out(2).getAs[Long]("d") == 0L)
    assert(!out(3).isNullAt(0) && out(3).isNullAt(1)) // mismatch nulls the dot only
    // non-finite elements null the quantization (never silently map to 0)
    assert(out(4).isNullAt(0) && out(4).isNullAt(1))
    assert(out(5).isNullAt(0) && out(5).isNullAt(1))
    assert(out(6).isNullAt(0) && out(6).isNullAt(1))
  }

  test("SQL names resolve via GraftExtensions") {
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb_qz")
    val bad = spark.sql(
      """SELECT vec_dot_i8(vec_quantize_i8(embedding), vec_quantize_i8(embedding)) AS d
        |FROM emb_qz""".stripMargin)
      .filter(col("d").isNull || col("d") <= 0).count()
    assert(bad === 0)
  }

  test("q82 result is partitioning-independent") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = graft.ops.Quantize.annTopKQuantized(base).collect().toSeq
    val b = graft.ops.Quantize.annTopKQuantized(base.repartition(13)).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q82 quantized top-5 keeps high recall vs the exact float q24") {
    val exact = SparkEntry.queries("q24_ann_cosine")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val quant = SparkEntry.queries("q82_ann_quantized")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(exact.keySet === quant.keySet)
    val recalls = exact.map { case (qid, ex) =>
      (ex intersect quant(qid)).size.toDouble / ex.size
    }
    val avg = recalls.sum / recalls.size
    // int8 keeps ~1% relative error on 64-dim cosines; top-5 sets stay
    // close to the float ranking
    assert(avg >= 0.6, s"avg recall $avg vs exact top-5")
  }

  test("zero and non-finite vectors are excluded from q82 pairing, not ranked first") {
    // a zero vector quantizes to all-zero bytes (nrm = 0) and a NaN
    // element nulls the quantization; both would turn qcosine into
    // NaN/null — NaN sorts ABOVE every real similarity in a desc window,
    // so without the nrm > 0 gate they'd win every ranking
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(1f, 0f, 0f)),       // query
      Row(1L, Seq(0f, 0f, 0f)),       // zero vector: nrm = 0
      Row(2L, Seq(Float.NaN, 1f, 0f)), // non-finite: quantizes to null
      Row(3L, Seq(0.9f, 0.1f, 0f)),
      Row(4L, Seq(0f, 1f, 0f)))
    val emb = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = graft.ops.Quantize.annTopKQuantized(emb, queryMax = 1L, k = 5).collect()
    val neighbors = out.map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighbors === Set(3L, 4L), s"got $neighbors")
    // the best-ranked neighbor is the genuinely closest one, and every
    // similarity is a real number
    assert(out.head.getAs[Long]("neighbor_id") === 3L)
    assert(out.forall(r => !r.getAs[Double]("qcosine").isNaN))
  }
}
