package graft

import org.apache.spark.sql.functions._

import graft.ops.EmbedStats

/** Contract for [[EmbedStats.classOutliers]] (q140): hand-checked
  * centroid/residual arithmetic, planted-outlier detection, and the
  * no-float-crosses-a-shuffle determinism (partition independence).
  */
class EmbedStatsSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("hand-checked: centroid is the exact mean, score the exact squared residual sum") {
    val dim = 4
    val emb = Seq(
      (1L, 0, vec(1, 0, 0, 0)),
      (2L, 0, vec(3, 0, 0, 0)),
      (3L, 1, vec(0, 1, 1, 0)),
      (4L, 1, vec(0, 1, 1, 0))
    ).toDF("vec_id", "label", "embedding")
    val got = EmbedStats.classOutliers(emb, dim = dim, topN = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // label 0 centroid = (2,0,0,0): both members at distance (1)^2 = 1.0
    // label 1 centroid = its members: distance 0
    assert(got(1L) === 1.0 && got(2L) === 1.0)
    assert(got(3L) === 0.0 && got(4L) === 0.0)
  }

  test("a planted far vector tops the outlier list; ordering is by exact score") {
    val dim = 4
    val tight = (1L to 20L).map(i => (i, 0, vec(1, 1, 1, 1)))
    val planted = Seq((99L, 0, vec(9, 9, 9, 9)))
    val emb = (tight ++ planted).toDF("vec_id", "label", "embedding")
    val rows = EmbedStats.classOutliers(emb, dim = dim, topN = 5).collect()
    assert(rows.head.getLong(0) === 99L, "the planted outlier must rank first")
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse, "scores must be non-increasing")
  }

  test("partition-independent on the real corpus (integer sums never depend on order)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = EmbedStats.classOutliers(emb).collect().map(_.toSeq).toSeq
    val b = EmbedStats.classOutliers(emb.repartition(17)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("ragged and null rows are excluded, never crash the pooling") {
    val emb = Seq(
      (1L, Integer.valueOf(0), vec(1, 1, 1, 1)),
      (2L, Integer.valueOf(0), vec(2, 2, 2, 2)),
      (3L, Integer.valueOf(0), vec(1, 2)),           // ragged
      (4L, null.asInstanceOf[Integer], vec(5, 5, 5, 5)), // null label
      (5L, Integer.valueOf(1), null.asInstanceOf[Array[Float]]) // null vector
    ).toDF("vec_id", "label", "embedding")
    val ids = EmbedStats.classOutliers(emb, dim = 4, topN = 10)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L))
  }
}
