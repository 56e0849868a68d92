package graft

import graft.ops.NearDup

/** Statistical property of the MinHash construction: the fraction of
  * agreeing signature components estimates the true Jaccard similarity
  * (E[m_i(A) == m_i(B)] = J(A,B), Broder '97). Deterministic hash family
  * → reproducible estimates.
  */
class MinHashPropertySpec extends SparkSpec {

  private def signatureOf(rows: Array[org.apache.spark.sql.Row], docId: Long): Seq[Long] = {
    val r = rows.find(_.getLong(0) == docId).get
    (0 until NearDup.K).map(i => r.getAs[Long](s"m$i"))
  }

  test("signature agreement tracks known Jaccard (1/3 overlap)") {
    import spark.implicits._
    // A = tok0..tok99, B = tok50..tok149 → |A∩B|=50, |A∪B|=150, J = 1/3
    val a = (0 until 100).map(i => s"tok$i").mkString(" ")
    val b = (50 until 150).map(i => s"tok$i").mkString(" ")
    val sig = NearDup.signatures(
      NearDup.tokens(Seq((0L, a), (1L, b)).toDF("doc_id", "text"))).collect()
    val agree = signatureOf(sig, 0).zip(signatureOf(sig, 1)).count(p => p._1 == p._2)
    val est = agree.toDouble / NearDup.K
    // K=64 components: sd ≈ sqrt(J(1-J)/64) ≈ 0.06; 0.15 = 2.5 sd margin
    assert(math.abs(est - 1.0 / 3) < 0.15, s"estimate $est vs expected 0.333")
  }

  test("identical token sets give identical signatures; disjoint give none") {
    import spark.implicits._
    val a = (0 until 80).map(i => s"w$i").mkString(" ")
    val c = (1000 until 1080).map(i => s"w$i").mkString(" ")
    val sig = NearDup.signatures(
      NearDup.tokens(Seq((0L, a), (1L, a), (2L, c)).toDF("doc_id", "text"))).collect()
    assert(signatureOf(sig, 0) == signatureOf(sig, 1))
    val agreeDisjoint = signatureOf(sig, 0).zip(signatureOf(sig, 2)).count(p => p._1 == p._2)
    assert(agreeDisjoint <= 4, s"$agreeDisjoint of ${NearDup.K} agree on disjoint sets")
  }
}
