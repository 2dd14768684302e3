package graft.functions

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("one-pass Aggregator signature: fixed length, deterministic, " +
      "identical docs share sigs, disjoint docs don't") {
    val d = docs(
      1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "p q r s t u")
    val sigs = Dedup.shingles(d)
      .groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(col("shingle")).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    assert(sigs.values.forall(_.length === 32))
    assert(sigs(1L).toSeq === sigs(2L).toSeq)
    assert(sigs(1L).toSeq !== sigs(3L).toSeq)
    // deterministic across runs
    val again = Dedup.shingles(d).groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(col("shingle")).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    assert(again(1L).toSeq === sigs(1L).toSeq)
  }

  test("signature similarity tracks Jaccard on real near-dups (sf0.001)") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sigs = Dedup.shingles(d).groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(col("shingle")).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    val truePairs = Dedup.ngramJaccardPairs(d, 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(truePairs.nonEmpty)
    truePairs.foreach { case (a, b, j) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 32.0
      assert(math.abs(est - j) < 0.35,
        s"pair ($a,$b): jaccard $j vs minhash estimate $est")
    }
  }
}
