package graft.ext

import graft.SparkSpec
import java.nio.file.Files

class CorpusPipelineSpec extends SparkSpec {

  test("full curation run on sf0.001: all stages written, checks pass") {
    val out = Files.createTempDirectory("graft_corpus").toString
    val checks = CorpusPipeline.runAll(spark, "/root/testdata/sf0.001", out)
    assert(checks.nonEmpty)
    assert(checks.forall(_.passed), checks.filterNot(_.passed).mkString(", "))
    assert(checks.count(_.check == "non_empty") === 5)
    assert(checks.count(_.check.startsWith("pk_unique")) === 5)
    // the written stages compose: every screened doc has a curriculum
    // phase, and the stage outputs agree on the corpus size
    val screen = spark.read.parquet(s"$out/corpus/screen")
    val curriculum = spark.read.parquet(s"$out/corpus/curriculum")
    assert(screen.count() === curriculum.count())
    assert(screen.join(curriculum, Seq("doc_id")).count() === screen.count())
  }

  test("validation catches corrupted stage output (pk duplication)") {
    val out = Files.createTempDirectory("graft_corpus_bad").toString
    CorpusPipeline.runStages(spark, "/root/testdata/sf0.001", out)
    // duplicate every curriculum row, rewritten in place via a detour
    // dir (can't overwrite a parquet dir from its own live scan)
    val dup = s"$out/curriculum_dup"
    val cur = spark.read.parquet(s"$out/corpus/curriculum")
    cur.union(cur).write.mode("overwrite").parquet(dup)
    spark.read.parquet(dup).write.mode("overwrite")
      .parquet(s"$out/corpus/curriculum")
    val checks = CorpusPipeline.validate(spark, out)
    val pk = checks.find(c =>
      c.table == "curriculum" && c.check == "pk_unique(doc_id)").get
    assert(!pk.passed, pk.detail)
  }
}
