package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("full medallion run on sf0.001: all stages written, checks pass") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val checks = Pipeline.runAll(spark, "/root/testdata/sf0.001", out)
    assert(checks.nonEmpty)
    assert(checks.forall(_.passed))
    // 6 silver + 6 gold non-empty checks plus key checks
    assert(checks.count(_.check == "non_empty") === 12)
    assert(checks.count(_.check.startsWith("pk_unique")) === 5)
  }
}
