package graft.sources

import java.io.File
import java.nio.file.Files
import graft.SparkSpec

class ScratchSpec extends SparkSpec {

  private def mkTree(root: File): File = {
    val d = new File(root, "graft_scratch_spec/inner")
    d.mkdirs()
    Files.writeString(new File(d, "a.txt").toPath, "x")
    new File(root, "graft_scratch_spec")
  }

  test("deleteRecursivelyUnder removes a strict descendant of an " +
      "allowed root") {
    val root = Files.createTempDirectory("scratch_root").toFile
    val victim = mkTree(root)
    assert(victim.exists())
    Scratch.deleteRecursivelyUnder(victim, Seq(root))
    assert(!victim.exists())
    assert(root.exists(), "the root itself must survive")
  }

  test("refuses a path outside every allowed root, and the refusal is " +
      "loud") {
    val root = Files.createTempDirectory("scratch_root").toFile
    val outside = Files.createTempDirectory("not_scratch").toFile
    val victim = mkTree(outside)
    val e = intercept[IllegalArgumentException] {
      Scratch.deleteRecursivelyUnder(victim, Seq(root))
    }
    assert(e.getMessage.contains("refused"))
    assert(victim.exists(), "refusal must not delete anything")
  }

  test("refuses the allowed root itself (strict descendant only)") {
    val root = Files.createTempDirectory("scratch_root").toFile
    intercept[IllegalArgumentException] {
      Scratch.deleteRecursivelyUnder(root, Seq(root))
    }
    assert(root.exists())
  }

  test("refuses a dot-dot escape that canonicalizes outside the root") {
    val root = Files.createTempDirectory("scratch_root").toFile
    val outside = Files.createTempDirectory("not_scratch").toFile
    val victim = mkTree(outside)
    val sneaky = new File(root, s"../${outside.getName}/graft_scratch_spec")
    intercept[IllegalArgumentException] {
      Scratch.deleteRecursivelyUnder(sneaky, Seq(root))
    }
    assert(victim.exists())
  }

  test("allowedRoots covers the session warehouse and target/") {
    val roots = Scratch.allowedRoots(spark).map(_.getPath)
    assert(roots.exists(_.endsWith("/target")))
    assert(roots.size === 2)
  }

  test("missing target under an allowed root is a silent no-op") {
    val root = Files.createTempDirectory("scratch_root").toFile
    Scratch.deleteRecursivelyUnder(new File(root, "never_created"),
      Seq(root))
  }
}
