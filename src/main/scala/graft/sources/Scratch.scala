package graft.sources

import java.io.File

/** Guarded scratch-directory hygiene for the handful of registered
  * queries that materialize side tables (bucketed joins, DPP dims,
  * stored ANN indexes) and must clear stale directories a fresh
  * in-memory catalog cannot see (`DROP TABLE` only drops what the
  * catalog knows).
  *
  * The one rule: a recursive delete NEVER runs outside an explicitly
  * allowed scratch root. [[deleteRecursivelyUnder]] canonicalizes both
  * sides (so `..`/symlink tricks can't escape) and refuses — loudly,
  * with both paths in the message — anything that is not a STRICT
  * descendant of an allowed root. Refusal is an exception, not a no-op:
  * a caller passing a wrong path has a bug that must surface in CI, not
  * a directory that silently survives.
  */
object Scratch {

  /** Roots a scratch delete may touch: the build's `target/` dir and
    * the session's Spark SQL warehouse.
    */
  def allowedRoots(spark: org.apache.spark.sql.SparkSession): Seq[File] =
    Seq(
      new File(s"${sys.props("user.dir")}/target"),
      new File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath))

  /** Delete `target` recursively iff it is a strict descendant of one
    * of `roots` (after canonicalization). Missing targets are a no-op;
    * out-of-root targets throw IllegalArgumentException.
    */
  def deleteRecursivelyUnder(target: File, roots: Seq[File]): Unit = {
    val canon = target.getCanonicalFile
    val ok = roots.exists { r =>
      val root = r.getCanonicalFile
      var p = canon.getParentFile // strict: the root itself is refused
      var hit = false
      while (p != null && !hit) { hit = p == root; p = p.getParentFile }
      hit
    }
    if (!ok) throw new IllegalArgumentException(
      s"Scratch.deleteRecursivelyUnder refused: $canon is not a strict " +
        s"descendant of any allowed scratch root " +
        s"${roots.map(_.getCanonicalPath).mkString("[", ", ", "]")}")
    def rm(f: File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    if (canon.exists()) rm(canon)
  }
}
