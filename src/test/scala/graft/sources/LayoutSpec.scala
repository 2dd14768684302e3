package graft.sources

import graft.SparkSpec
import graft.Tables

/** Z-order layout: both dimensions must get usable file-level min/max
  * pruning, where a single-column sort gives pruning on one dimension and
  * none on the other.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_layout/$name"

  test("z-order tightens file spans on BOTH keys vs single-column sort") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val files = 8

    // baseline: range-sort by o_custkey only
    val sortedPath = tmp("sorted")
    orders.repartitionByRange(files, orders("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sortedPath)

    val zPath = tmp("zorder")
    Layout.writeZOrdered(orders, zPath, "o_custkey", "o_totalprice", files)

    val sorted = spark.read.parquet(sortedPath)
    val z = spark.read.parquet(zPath)

    val sortedKey = Layout.fileSpanFraction(sorted, "o_custkey")
    val sortedOther = Layout.fileSpanFraction(sorted, "o_totalprice")
    val zKey = Layout.fileSpanFraction(z, "o_custkey")
    val zOther = Layout.fileSpanFraction(z, "o_totalprice")

    // single-column sort: near-perfect on its key, useless on the other
    assert(sortedKey < 0.3, s"sorted key span $sortedKey")
    assert(sortedOther > 0.8, s"sorted other span $sortedOther")
    // z-order: genuinely tight on BOTH dimensions — each file must cover
    // well under the full span, and the non-sort dimension must improve
    // by a wide margin over the single-column layout
    assert(zKey < 0.65, s"z key span $zKey")
    assert(zOther < 0.65, s"z other span $zOther")
    assert(zOther < sortedOther / 1.5,
      s"z other span $zOther not an improvement over $sortedOther")
  }

  test("hilbert layout tightens file spans on both keys too") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val hPath = tmp("hilbert")
    Layout.writeHilbertOrdered(orders, hPath, "o_custkey", "o_totalprice", 8)
    val h = spark.read.parquet(hPath)
    val hKey = Layout.fileSpanFraction(h, "o_custkey")
    val hOther = Layout.fileSpanFraction(h, "o_totalprice")
    assert(hKey < 0.65, s"hilbert key span $hKey")
    assert(hOther < 0.65, s"hilbert other span $hOther")
    assert(h.count() === orders.count())
    info(f"hilbert spans: key $hKey%.2f / other $hOther%.2f")
  }

  test("compact: small files merge to the target count, rows identical, " +
      "sort restored") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val path = tmp("compact")
    orders.repartition(32).write.mode("overwrite").parquet(path)
    def dataFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles === 32)
    val before = Layout.fileSpanFraction(spark.read.parquet(path), "o_custkey")
    Layout.compact(spark, path, targetFiles = 4, sortKey = Some("o_custkey"))
    assert(dataFiles === 4)
    val back = spark.read.parquet(path)
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey").except(orders.select("o_orderkey"))
      .isEmpty)
    val after = Layout.fileSpanFraction(back, "o_custkey")
    // 32 hash-scattered files each span ~everything; 4 range-sorted ones
    // are tight
    assert(after < before / 2, s"span $after vs scattered $before")
    assert(after < 0.3, s"sorted span $after")
  }

  test("compact recovers a crash between delete(live) and rename(staged)") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val path = tmp("crash")
    orders.repartition(8).write.mode("overwrite").parquet(path)

    // simulate the one unprotected window of a prior compact(): the
    // compacted copy is complete at <path>.__compact, the live dir was
    // deleted, and the process died before the rename
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    orders.repartition(2).write.mode("overwrite").parquet(path + ".__compact")
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))

    // next compact() must first promote the stranded stage, then proceed
    Layout.compact(spark, path, targetFiles = 4, sortKey = Some("o_custkey"))
    val back = spark.read.parquet(path)
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey").except(orders.select("o_orderkey"))
      .isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".__compact")))

    // and a bare reader can also self-serve via recover()
    orders.repartition(2).write.mode("overwrite").parquet(path + ".__compact")
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    Layout.recover(spark, path)
    assert(spark.read.parquet(path).count() === orders.count())
  }

  test("writeZOrdered preserves rows and schema") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val path = tmp("roundtrip")
    Layout.writeZOrdered(orders, path, "o_custkey", "o_totalprice", 4)
    val back = spark.read.parquet(path)
    assert(back.columns.sorted.sameElements(orders.columns.sorted))
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey").except(orders.select("o_orderkey"))
      .isEmpty)
  }
}
