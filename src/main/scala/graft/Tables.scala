package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver testdata tables (TESTDATA.md).
  *
  * The reference ingests CSV with schema inference and stores rows in
  * Postgres (reference `include/scripts/to_bronze.py:39-50`); our engine
  * standardizes on Parquet at rest — columnar, splittable, self-describing —
  * which is what a 100 TB deployment would use. Parquet footers carry the
  * schema, so reads are deterministic (no inference pass) and Catalyst
  * pushes filters/projections into the scan (`PushedFilters`/`ReadSchema`).
  *
  * Scale note: each table maps to a directory of row-group-split files on a
  * real cluster; `spark.read.parquet` parallelizes by row-group natively, so
  * nothing here needs to change between local[32] and 1000 executors.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a raw nanos long
    * (legacy conf) and floor-convert to a micros timestamp — the same
    * truncation DuckDB applies, so oracle comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
