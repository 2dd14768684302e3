package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary (round-9 postmortem): the driver regenerates
  * `/root/testdata` between rounds and has already changed physical parquet
  * types once (`events.ts` NANOS→MICROS), which silently killed 31 queries.
  * This spec pins the *logical* schema each `Tables.*` loader must present —
  * on any future regen it names the exact table/column that drifted in
  * seconds, instead of a cryptic analysis error deep inside a query.
  */
class FixtureCanarySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def timestampLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def fields(name: String): Map[String, DataType] =
    Tables.load(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("every fixture table loads and has its expected columns/types") {
    val expect: Map[String, Map[String, DataType => Boolean]] = Map(
      "region" -> Map("r_regionkey" -> (_ == IntegerType), "r_name" -> (_ == StringType)),
      "nation" -> Map("n_nationkey" -> (_ == IntegerType), "n_name" -> (_ == StringType),
        "n_regionkey" -> (_ == IntegerType)),
      "customer" -> Map("c_custkey" -> (_ == LongType), "c_name" -> (_ == StringType),
        "c_nationkey" -> (_ == IntegerType), "c_acctbal" -> (_ == DoubleType),
        "c_mktsegment" -> (_ == StringType)),
      "supplier" -> Map("s_suppkey" -> (_ == LongType), "s_name" -> (_ == StringType),
        "s_nationkey" -> (_ == IntegerType), "s_acctbal" -> (_ == DoubleType)),
      "part" -> Map("p_partkey" -> (_ == LongType), "p_name" -> (_ == StringType),
        "p_brand" -> (_ == StringType), "p_type" -> (_ == StringType),
        "p_size" -> (_ == IntegerType), "p_retailprice" -> (_ == DoubleType)),
      "orders" -> Map("o_orderkey" -> (_ == LongType), "o_custkey" -> (_ == LongType),
        "o_orderstatus" -> (_ == StringType), "o_totalprice" -> (_ == DoubleType),
        "o_orderdate" -> timestampLike, "o_orderpriority" -> (_ == StringType)),
      "lineitem" -> Map("l_orderkey" -> (_ == LongType), "l_partkey" -> (_ == LongType),
        "l_suppkey" -> (_ == LongType), "l_linenumber" -> (_ == IntegerType),
        "l_quantity" -> (_ == DoubleType), "l_extendedprice" -> (_ == DoubleType),
        "l_discount" -> (_ == DoubleType), "l_tax" -> (_ == DoubleType),
        "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
        "l_shipdate" -> timestampLike),
      "documents" -> Map("doc_id" -> (_ == LongType), "text" -> (_ == StringType),
        "lang" -> (_ == StringType), "source" -> (_ == StringType),
        "n_chars" -> (_ == LongType)),
      "embeddings" -> Map("vec_id" -> (_ == LongType),
        "embedding" -> { dt => dt == ArrayType(FloatType, containsNull = true) ||
          dt == ArrayType(FloatType, containsNull = false) },
        "label" -> (_ == IntegerType))
    )
    val drift = for {
      (table, cols) <- expect.toSeq
      actual = fields(table)
      (col, ok) <- cols.toSeq
      problem <- actual.get(col) match {
        case None => Some(s"$table.$col: MISSING (have ${actual.keys.mkString(",")})")
        case Some(dt) if !ok(dt) => Some(s"$table.$col: unexpected type $dt")
        case _ => None
      }
    } yield problem
    assert(drift.isEmpty, s"FIXTURE DRIFT:\n  ${drift.mkString("\n  ")}")
  }

  test("Tables.events adapts ts to a session-TZ timestamp regardless of physical type") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts must load as TIMESTAMP, got ${ev.schema("ts").dataType}")
    assert(ev.count() > 0)
    // date_format must render — this is what every oracle string compares on
    val d = ev.select(org.apache.spark.sql.functions.date_format(
      org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd HH:mm:ss")).head().getString(0)
    assert(d.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
  }
}
