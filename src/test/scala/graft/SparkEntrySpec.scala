package graft

import graft.etl.{Expectations, Gold, Relational, ScalarSurface, Silver, TimeSeries, WindowOps}
import graft.ext.{Components, Corpus, Curation, Dedup, Experiment, Graph, HeavyHitters, Multimodal, Privacy, Quality, Retail, Similarity, Stats, TextAnalysis}
import graft.operators.{AsOfJoin, BloomJoin, FuzzyJoin, IncrementalAgg, MergeUpsert, RangeJoin, SkewJoin, SnapshotDiff}
import graft.plans.Layout
import graft.streaming.EventsStreaming

/** Driver-contract guards: the queries map is built by merging module
  * maps, where a duplicate name would silently overwrite — these checks
  * make that (and oracle/query drift) a test failure instead.
  */
class SparkEntrySpec extends SparkSpec {

  private val moduleSizes = Seq(
    Silver.queries, Gold.queries, Relational.queries, Dedup.queries,
    TextAnalysis.queries, Similarity.queries, EventsStreaming.queries,
    Multimodal.queries, AsOfJoin.queries, Components.queries,
    RangeJoin.queries, Quality.queries, WindowOps.queries,
    ScalarSurface.queries, TimeSeries.queries,
    MergeUpsert.queries, Curation.queries, SkewJoin.queries,
    Corpus.queries, Privacy.queries, SnapshotDiff.queries,
    BloomJoin.queries, HeavyHitters.queries,
    IncrementalAgg.queries, Expectations.queries,
    Graph.queries, FuzzyJoin.queries, Retail.queries,
    Experiment.queries, Stats.queries, Layout.queries,
    graft.sources.Bronze.queries,
    graft.sources.AnnIndex.queries,
    graft.streaming.MedallionStream.queries).map(_.size)

  test("no query name collisions across modules") {
    assert(SparkEntry.queries.size === moduleSizes.sum)
  }

  /** Documented-surface pin (round-9 postmortem): a broken loader once
    * silently dropped 31 queries from the correctness sweep. Update this
    * constant ON PURPOSE when registering queries — a surprise delta here
    * means a module map lost entries.
    */
  test("registered query count matches the documented surface") {
    assert(SparkEntry.queries.size === 383)
  }

  test("every oracle key refers to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("rows-only queries (no oracle) are non-empty at sf0.001") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    rowsOnly.foreach { name =>
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows — weak check would fail")
    }
  }
}
