package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.{Expectations, Gold, Relational, ScalarSurface, Silver, TimeSeries, WindowOps}
import graft.ext.{Components, Corpus, Curation, Dedup, Experiment, Graph, HeavyHitters, Multimodal, Privacy, Quality, Retail, Similarity, Stats, TextAnalysis}
import graft.streaming.{EventsStreaming, MedallionStream}
import graft.operators.{AsOfJoin, BloomJoin, FuzzyJoin, IncrementalAgg, MergeUpsert, RangeJoin, SkewJoin, SnapshotDiff}
import graft.plans.Layout

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a pure function (SparkSession, sfDir) => DataFrame with a
  * DuckDB-SQL twin in [[oracleSql]] using identical output column names
  * (the driver sorts columns by name before hashing). Queries and oracle
  * SQL live next to their implementations; this object only aggregates.
  *
  * Determinism contract shared by all oracle-compared queries:
  *  - aggregates are exact (counts, integer cents, day sums); fractional
  *    columns are derived from them via identical IEEE-754 expressions on
  *    both sides (see graft.etl.Gold scaladoc);
  *  - timestamps/decimals are emitted as canonical strings;
  *  - key-dedup uses `row_number` over a total order, never
  *    `dropDuplicates(keys)`'s arbitrary survivor.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Gold.dailySales(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Silver.queries ++ Gold.queries ++ Relational.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ EventsStreaming.queries ++
      Multimodal.queries ++ AsOfJoin.queries ++ Components.queries ++
      RangeJoin.queries ++ Quality.queries ++ WindowOps.queries ++
      ScalarSurface.queries ++ TimeSeries.queries ++ MergeUpsert.queries ++
      Curation.queries ++ SkewJoin.queries ++ Corpus.queries ++
      Privacy.queries ++ SnapshotDiff.queries ++ BloomJoin.queries ++
      HeavyHitters.queries ++ IncrementalAgg.queries ++ Expectations.queries ++
      Graph.queries ++ FuzzyJoin.queries ++ Retail.queries ++
      Experiment.queries ++ Stats.queries ++ Layout.queries ++
      graft.sources.Bronze.queries ++ graft.sources.AnnIndex.queries ++
      MedallionStream.queries

  /** DuckDB twins of [[queries]], same column names/aliases both sides. */
  def oracleSql: Map[String, String] =
    Silver.oracleSql ++ Gold.oracleSql ++ Relational.oracleSql ++ Dedup.oracleSql ++
      TextAnalysis.oracleSql ++ Similarity.oracleSql ++
      EventsStreaming.oracleSql ++ Multimodal.oracleSql ++ AsOfJoin.oracleSql ++
      Components.oracleSql ++ RangeJoin.oracleSql ++ Quality.oracleSql ++
      WindowOps.oracleSql ++ ScalarSurface.oracleSql ++
      TimeSeries.oracleSql ++ MergeUpsert.oracleSql ++ Curation.oracleSql ++
      SkewJoin.oracleSql ++ Corpus.oracleSql ++
      Privacy.oracleSql ++ SnapshotDiff.oracleSql ++ BloomJoin.oracleSql ++
      HeavyHitters.oracleSql ++ IncrementalAgg.oracleSql ++
      Expectations.oracleSql ++ Graph.oracleSql ++ FuzzyJoin.oracleSql ++
      Retail.oracleSql ++ Experiment.oracleSql ++ Stats.oracleSql ++
      Layout.oracleSql ++ graft.sources.Bronze.oracleSql ++
      graft.sources.AnnIndex.oracleSql ++ MedallionStream.oracleSql
}
