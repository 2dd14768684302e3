package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Connected components over a pair/edge table — the "dedup cluster"
  * operator: near-dup PAIRS (from Jaccard/LSH/SimHash) become duplicate
  * GROUPS, so a pipeline can keep exactly one representative per cluster
  * even when duplicates chain (a~b, b~c ⇒ {a,b,c}).
  *
  * Algorithm: iterative min-label propagation (the standard large-graph
  * formulation — each node repeatedly takes the minimum label among
  * itself and its neighbors until fixpoint). Each iteration is one
  * hash-shuffle join + aggregate, so an n-node / e-edge graph costs
  * O(diameter) shuffles of O(e) rows — the scalable shape (GraphX/Pregel
  * do the same dataflow); dedup-cluster graphs have tiny diameters.
  * Convergence is checked with a count of changed labels; iterations are
  * capped defensively.
  *
  * Oracle: DuckDB recursive CTE computing min reachable id per node —
  * set-based UNION terminates on cycles.
  */
object Components {

  /** Edge count below which the component computation runs as driver-side
    * union-find instead of distributed label propagation. Near-dup PAIR
    * graphs are tiny relative to the corpus (pairs survive a similarity
    * threshold), so even a 100 TB corpus typically yields an edge set far
    * under this; the distributed path stays as the unbounded fallback.
    */
  val LocalEdgeThreshold = 5000000L

  /** (node, component) for every node in `edges` (doc_a, doc_b);
    * component = min doc_id reachable. Both directions are propagated.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    val und = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .distinct()
      .persist()
    // the distinct above already shuffles the edges, so this count is a
    // cheap cache read — it picks the physical strategy
    val nEdges = und.count()
    if (nEdges <= localThreshold) {
      val out = localUnionFind(und)
      und.unpersist()
      return out
    }
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("comp", col("node"))
    // comp values only ever decrease, so sum(comp) strictly decreases
    // until the fixpoint — a join-free convergence test (one tiny agg
    // per iteration instead of a changed-rows join)
    var prevSum = Long.MaxValue
    var converged = false
    var i = 0
    var prevLabels: DataFrame = null
    // each node adopts min(own comp, neighbors' comps)
    // (measured: pointer-jumping costs an extra shuffle per round and
    // loses on the tiny-diameter graphs dedup produces — plain
    // one-hop propagation wins)
    def hop(lbl: DataFrame): DataFrame = {
      val viaNeighbors = und
        .join(lbl.withColumnRenamed("node", "v"), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min("comp").as("ncomp"))
      lbl.join(viaNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp"))
    }
    while (!converged && i < maxIter) {
      // ONE hop per materialized iteration (measured at sf0.1: a two-hop
      // variant recomputes the inner hop for both of the outer hop's
      // consumers — 6 joins per iteration vs 2 — and runs 5x slower;
      // saving driver round-trips does not pay for the recompute)
      // localCheckpoint (eager) truncates the lineage — without it each
      // iteration's plan embeds the previous one and the plan tree grows
      // exponentially (OOMs in plan stringification past ~12 iterations)
      val next = hop(labels)
        .localCheckpoint(false) // lazy: the sum below materializes it
      val s = next.agg(sum("comp")).first().getLong(0)
      // free the superseded iteration's checkpoint blocks — without this a
      // long-lived session leaks block-manager storage across calls
      if (prevLabels != null)
        org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(prevLabels)
      prevLabels = if (i > 0) labels else null // initial labels: plain plan
      labels = next
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    und.unpersist()
    // the surviving iteration's checkpoint is leased: harnesses release
    // its blocks after the query's consuming action
    graft.CheckpointLease.track(labels)
  }

  /** Driver-side union-find over a collected (bounded, see
    * [[LocalEdgeThreshold]]) edge list — min-root union + path
    * compression, so every root IS the component minimum and the result
    * matches the distributed fixpoint exactly. O(E α(E)) on the driver
    * versus O(diameter) cluster-wide shuffles: for the small pair graphs
    * dedup produces, the driver pass wins by the per-job scheduling
    * overhead alone.
    */
  private def localUnionFind(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val es = und.select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    es.foreach { case (u, v) =>
      if (!parent.containsKey(u)) parent.put(u, u)
      if (!parent.containsKey(v)) parent.put(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { // min root wins → root == component minimum
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataset(
      parent.keySet().asScala.toSeq.map(n => (n, find(n))))
      .toDF("node", "comp")
  }

  /** Dedup clusters from the oracle-checked Jaccard pairs: every doc in
    * a near-dup cluster, labeled by its representative (min doc_id).
    */
  def nearDupClusters(docs: DataFrame, threshold: Double = 0.5,
      localThreshold: Long = LocalEdgeThreshold): DataFrame =
    connectedComponents(Dedup.ngramJaccardPairs(docs, threshold),
        localThreshold = localThreshold)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))

  /** The step a dedup pipeline runs AFTER clustering: per near-dup
    * cluster, elect one representative (canonical) document and account
    * for what gets dropped. Election is deterministic argmax — keep the
    * longest document (`n_chars`), ties broken by smallest `doc_id` —
    * expressed as `max(struct(n_chars, -doc_id))`, a single map-side-
    * combining aggregate (no window, no second join): each cluster's
    * candidates reduce locally before the one shuffle, so a 100 TB
    * corpus's cluster table aggregates in one keyed pass.
    */
  def canonicalDocs(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    nearDupClusters(docs, threshold)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_docs"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id")))
          .as("best"),
        sum("n_chars").as("sum_chars"))
      .select(col("cluster_id"), col("n_docs"),
        (-col("best.neg_id")).as("canonical_doc"),
        col("best.n_chars").as("canonical_chars"),
        (col("n_docs") - 1L).as("dropped_docs"),
        (col("sum_chars") - col("best.n_chars")).as("dropped_chars"))

  /** Newman modularity decomposition of the near-dup cluster partition:
    * per cluster, its intra-edge count `e_c` (every pair edge is
    * intra-cluster by construction of connected components), degree mass
    * `d_c`, and modularity contribution
    * `q_c = e_c/m − (d_c/2m)²` — how much denser than degree-expected
    * each cluster is. `Σ q_c` is the partition's modularity Q, the
    * standard "are these clusters real structure or hairball?" check run
    * on a dedup graph before trusting its clusters.
    *
    * All inputs exact integers (edge/degree counts off the checkpointed
    * pair list); q_c is a fixed IEEE tree over them, so the table
    * hash-matches DuckDB. Scale: three keyed aggregates over the
    * (tiny relative to corpus) pair graph + one scalar broadcast.
    */
  def clusterModularity(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    modularityOfPairs(Dedup.ngramJaccardPairs(docs, threshold)
      .select("doc_a", "doc_b"))

  /** [[clusterModularity]]'s core over an explicit (doc_a, doc_b) edge
    * list — split out so specs can pin hand-built partitions.
    */
  def modularityOfPairs(pairs: DataFrame): DataFrame = {
    val labels = connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))
    val mDf = pairs.agg(count(lit(1)).as("m"))
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
    val dc = deg.join(labels, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"), sum("deg").as("d_sum"))
    val ec = pairs
      .join(labels.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .groupBy("cluster_id").agg(count(lit(1)).as("e_in"))
    dc.join(ec, Seq("cluster_id"))
      .crossJoin(broadcast(mDf))
      .withColumn("share",
        col("d_sum").cast("double") / (lit(2.0) * col("m").cast("double")))
      .select(col("cluster_id"), col("n_docs"), col("e_in"), col("d_sum"),
        col("m"),
        (col("e_in").cast("double") / col("m").cast("double") -
          col("share") * col("share")).as("q_contrib"))
  }

  /** Driver-contract registration (SparkEntry aggregates these).
    * `dedup_clusters_dist` pins localThreshold = 0, forcing the
    * DISTRIBUTED label-propagation fixpoint at every SF — the path a
    * 100 TB edge set takes — so the driver hash-checks it against the
    * SAME oracle as the union-find path and the full bench sweep records
    * its steady-state time (round-6 verdict: the unbounded path had no
    * recorded number).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_modularity" -> ((s, d) =>
      clusterModularity(Tables.documents(s, d))),
    "dedup_clusters" -> ((s, d) => nearDupClusters(Tables.documents(s, d))),
    "dedup_clusters_dist" -> ((s, d) =>
      nearDupClusters(Tables.documents(s, d), localThreshold = 0L)),
    "dedup_canonical" -> ((s, d) => canonicalDocs(Tables.documents(s, d))),
  )

  /** DuckDB twin: recursive reachability, min reachable id per node.
    * `dedup_clusters_dist` shares the text verbatim — the distributed
    * path must agree with the union-find path bit-for-bit.
    */
  def oracleSql: Map[String, String] = Map(
    // modularity replayed over the same recursive-CTE clusters plus a
    // fresh copy of the pair derivation (the cluster CTE collapses to
    // labels, so edges must be re-derived for e_c / degrees)
    "dedup_modularity" ->
      s"""WITH cl AS (
         |$ClustersSql
         |),
         |sh20 AS (
         |  SELECT doc_id,
         |         unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
         |                               for i in range(1, len(toks)-1)]))
         |           AS shingle
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
         |        FROM documents)),
         |sh2 AS (
         |  SELECT doc_id, shingle FROM sh20
         |  WHERE shingle IN (SELECT shingle FROM sh20
         |                    GROUP BY 1 HAVING count(*) <= ${Dedup.MaxShingleDf})),
         |sizes2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY 1),
         |inter2 AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         count(*) AS inter_size
         |  FROM sh2 a JOIN sh2 b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs2 AS (
         |  SELECT doc_a, doc_b FROM inter2
         |  JOIN sizes2 sa ON doc_a = sa.doc_id
         |  JOIN sizes2 sb ON doc_b = sb.doc_id
         |  WHERE inter_size * 1.0 / (sa.n + sb.n - inter_size) >= 0.5),
         |mm AS (SELECT count(*) AS m FROM pairs2),
         |deg AS (
         |  SELECT doc_id, count(*) AS deg FROM (
         |    SELECT doc_a AS doc_id FROM pairs2
         |    UNION ALL SELECT doc_b FROM pairs2)
         |  GROUP BY 1),
         |dc AS (
         |  SELECT cl.cluster_id, count(*) AS n_docs,
         |         CAST(sum(deg.deg) AS BIGINT) AS d_sum
         |  FROM deg JOIN cl USING (doc_id) GROUP BY 1),
         |ec AS (
         |  SELECT cl.cluster_id, count(*) AS e_in
         |  FROM pairs2 p JOIN cl ON p.doc_a = cl.doc_id GROUP BY 1),
         |f AS (
         |  SELECT dc.cluster_id, dc.n_docs, ec.e_in, dc.d_sum, mm.m,
         |         CAST(dc.d_sum AS DOUBLE) /
         |           (2.0 * CAST(mm.m AS DOUBLE)) AS share
         |  FROM dc JOIN ec USING (cluster_id), mm)
         |SELECT cluster_id, n_docs, e_in, d_sum, m,
         |       CAST(e_in AS DOUBLE) / CAST(m AS DOUBLE) - share * share
         |         AS q_contrib
         |FROM f""".stripMargin,
    "dedup_clusters" -> ClustersSql,
    "dedup_clusters_dist" -> ClustersSql,
    // canonical election replayed over the same recursive-CTE clusters;
    // DuckDB takes the window-argmax route, same (n_chars desc, doc_id)
    // total order
    "dedup_canonical" ->
      s"""WITH cl AS (
         |$ClustersSql
         |),
         |j AS (
         |  SELECT cl.cluster_id, d.doc_id, d.n_chars
         |  FROM cl JOIN documents d USING (doc_id)),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY cluster_id
         |           ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM j)
         |SELECT cluster_id,
         |       count(*) AS n_docs,
         |       max(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc,
         |       max(CASE WHEN rk = 1 THEN n_chars END) AS canonical_chars,
         |       count(*) - 1 AS dropped_docs,
         |       CAST(sum(n_chars) - max(CASE WHEN rk = 1 THEN n_chars END)
         |            AS BIGINT) AS dropped_chars
         |FROM r GROUP BY 1""".stripMargin,
  )

  // carries ngramJaccardPairs' MaxShingleDf stop-shingle cap so the
  // replayed pair set is the SAME operator at every SF (the cap never
  // fires at test SF, but omitting it was a latent query/oracle
  // divergence — round-11 review finding)
  private val ClustersSql =
      s"""WITH RECURSIVE sh0 AS (
        |  SELECT doc_id,
        |         unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                               for i in range(1, len(toks)-1)]))
        |           AS shingle
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents)),
        |sh AS (
        |  SELECT doc_id, shingle FROM sh0
        |  WHERE shingle IN (SELECT shingle FROM sh0
        |                    GROUP BY 1 HAVING count(*) <= ${Dedup.MaxShingleDf})),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         count(*) AS inter_size
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE inter_size * 1.0 / (sa.n + sb.n - inter_size) >= 0.5),
        |und AS (
        |  SELECT doc_a AS u, doc_b AS v FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT u AS node, u AS r FROM und
        |  UNION
        |  SELECT und.u AS node, reach.r
        |  FROM und JOIN reach ON und.v = reach.node)
        |SELECT node AS doc_id, min(r) AS cluster_id
        |FROM (SELECT node, r FROM reach
        |      UNION SELECT node, node FROM (SELECT DISTINCT u AS node
        |                                    FROM und))
        |GROUP BY 1""".stripMargin
}
