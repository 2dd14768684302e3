package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)

  test("sourceCap: per-source keeps = min(cap, size); keepers are exactly " +
      "the top-cap by (n_tokens desc, doc_id)") {
    val r = Curation.sourceCap(docs).collect()
    assert(r.length === docs.count())
    r.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val kept = rows.filter(_.getAs[Boolean]("kept"))
      assert(kept.length === math.min(Curation.SourceCapN, rows.length))
      val expected = rows
        .sortBy(x => (-x.getAs[Long]("n_tokens"), x.getAs[Long]("doc_id")))
        .take(Curation.SourceCapN).map(_.getAs[Long]("doc_id")).toSet
      assert(kept.map(_.getAs[Long]("doc_id")).toSet === expected)
    }
  }

  test("splitLeakageAudit: pair mass conserved, groups match a direct " +
      "recomputation, leaky flag consistent") {
    val audit = Curation.splitLeakageAudit(docs).collect()
    val pairs = Dedup.ngramJaccardPairs(docs).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val splits = Curation.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs
      .map { case (a, b) =>
        val (x, y) = (splits(a), splits(b))
        (Seq(x, y).min, Seq(x, y).max)
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = audit.map(r =>
      (r.getAs[String]("split_lo"), r.getAs[String]("split_hi")) ->
        r.getAs[Long]("n_pairs")).toMap
    assert(got === expected)
    assert(got.values.sum === pairs.length.toLong)
    audit.foreach(r => assert(r.getAs[Boolean]("leaky") ===
      (r.getAs[String]("split_lo") != r.getAs[String]("split_hi"))))
  }

  test("splitByCluster: no near-dup pair straddles splits; moved flag " +
      "tracks the naive assignment") {
    val r = Curation.splitByCluster(docs).collect()
    assert(r.length === docs.count())
    val split = r.map(x =>
      x.getAs[Long]("doc_id") -> x.getAs[String]("split")).toMap
    Dedup.ngramJaccardPairs(docs).select("doc_a", "doc_b").collect()
      .foreach { p =>
        assert(split(p.getLong(0)) === split(p.getLong(1)),
          s"pair (${p.getLong(0)}, ${p.getLong(1)}) straddles splits")
      }
    val naive = Curation.splitAssign(docs).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    r.foreach { x =>
      assert(x.getAs[Boolean]("moved") ===
        (x.getAs[String]("split") != naive(x.getAs[Long]("doc_id"))))
    }
    // the fix must actually move someone on this corpus (it has near-dup
    // clusters whose members hash to different naive splits)
    assert(r.exists(_.getAs[Boolean]("moved")))
  }

  test("packSequences: every doc lands in exactly one bin, bins are " +
      "contiguous per source, fill tracks the window budget") {
    import spark.implicits._
    val window = 256L // small budget so the tiny SF still makes many bins
    val packed = packCollect(window)
    val total = docs
      .select(sum(size(split(col("text"), " ")))).as[Long].head()
    assert(packed.map(_._4).sum === total, "token conservation")
    // bins per source are consecutive 0..max with no gaps
    packed.groupBy(_._1).foreach { case (_, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids === (0L until ids.length.toLong).toVector)
    }
    // every non-final bin of a source starts because the budget filled:
    // its bin's cumulative start is bin_id * window by construction, so
    // fill = bin_tokens / window should hover near 1 for non-final bins
    val nonFinal = packed.groupBy(_._1).flatMap { case (_, bins) =>
      bins.sortBy(_._2).dropRight(1)
    }
    nonFinal.foreach { case (_, _, _, toks) =>
      assert(toks >= window / 2, s"underfilled non-final bin: $toks")
    }
  }

  private def packCollect(window: Long) =
    Curation.packSequences(docs, window)
      .orderBy("source", "bin_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector

  test("stratifiedSample: equal stride per stratum") {
    val every = 7
    val sampled = Curation.stratifiedSample(docs, every)
    val perLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      val expected = (n + every - 1) / every // ceil(n / every)
      assert(perLang.getOrElse(lang, 0L) === expected, s"stratum $lang")
    }
  }

  test("weightedMix: per-source keep rate matches the declared weight") {
    val mixed = Curation.weightedMix(docs)
    val kept = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc_ids are dense ints spread across sources, so the modular rule
    // keeps ~rate_pct% per source; verify the EXACT count by replaying
    // the rule per source
    val expected = docs
      .withColumn("rate_pct",
        lit(20) + expr("CAST(substring(source, 4) AS INT)") * 3)
      .filter(col("doc_id") % 100 < col("rate_pct"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === expected)
    // and the mix is genuinely weighted: src9+ keeps a larger fraction
    // than src0 on any non-trivial corpus
    val fullCounts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(s: String) =
      kept.getOrElse(s, 0L).toDouble / fullCounts(s)
    assert(rate("src19") > rate("src0"))
  }

  test("repetition: duplicate n-gram fractions on a constructed doc") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a b"),   // 2-grams: ab,ba,ab,ba,ab -> 5 total 2 distinct
      (2L, "x y z"),          // no repeats
      (3L, "w")               // too short for any 2-gram
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("total2") === 5)
    assert(r(0).getAs[Int]("distinct2") === 2)
    assert(r(0).getAs[Double]("rep2") === 3.0 / 5.0)
    assert(r(1).getAs[Double]("rep2") === 0.0)
    assert(r(2).getAs[Int]("total2") === 0)
    assert(r(2).getAs[Double]("rep3") === 0.0)
  }

  test("hashReservoirPerSource: heap path equals the window formulation " +
      "and keeps exactly min(k, n) per source") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val d = ((0 until 15).map(i => (i.toLong, "t", "en", "srcA", 1L)) ++
      (0 until 4).map(i => (100L + i, "t", "en", "srcB", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.hashReservoirPerSource(d, k = 10)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // independent ground truth: the window row_number formulation
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val want = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(got === want)
    assert(got.count(_._1 == "srcA") === 10)
    assert(got.count(_._1 == "srcB") === 4)
  }

  test("splitAssign: partition of the corpus, rates near fractions, " +
      "stable under corpus growth") {
    import spark.implicits._
    def docs(n: Int) = (0 until n).map(i =>
      (i.toLong, "t", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val n = 2000
    val full = Curation.splitAssign(docs(n))
      .as[(Long, String)].collect().toMap
    assert(full.size === n, "every doc gets exactly one split")
    val rates = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(rates("train").toDouble / n - 0.8) < 0.05)
    assert(math.abs(rates("val").toDouble / n - 0.1) < 0.03)
    assert(math.abs(rates("test").toDouble / n - 0.1) < 0.03)
    // growth stability: the first 500 docs keep their assignment
    val small = Curation.splitAssign(docs(500))
      .as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(full(id) === s) }
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Curation.splitAssign(docs(1), Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("filterFunnel: each stage drops exactly the doc built to fail it; " +
      "integer boundary semantics") {
    import spark.implicits._
    val doc1 = (1 to 25).map(i => s"t$i").mkString(" ")       // passes all
    val doc2 = (1 to 10).map(i => s"s$i").mkString(" ")       // fails length
    val doc3 = Seq.fill(24)("z").mkString(" ")                // fails diversity
    val doc4 = (Seq.tabulate(20)(i => s"w${i % 7 + 1}")).mkString(" ")
    // doc4: 7 distinct over 20 (35% >= 30%) but 2-grams repeat -> fails rep
    val doc5 = (1 to 10).map(i => s"the x$i").mkString(" ") + " the"
    // doc5: 11 stopwords of 21 tokens -> fails the <=50% stopword ceiling
    val d = Seq(doc1, doc2, doc3, doc4, doc5).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.filterFunnel(d)
      .select("stage", "n_survivors", "survival_rate")
      .as[(String, Long, Double)].collect().toSet
    assert(r === Set(
      ("0_input", 5L, 1.0),
      ("1_min_length", 4L, 0.8),
      ("2_diversity", 3L, 0.6),
      ("3_stopwords", 2L, 0.4),
      ("4_repetition", 1L, 0.2)))
  }

  test("weightedReservoir: top-k priorities w/u match an independent " +
      "JVM replay; selection is repartition-stable; weight guard raises") {
    import spark.implicits._
    val d = (1L to 50L).map(i =>
      (i, "x", "en", "src0", (i % 7 + 1) * 100))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // independent replay of the published contract in plain Scala:
    // h = Knuth u32 of doc_id, priority = (w*2^33) / (2h+1)
    val expected = (1L to 50L).map { id =>
      val w = (id % 7 + 1) * 100
      val h = (id * 2654435761L) % 4294967296L
      (id, (w * 8589934592L).toDouble / (h * 2L + 1L).toDouble)
    }.sortBy { case (id, key) => (-key, id) }.take(10).map(_._1).toSet
    val got = Curation.weightedReservoir(d, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    val gotShuffled = Curation.weightedReservoir(d.repartition(7), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(gotShuffled === expected)
    // zero weight sits outside the exactness domain -> loud
    val bad = Seq((1L, "x", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[Exception] {
      Curation.weightedReservoir(bad, k = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("weight outside")))
  }

  test("weightedReservoir: inclusion tracks weight (heavier docs are " +
      "sampled more often across disjoint id blocks)") {
    import spark.implicits._
    // 1000 docs, half weight 10, half weight 1000; k=100 winners should
    // be overwhelmingly heavy under priority sampling
    val d = (1L to 1000L).map(i =>
      (i, "x", "en", "src0", if (i % 2 == 0) 1000L else 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val heavy = Curation.weightedReservoir(d, k = 100)
      .select("n_chars").as[Long].collect().count(_ === 1000L)
    assert(heavy > 80, s"expected heavy docs to dominate, got $heavy/100")
  }

  test("batchPadding: bucket ladder, waste accounting, batch ceil-div") {
    import spark.implicits._
    // 10-token doc -> bucket 16; 100-token doc -> bucket 128
    val d = Seq((1L, Seq.fill(10)("t").mkString(" "), "en", "src0", 10L),
      (2L, Seq.fill(100)("t").mkString(" "), "en", "src0", 100L),
      (3L, Seq.fill(12)("t").mkString(" "), "en", "src0", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.batchPadding(d)
      .select("bucket_len", "n_docs", "real_tokens", "padded_tokens",
        "waste_share", "rows_per_batch", "n_batches")
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(16L) === ((16L, 2L, 22L, 32L, 10.0 / 32, 1024L, 1L)))
    assert(r(128L) === ((128L, 1L, 100L, 128L, 28.0 / 128, 128L, 1L)))
  }

  test("epochRepeats: tier from source suffix, instances multiply exactly") {
    import spark.implicits._
    // src0 -> tier 0 -> 4 epochs; src3 -> tier 3 -> 1 epoch
    val d = Seq((1L, "a b", "en", "src0", 3L), (2L, "c", "en", "src3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.epochRepeats(d)
      .select("source", "epoch", "n_docs", "n_tokens", "repeats")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(r === Set(
      ("src0", 1L, 1L, 2L, 4L), ("src0", 2L, 1L, 2L, 4L),
      ("src0", 3L, 1L, 2L, 4L), ("src0", 4L, 1L, 2L, 4L),
      ("src3", 1L, 1L, 1L, 1L)))
  }

  test("domainRelevance: target-only bigrams score high, shared score par") {
    import spark.implicits._
    // target doc: bigrams (a b), (b c); corpus doc shares (a b) but
    // adds (b d). With md5 buckets almost surely distinct for 3 grams:
    //   N_c = 4, N_t = 2
    //   bucket(a b): c=2 t=1 -> w = 10000*1*4 // (2*2) = 10000  (ratio 1)
    //   bucket(b c): c=1 t=1 -> w = 10000*1*4 // (1*2) = 20000  (target-only)
    //   bucket(b d): c=1 t=0 -> w = 0
    val d = Seq(
      (1L, "a b c", "src0"),
      (2L, "a b d", "web"))
      .toDF("doc_id", "text", "source")
    val got = Curation.domainRelevance(d)
      .select("doc_id", "source", "n_grams", "w_sum", "w_avg")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(got(1L) === ((1L, "src0", 2L, 30000L, 15000L)))
    assert(got(2L) === ((2L, "web", 2L, 10000L, 5000L)))
  }

  test("domainRelevance: scores are partitioning-invariant") {
    import spark.implicits._
    val d = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}",
        if (i % 4 == 0) "src0" else "web")).toDF("doc_id", "text", "source")
    val a = Curation.domainRelevance(d.repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = Curation.domainRelevance(d.repartition(13))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("curriculumPlan: equal-mass phases ascend by score, every doc assigned") {
    val r = Curation.curriculumPlan(spark, docs).collect()
    assert(r.length === docs.count())
    val phases = r.map(_.getAs[Long]("phase")).distinct.sorted
    assert(phases.head === 0L &&
      phases.last < Curation.CurriculumPhases)
    // phases are score-ordered: every doc in phase p scores <= every doc
    // in phase p+1 (boundaries cut the score domain, never split a score)
    val byPhase = r.groupBy(_.getAs[Long]("phase")).view
      .mapValues(_.map(_.getAs[Long]("score_c"))).toMap
    phases.sliding(2).foreach { case Array(lo, hi) =>
      assert(byPhase(lo).max <= byPhase(hi).min,
        s"phase $lo must not outscore phase $hi")
    }
    // equal-mass within one score-key granularity: no phase is empty and
    // the largest/smallest differ by at most the hottest score key
    val sizes = phases.map(p => byPhase(p).length.toLong)
    val hottest = r.groupBy(_.getAs[Long]("score_c"))
      .values.map(_.length.toLong).max
    assert(sizes.max - sizes.min <= hottest)
  }
  test("balancedSample: equal count per class in portable-hash order, " +
      "small classes kept whole, partition-invariant") {
    import spark.implicits._
    val d = Seq(
      (10L, "en"), (11L, "en"), (12L, "en"), (13L, "en"), (14L, "en"),
      (20L, "de"), (21L, "de"))
      .map { case (id, l) => (id, s"t$id", l, "src0", 5L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.balancedSample(d, perClass = 3).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[Long]("doc_id"),
        x.getAs[Long]("sample_rank")))
    // reference order: Knuth u32 ascending, then id
    def h(id: Long) = (id * 2654435761L) % 4294967296L
    val enExpect = Seq(10L, 11L, 12L, 13L, 14L)
      .sortBy(id => (h(id), id)).take(3)
    assert(r.filter(_._1 == "en").sortBy(_._3).map(_._2).toSeq === enExpect)
    // class smaller than perClass keeps everything
    assert(r.filter(_._1 == "de").map(_._2).toSet === Set(20L, 21L))
    // stable under repartitioning
    val r2 = Curation.balancedSample(d.repartition(7), perClass = 3)
      .collect().map(x => (x.getAs[Long]("doc_id"),
        x.getAs[Long]("sample_rank"))).toSet
    assert(r2 === r.map(x => (x._2, x._3)).toSet)
  }
}
