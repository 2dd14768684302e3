package graft

import graft.etl.Silver
import graft.ext.Dedup
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the cleansing operators (SURVEY.md §5): dedup
  * idempotence, fill totality, filter soundness — over ScalaCheck-
  * generated frames with fixed seeds (deterministic in CI).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val word = Gen.oneOf("the", "a", "spark", "data", "row", "join")
  private val docGen = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString(" ")

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "src0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup keeps exactly one row per distinct text, idempotent") {
    samples(Gen.listOfN(12, docGen)).foreach { texts =>
      val once = Dedup.exactDocs(docsDf(texts))
      assert(once.count() === texts.distinct.size.toLong)
      // doc_ids surviving are unique -> re-dedup by text of survivors is
      // a no-op
      assert(once.select("doc_id").distinct().count() === once.count())
    }
  }

  test("dedupByKey: unique keys, survivor = min under the total order") {
    samples(Gen.listOfN(10, Gen.choose(1L, 4L))).foreach { keys =>
      val df = keys.zipWithIndex
        .map { case (k, i) => (k, s"p$i") }.toDF("k", "payload")
      val out = Silver.dedupByKey(df, "k", Seq(col("payload")))
      val expect = keys.zipWithIndex.map { case (k, i) => (k, s"p$i") }
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }.toSet
      assert(out.as[(Long, String)].collect().toSet === expect)
    }
  }

  test("events fill totality: no null values survive, no rows lost") {
    samples(Gen.listOfN(8, Gen.option(Gen.choose(0.0, 10.0)))).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, ts("2024-01-01 00:00:00"), i.toLong, "t", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val out = Silver.eventsStage(df)
      assert(out.filter(col("value").isNull).count() === 0L)
      assert(out.count() === vs.size.toLong)
    }
  }

  test("lineitem filter soundness: kept rows = rows satisfying predicates") {
    val rowGen = for {
      p <- Gen.choose(-10.0, 10.0); t <- Gen.choose(-1.0, 1.0)
      q <- Gen.choose(-5.0, 5.0)
    } yield (p, t, q)
    samples(Gen.listOfN(10, rowGen)).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((p, t, q), i) =>
        (i.toLong, 1L, 1L, 1, q, p, 0.0, t, "N", "O",
          ts("1997-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      val expected = rows.count { case (p, t, q) => p > 0 && t >= 0 && q > 0 }
      assert(Silver.lineitemStage(df).count() === expected.toLong)
    }
  }

  test("merge upsert: empty source is identity, same source idempotent") {
    val kvGen = for {
      k <- Gen.choose(1L, 6L); v <- Gen.choose(0, 99)
    } yield (k, v)
    samples(Gen.listOfN(8, kvGen)).foreach { rows =>
      // unique-key target/source (merge requires unique source keys)
      val target = rows.distinctBy(_._1).toDF("k", "v")
      val source = rows.distinctBy(_._1).map { case (k, v) => (k, v + 1000) }
        .take(3).toDF("k", "v")
      val empty = spark.emptyDataset[(Long, Int)].toDF("k", "v")
      val id = graft.operators.MergeUpsert.upsert(target, empty, Seq("k"))
      assert(id.as[(Long, Int)].collect().toSet ===
        target.as[(Long, Int)].collect().toSet, "empty source = identity")
      val once = graft.operators.MergeUpsert.upsert(target, source, Seq("k"))
      val twice = graft.operators.MergeUpsert.upsert(once, source, Seq("k"))
      assert(once.as[(Long, Int)].collect().toSet ===
        twice.as[(Long, Int)].collect().toSet, "same source idempotent")
    }
  }

  test("shingles: at most max(0, tokens-2) distinct shingles per doc") {
    samples(Gen.listOfN(6, docGen)).foreach { texts =>
      val counts = Dedup.shingles(docsDf(texts))
        .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val nTok = t.split(" ", -1).length
        assert(counts.getOrElse(i.toLong, 0L) <= math.max(0, nTok - 2).toLong)
      }
    }
  }

  test("shingleIds partition documents identically to string shingles") {
    samples(Gen.listOfN(10, docGen)).foreach { texts =>
      val df = docsDf(texts)
      val byStr = Dedup.shingles(df).groupBy("doc_id").count()
        .as[(Long, Long)].collect().toMap
      val byId = Dedup.shingleIds(df).groupBy("doc_id").count()
        .as[(Long, Long)].collect().toMap
      assert(byId === byStr, "same per-doc distinct-shingle cardinality")
    }
  }

  test("bloom filter: no false negatives over generated key sets") {
    import graft.functions.Bloom
    samples(Gen.listOfN(300, Gen.choose(Long.MinValue, Long.MaxValue)), n = 3)
      .foreach { keys =>
        val bits = Bloom.optimalNumBits(keys.size.toLong, 0.01)
        val k = Bloom.optimalNumHashes(bits, keys.size.toLong)
        val f = Bloom.build(keys.toDS(), bits, k)
        val (kk, words) = Bloom.deserialize(f)
        keys.foreach { key =>
          assert(Bloom.contains(words, words.length * 64, kk, key),
            s"inserted key $key must probe true")
        }
      }
  }

  test("heavy hitters: exact match with brute force over generated " +
      "skewed streams") {
    import graft.ext.HeavyHitters
    val streamGen = for {
      hotN <- Gen.choose(50, 200)
      tailN <- Gen.choose(50, 300)
      tail <- Gen.listOfN(tailN, Gen.choose(0, 100000))
    } yield Seq.fill(hotN)("hot") ++ tail.map(i => s"t$i")
    samples(streamGen, n = 4).foreach { items =>
      val df = items.toDF("item")
      val got = HeavyHitters.frequent(df, minFrac = 0.1, slots = 32)
        .select("item", "cnt").as[(String, Long)].collect().toSet
      val thr = math.ceil(0.1 * items.size)
      val want = items.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).map { case (k, v) => (k, v) }.toSet
      assert(got === want)
    }
  }

  test("sessionConcurrency: per-day peaks match a brute-force global " +
      "sweep over generated event streams") {
    // events across a 3-day span, several users, minute resolution
    val evGen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        uid <- Gen.choose(1L, 6L)
        day <- Gen.choose(1, 3)
        hour <- Gen.choose(0, 23)
        min <- Gen.choose(0, 59)
      } yield (uid, f"2024-03-0$day $hour%02d:$min%02d:00"))
    } yield rows
    samples(evGen, n = 4).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, u, "view", 1.0, "{}", ts(t))
      }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")
      val got = graft.etl.TimeSeries.sessionConcurrency(df)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      // brute force: sessionize per user (30-min gap), sweep globally
      val gapUs = 30L * 60 * 1000000
      val sessions = rows.groupBy(_._1).values.flatMap { es =>
        val times = es.map(e => ts(e._2).getTime * 1000L).sorted
        times.foldLeft(List.empty[(Long, Long)]) {
          case (acc, t) => acc match {
            case (s, e) :: rest if t - e <= gapUs => (s, t) :: rest
            case _ => (t, t) :: acc
          }
        }
      }.toSeq
      val deltas = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
        .sortBy { case (t, d) => (t, -d) } // +1 before -1 at equal ts
      var run = 0
      val peaks = scala.collection.mutable.Map.empty[String, Int]
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      deltas.foreach { case (t, d) =>
        run += d
        val day = fmt.format(new java.util.Date(t / 1000L))
        peaks(day) = math.max(peaks.getOrElse(day, Int.MinValue), run)
      }
      assert(got === peaks.view.mapValues(_.toLong).toMap)
    }
  }

  test("skyline: every output is non-dominated, every excluded row is " +
      "dominated by some output row (generated catalogs)") {
    val partGen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8)))
    } yield rows
    samples(partGen, n = 5).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((p, s), i) =>
        (i.toLong, p.toDouble, s) }
        .toDF("p_partkey", "p_retailprice", "p_size")
      val frontier = graft.ext.Retail.skylineParts(df)
        .select("p_partkey").as[Long].collect().toSet
      val all = rows.zipWithIndex.map { case ((p, s), i) => (i.toLong, p, s) }
      def dominates(a: (Long, Int, Int), b: (Long, Int, Int)) =
        a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
      all.foreach { r =>
        val dominated = all.exists(q => dominates(q, r))
        assert(frontier.contains(r._1) === !dominated, s"row $r")
      }
    }
  }

  test("filterFunnel: survivor counts are monotone non-increasing and " +
      "bounded by the input (generated corpora)") {
    samples(Gen.listOfN(15, docGen), n = 4).foreach { texts =>
      val counts = graft.ext.Curation.filterFunnel(docsDf(texts))
        .orderBy("stage").select("n_survivors").as[Long].collect()
      assert(counts.head === texts.size.toLong)
      counts.sliding(2).foreach { w =>
        if (w.size == 2) assert(w(0) >= w(1), counts.mkString(","))
      }
    }
  }

  test("cusum: scaled deviations always return to exactly zero at the " +
      "final day (generated revenue series)") {
    val revGen = for {
      n <- Gen.choose(1, 12)
      cents <- Gen.listOfN(n, Gen.choose(100, 99999))
    } yield cents
    samples(revGen, n = 4).foreach { cents =>
      val df = cents.zipWithIndex.map { case (c, i) =>
        (i.toLong, 1L, "O", c / 100.0, ts(f"1997-01-${i + 1}%02d 00:00:00"),
          "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val last = graft.etl.TimeSeries.cusumDailyRevenue(df)
        .orderBy(col("day").desc).select("cusum_scaled")
        .as[Long].head()
      assert(last === 0L) // telescopes: N·S − N·S
    }
  }

  test("mannWhitney: U statistics always partition n0*n1 and rank sums " +
      "total N(N+1) (generated values, both scales doubled)") {
    val evGen = for {
      n <- Gen.choose(2, 25)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 6L), Gen.choose(1, 9)))
    } yield rows
    samples(evGen, n = 4).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((uid, v), i) =>
        (i.toLong, uid, "view", v.toDouble, "{}", ts("2024-01-01 00:00:00"))
      }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")
      val r = graft.ext.Experiment.mannWhitney(df)
        .select("variant", "n", "rank_sum_2x", "u_2x")
        .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
      val (n0, n1) = (r(0L)._2, r(1L)._2)
      val bigN = n0 + n1
      assert(r(0L)._3 + r(1L)._3 === bigN * (bigN + 1))
      assert(r(0L)._4 + r(1L)._4 === 2 * n0 * n1)
    }
  }

  test("twapUserValue: the time-weighted mean lies within the held " +
      "values' range (generated irregular series)") {
    val serGen = for {
      n <- Gen.choose(2, 10)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1, 3600), Gen.choose(1, 999)))
    } yield rows
    samples(serGen, n = 4).foreach { rows =>
      val times = rows.map(_._1).scanLeft(0)(_ + _).tail
      val df = rows.zip(times).zipWithIndex.map { case (((_, v), t), i) =>
        (i.toLong, 1L, "view", v / 100.0, "{}",
          new java.sql.Timestamp(1700000000000L + t * 1000L))
      }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")
      val out = graft.etl.TimeSeries.twapUserValue(df)
        .select("twap_cents").as[Double].collect()
      assert(out.length === 1)
      // the last value never holds; bounds come from the held prefix
      val held = rows.init.map(_._2)
      assert(out.head >= held.min - 1e-9 && out.head <= held.max + 1e-9)
    }
  }

  test("activeUsers: WAU dominates DAU on every emitted day (generated " +
      "activity)") {
    val actGen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 5L), Gen.choose(1, 14)))
    } yield rows
    samples(actGen, n = 4).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((uid, day), i) =>
        (i.toLong, uid, "view", 1.0, "{}", ts(f"2024-01-$day%02d 09:00:00"))
      }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")
      graft.etl.TimeSeries.activeUsers(df)
        .select("dau", "wau").as[(Long, Long)].collect()
        .foreach { case (dau, wau) => assert(wau >= dau) }
    }
  }

  test("ewma: matches a driver-side reference over generated histories") {
    val histGen = for {
      n <- Gen.choose(1, 15)
      prices <- Gen.listOfN(n, Gen.choose(100, 99999))
    } yield prices
    samples(histGen, n = 4).foreach { prices =>
      val df = prices.zipWithIndex.map { case (p, i) =>
        (i.toLong, 1L, "O", p / 100.0, ts(f"1997-01-${i + 1}%02d 00:00:00"),
          "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val got = graft.etl.WindowOps.ewmaCustomerSpend(df, k = 8)
        .select("o_orderkey", "ewma_cents")
        .as[(Long, Double)].collect().toMap
      prices.indices.foreach { i =>
        val terms = (0 until math.min(8, i + 1)).map { j =>
          (prices(i - j).toDouble * math.pow(0.5, j), math.pow(0.5, j))
        }
        val want = terms.map(_._1).sum / terms.map(_._2).sum
        assert(got(i.toLong) === want, s"order $i")
      }
    }
  }

  // generated embedding frames for the spectral operators: d=8 keeps
  // the generated covariance solvable by inspection-scale arithmetic
  private val vecGen = for {
    n <- Gen.choose(3, 24)
    vs <- Gen.listOfN(n * 8, Gen.choose(-0.5f, 0.5f))
  } yield vs.grouped(8).toSeq

  test("abttTransform: output is orthogonal to the extracted direction " +
      "on generated corpora") {
    samples(vecGen, n = 4).foreach { vecs =>
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val solved = graft.ext.Similarity.topComponentSolve(emb).get
      graft.ext.Similarity.abttTransform(emb).collect().foreach { r =>
        val e = r.getSeq[Double](1)
        val proj = e.zip(solved.v).map { case (x, w) => x * w }.sum
        assert(math.abs(proj) < 1e-9,
          s"transformed vector not orthogonal to v: $proj")
      }
    }
  }

  test("topComponentsSolve: trace conservation and unit loadings on " +
      "generated corpora") {
    samples(vecGen, n = 4).foreach { vecs =>
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val comps = graft.ext.Similarity.topComponentsSolve(emb, 3).get
      val tr0 = comps.head.tr
      comps.foreach { c =>
        val norm = math.sqrt(c.v.map(x => x * x).sum)
        assert(math.abs(norm - 1.0) < 1e-9)
        assert(c.lam <= tr0 + 1e-9)
      }
      // deflation removes exactly lam from the trace each step, so the
      // extracted mass can never exceed the total variance
      assert(comps.map(_.lam).sum <= tr0 + 1e-9,
        s"sum ${comps.map(_.lam).sum} > trace $tr0")
    }
  }

  test("lmDocScores: counts conserve and reference docs are fully " +
      "known on generated corpora") {
    samples(Gen.listOfN(10, docGen), n = 4).foreach { texts =>
      // half the docs form the reference slice (src0), half are src1
      val df = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", if (i % 2 == 0) "src0" else "src1",
          t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val r = graft.ext.Corpus.lmDocScores(df).collect()
      assert(r.length === texts.length)
      r.foreach { row =>
        assert(row.getAs[Long]("n_known") + row.getAs[Long]("n_oov") ===
          row.getAs[Long]("n_bigrams"))
        val id = row.getAs[Long]("doc_id")
        if (id % 2 == 0)
          assert(row.getAs[Long]("n_oov") === 0L,
            s"reference doc $id scored OOV against its own model")
        val mp = row.getAs[Double]("mean_pkn")
        assert(mp >= 0.0 && mp <= 1.0)
      }
    }
  }

  test("tfidfCosinePairs: Cauchy-Schwarz holds exactly on the integer " +
      "sums; planted duplicate pair surfaces at ~1") {
    samples(Gen.listOfN(8, docGen), n = 4).foreach { texts =>
      // plant one exact duplicate so a pair is guaranteed when the
      // generated doc is long enough to shingle
      val all = texts :+ texts.head
      val pairs = Dedup.tfidfCosinePairs(docsDf(all), threshold = 0.0)
        .collect()
      pairs.foreach { p =>
        val dot = BigInt(p.getAs[Long]("dot"))
        val na = BigInt(p.getAs[Long]("norm2_a"))
        val nb = BigInt(p.getAs[Long]("norm2_b"))
        assert(dot > 0 && na > 0 && nb > 0)
        assert(dot * dot <= na * nb,
          s"Cauchy-Schwarz violated: $dot^2 > $na*$nb")
        val c = p.getAs[Double]("cosine")
        assert(c > 0.0 && c <= 1.0 + 1e-12)
      }
      if (texts.head.split(" ").length >= 3)
        assert(pairs.exists(p =>
          p.getAs[Long]("doc_a") === 0L &&
            p.getAs[Long]("doc_b") === all.length - 1L &&
            p.getAs[Double]("cosine") > 0.9999999),
          "planted duplicate pair missing")
    }
  }

  test("distinctNgramProfile: distinct <= total, unigram totals equal " +
      "the token count, ratios in (0, 1]") {
    samples(Gen.listOfN(10, docGen), n = 4).foreach { texts =>
      val nonEmpty = texts.map(t => if (t.isEmpty) "the" else t)
      val r = graft.ext.Corpus.distinctNgramProfile(docsDf(nonEmpty))
        .collect()
      val tokens = nonEmpty.map(_.split(" ").length.toLong).sum
      r.foreach { row =>
        val tot = row.getAs[Long]("total_ngrams")
        val dis = row.getAs[Long]("distinct_ngrams")
        assert(dis <= tot)
        val ratio = row.getAs[Double]("distinct_ratio")
        assert(ratio > 0.0 && ratio <= 1.0)
        if (row.getAs[Int]("n") == 1) assert(tot === tokens)
      }
    }
  }

  test("mmrTopK: rank 1 is the relevance argmax, neighbors distinct, " +
      "scores recompute from the reported columns") {
    val vec = for {
      vs <- Gen.listOfN(graft.ext.Similarity.SrpDim,
        Gen.choose(-100, 100))
    } yield vs.map(_ / 100.0f)
    samples(Gen.listOfN(12, vec), n = 3).foreach { rows =>
      val emb = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val r = graft.ext.Similarity.mmrTopK(emb, k = 4).collect()
      val brute1 = graft.ext.Similarity.bruteForceTopK(emb, 1)
        .collect()
        .map(x => x.getAs[Long]("query_id") ->
          x.getAs[Long]("neighbor_id")).toMap
      r.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
        val ids = rs.map(_.getAs[Long]("neighbor_id"))
        assert(ids.distinct.length === ids.length)
        val r1 = rs.find(_.getAs[Int]("rank") == 1).get
        assert(r1.getAs[Long]("neighbor_id") === brute1(q))
      }
      r.foreach { row =>
        val expect =
          graft.ext.Similarity.MmrLambda *
            row.getAs[Double]("relevance") -
          (1.0 - graft.ext.Similarity.MmrLambda) *
            row.getAs[Double]("max_sim_prior")
        assert(row.getAs[Double]("mmr_score") === expect)
      }
    }
  }

  test("lofScores: positive densities, full neighbor counts, LOF near " +
      "1 on generated clouds") {
    val vec = for {
      vs <- Gen.listOfN(graft.ext.Similarity.SrpDim,
        Gen.choose(-100, 100))
    } yield vs.map(_ / 100.0f)
    samples(Gen.listOfN(15, vec), n = 3).foreach { rows =>
      val emb = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val r = graft.ext.Similarity.lofScores(emb, k = 5).collect()
      assert(r.length === rows.length)
      r.foreach { row =>
        assert(row.getAs[Long]("n_neighbors") === 5L)
        assert(row.getAs[Double]("lrd") > 0.0)
        val lof = row.getAs[Double]("lof")
        // a uniform random cloud has no density cliffs: LOF stays in a
        // loose band around 1 (the flag threshold is far outside it)
        assert(lof > 0.0 && lof < 3.0, s"implausible LOF $lof")
      }
    }
  }
}
