package graft

class EngineSpec extends SparkSpec {

  test("facade reaches every capability family and stays lazy") {
    val e = Engine(spark, "/root/testdata/sf0.001")
    // construction of every surface is lazy (no action yet)
    val frames = Seq(
      e.table("nation"), e.silver.orders, e.gold.dailySales,
      e.dedup.exactGroups, e.text.quality, e.similarity.topK(3),
      e.multimodal.catalog, e.analytics.pricingSummary,
      e.analytics.latestOrderAsOf, e.timeSeries.gapFillDailySales,
      e.timeSeries.scd2UserPhases, e.quality.outliers,
      e.similarity.quantizeInt8,
      e.curation.chunks(), e.curation.shards(), e.curation.dupNgramFraction,
      e.multimodal.resize(),
      e.merge(e.table("nation"), e.table("nation"), Seq("n_nationkey")),
      // round-7 surface
      e.dedup.lineDedup(), e.curation.split(), e.text.heavyHitters(0.01),
      e.text.topTerms(), e.privacy.maskCustomers,
      e.privacy.redact(e.table("documents"), "text"),
      e.similarity.nearDupPairsIvf(), e.timeSeries.transitions,
      e.timeSeries.cohortRetention, e.multimodal.decodePng,
      e.multimodal.decodeWav, e.multimodal.imageFeatures,
      e.diff(e.table("nation"), e.table("nation").limit(20),
        Seq("n_nationkey"), Seq("n_name")),
      e.bloomJoin(e.table("orders"), "o_custkey", e.table("customer"),
        "c_custkey"),
      // late round-7 surface
      e.retail.abc, e.retail.rfm, e.retail.skyline,
      e.experiment.wilson, e.experiment.mannWhitney,
      e.graph.degrees, e.text.bm25(), e.text.search(), e.text.vocabCoverage,
      e.text.keywords(), e.quality.crosstab, e.quality.cdf,
      e.curation.weightedSample(), e.curation.sourceMix,
      e.timeSeries.cohortLtv, e.timeSeries.twap, e.timeSeries.cusum,
      e.timeSeries.seasonality, e.timeSeries.forwardFill,
      e.timeSeries.activeUsers, e.timeSeries.newVsReturning,
      e.timeSeries.thresholdEpisodes, e.curation.funnel, e.quality.mad,
      e.timeSeries.robustAnomalies, e.timeSeries.retentionTriangle,
      // round-10 continuation surface
      e.stats.mannKendall, e.stats.theilSen, e.graph.assortativity,
      e.privacy.kAnonymity, e.privacy.lDiversity(), e.privacy.tCloseness(),
      e.text.winnow(), e.text.countMin(), e.dedup.bloomScreen(),
      e.multimodal.averageHash,
      // round-10 second-wave surface
      e.dedup.despan(), e.dedup.incremental(), e.similarity.srpEval(),
      e.text.qualityLinear, e.text.kneserNey(), e.layout.rangePlan(),
      e.similarity.thresholdSweep(), e.curation.curriculum(),
      e.similarity.pqProfile, e.similarity.topKPq(),
      e.dedup.containmentPairs(threshold = 0.0),
      e.text.kneserNey3(), e.similarity.hardNegatives(),
      // round-11 surface
      e.similarity.semDedup(), e.similarity.semDedupSweep(),
      e.similarity.matryoshkaEval(), e.curation.sourceCap(),
      e.curation.splitLeakageAudit, e.curation.splitByCluster(),
      e.similarity.topComponent,
      // round-12 surface
      e.similarity.topComponents(), e.similarity.abttTransform,
      e.similarity.abttEval(), e.text.lmDocScores(),
      e.similarity.topKIvfPq(),
      // round-12 second-wave surface
      e.dedup.tfidfCosinePairs(threshold = 0.0),
      e.similarity.whitenTransform(), e.similarity.whitenEval(),
      e.similarity.embeddingDecontam(), e.text.doremiMix(),
      e.text.distinctNgramProfile, e.similarity.mmrTopK(),
      e.similarity.lofScores(), e.similarity.knnGraphIvfEval(),
      e.text.ccnetBuckets(), e.similarity.embeddingDecontamSweep(),
      // round-14 continuation surface
      e.timeSeries.holtWinters, e.stats.welchT,
      e.graph.personalizedPagerank(iterations = 1, seedCount = 2),
      e.privacy.dpCounts(), e.similarity.silhouette(),
      e.similarity.rangeSearch(),
      // round-15 surface
      e.stats.anova, e.multimodal.audioFingerprint(),
      e.multimodal.audioNearDups(), e.multimodal.audioClusters,
      e.graph.communityModularity(rounds = 1),
      e.timeSeries.forecastBacktest, e.timeSeries.decompose,
      e.multimodal.audioVad(), e.multimodal.blankFilter(),
      e.analytics.bucketedRevenue, e.quality.referentialIntegrity,
      e.privacy.erasureAudit, e.multimodal.videoShots(),
      e.timeSeries.userStreaks, e.experiment.srm, e.text.evalCalibration,
      e.graph.linkPrediction(), e.analytics.dppRevenue,
      e.text.evalPrCurve(), e.similarity.topKSq(),
      e.stats.permutation(), e.graph.components,
      e.privacy.randomizedResponse(), e.timeSeries.rollingMedian(),
      e.text.phraseSearch(), e.layout.bloomSkip(), e.experiment.mde,
      e.timeSeries.lagFeatures, e.stats.bhFdr(),
      e.similarity.topKSqIvf(), e.analytics.shippingPriority,
      e.analytics.localSupplierVolume, e.multimodal.audioSnr(),
      e.timeSeries.markovSteadyState(), e.retail.priceIndex,
      e.layout.broadcastAdvisor,
      // round-17 surface
      e.analytics.topSupplier, e.analytics.hashSample,
      e.dedup.prefixJaccardPairs(), e.dedup.crossDocSpans(),
      e.dedup.crossDocSpansHashed(), e.dedup.spanRemovalPlan(),
      e.dedup.spanScrub())
    // one action per family proves the wiring end-to-end
    frames.foreach(df => assert(df.limit(1).count() === 1L))
  }
}
