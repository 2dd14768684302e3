package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.{Gold, Pipeline, Relational, Silver, TimeSeries}
import graft.ext.{Components, Corpus, Curation, Dedup, Experiment, Graph, HeavyHitters, Multimodal, Privacy, Quality, Retail, Similarity, Stats, TextAnalysis}
import graft.operators.{AsOfJoin, BloomJoin, IncrementalAgg, MergeUpsert, RangeJoin, SkewJoin, SnapshotDiff}
import graft.streaming.EventsStreaming

/** User-facing facade — the single entry point a user of the reference
  * pipeline would switch to: one object wrapping a session + data
  * directory, exposing every capability as a method returning a lazy
  * DataFrame (nothing executes until an action).
  *
  * {{{
  * val engine = graft.Engine(spark, "/data/lake")
  * engine.gold.dailySales.show()
  * engine.dedup.nearDupClusters().write.parquet("...")
  * engine.similarity.topK(k = 20).show()
  * engine.runPipeline("/data/out")   // bronze→silver→gold + validation
  * }}}
  */
case class Engine(spark: SparkSession, dataDir: String) {

  def table(name: String): DataFrame = Tables.load(spark, dataDir, name)

  object silver {
    def orders: DataFrame   = Silver.orders(spark, dataDir)
    def customer: DataFrame = Silver.customer(spark, dataDir)
    def lineitem: DataFrame = Silver.lineitem(spark, dataDir)
    def part: DataFrame     = Silver.part(spark, dataDir)
    def supplier: DataFrame = Silver.supplier(spark, dataDir)
    def events: DataFrame   = Silver.events(spark, dataDir)
  }

  object gold {
    def dailySales: DataFrame          = Gold.dailySales(spark, dataDir)
    def customerMetrics: DataFrame     = Gold.customerMetrics(spark, dataDir)
    def productPerformance: DataFrame  = Gold.productPerformance(spark, dataDir)
    def sellerPerformance: DataFrame   = Gold.sellerPerformance(spark, dataDir)
    def satisfactionMetrics: DataFrame = Gold.satisfactionMetrics(spark, dataDir)
    def deliveryPerformance: DataFrame = Gold.deliveryPerformance(spark, dataDir)
  }

  object dedup {
    def exactGroups: DataFrame = Dedup.exactGroups(docs)
    def exactDocs: DataFrame   = Dedup.exactDocs(docs)
    def jaccardPairs(threshold: Double = 0.5,
        maxShingleDf: Long = Dedup.MaxShingleDf): DataFrame =
      Dedup.ngramJaccardPairs(docs, threshold, maxShingleDf)
    def containmentPairs(threshold: Double = 0.8,
        maxShingleDf: Long = Dedup.MaxShingleDf): DataFrame =
      Dedup.containmentDedupPairs(docs, threshold, maxShingleDf)
    def tfidfCosinePairs(threshold: Double = 0.5,
        maxShingleDf: Long = Dedup.MaxShingleDf): DataFrame =
      Dedup.tfidfCosinePairs(docs, threshold, maxShingleDf)
    def minhashDedup(threshold: Double = 0.5): DataFrame =
      Dedup.minhashDedupDocs(docs, threshold)
    def sourceMatrix(threshold: Double = 0.5): DataFrame =
      Dedup.crossSourceDupMatrix(docs, threshold)
    def simhashNearDups(maxHamming: Int = 3): DataFrame =
      Dedup.simhashNearDupPairs(docs, maxHamming)
    def nearDupClusters(threshold: Double = 0.5): DataFrame =
      Components.nearDupClusters(docs, threshold)
    def decontamination(bench: DataFrame, n: Int = 5,
        minShared: Long = 1L): DataFrame =
      Dedup.containmentPairs(docs, bench, n, minShared)
    def lineDedup(lineTokens: Int = 16): DataFrame =
      Corpus.dedupLines(docs, lineTokens)
    def contaminationMatrix: DataFrame = Dedup.decontamMatrix(docs)
    def thresholdSweep(thresholds: Seq[Double] = Dedup.SweepThresholds)
        : DataFrame = Dedup.dedupThresholdSweep(docs, thresholds)
    def dupSpans(n: Int = Corpus.SpanGram): DataFrame =
      Corpus.dupSpans(docs, n)
    def despan(n: Int = Corpus.SpanGram): DataFrame =
      Corpus.despanDocuments(docs, n)
    def incremental(batchSource: String = "src0",
        threshold: Double = 0.5): DataFrame =
      Dedup.minhashIncremental(docs, batchSource, threshold)
    def bloomScreen(threshold: Double = 0.2): DataFrame =
      Dedup.bloomDecontam(docs, threshold)
    def prefixJaccardPairs(tNum: Long = 1L, tDen: Long = 2L): DataFrame =
      Dedup.prefixJaccardPairs(docs, tNum, tDen)
    /** Arm-choosing Jaccard sweep: enumeration vs PPJoin by measured
      * posting mass (r18). */
    def jaccardPairsAuto(tNum: Long = 1L, tDen: Long = 2L): DataFrame =
      Dedup.jaccardPairsAuto(docs, tNum, tDen)
    def crossDocSpans(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.repeatedSpans(docs, n)
    def crossDocSpansHashed(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.repeatedSpansHashed(docs, n)
    def spanRemovalPlan(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.spanRemovalPlan(docs, n)
    def spanScrub(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.spanScrub(docs, n)
    /** The 8-byte-shuffle production feeds (r18): output-identical to
      * the exact-fed forms by the hashed-candidate identity lemma. */
    def spanRemovalPlanHashed(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.spanRemovalPlan(docs, n,
        Some(Dedup.repeatedHitsHashed(docs, n)))
    def spanScrubHashed(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.spanScrub(docs, n, Some(Dedup.scrubFlagsHashed(docs, n)))
    /** Arm-choosing span transforms (r19): exact vs hashed feed by
      * measured gram-shuffle mass, the jaccardPairsAuto precedent. */
    def spanScrubAuto(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.spanScrubAuto(docs, n)
    def spanRemovalPlanAuto(n: Int = Dedup.SpanGram): DataFrame =
      Dedup.spanRemovalPlanAuto(docs, n)
    private def docs = Tables.documents(spark, dataDir)
  }

  object curation {
    def packSequences(window: Long = Curation.PackWindow): DataFrame =
      Curation.packSequences(docs, window)
    def stratifiedSample(every: Int = 7): DataFrame =
      Curation.stratifiedSample(docs, every)
    def balancedSample(perClass: Int = Curation.BalancedPerClass): DataFrame =
      Curation.balancedSample(docs, perClass)
    def weightedMix: DataFrame = Curation.weightedMix(docs)
    def chunks(chunk: Int = Corpus.ChunkTokens,
        stride: Int = Corpus.ChunkStride): DataFrame =
      Corpus.chunkDocuments(docs, chunk, stride)
    def shards(n: Long = Corpus.NumShards): DataFrame =
      Corpus.shardAssign(docs, n)
    def dupNgramFraction: DataFrame = Corpus.dupNgramFraction(docs)
    def split(fracs: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame =
      Curation.splitAssign(docs, fracs)
    def weightedSample(k: Int = 200): DataFrame =
      Curation.weightedReservoir(docs, k)
    def funnel: DataFrame = Curation.filterFunnel(docs)
    def sourceCap(cap: Int = Curation.SourceCapN): DataFrame =
      Curation.sourceCap(docs, cap)
    def splitLeakageAudit: DataFrame = Curation.splitLeakageAudit(docs)
    def splitByCluster(fracs: Seq[(String, Double)] =
        Curation.DefaultSplits): DataFrame =
      Curation.splitByCluster(docs, fracs)
    def sourceMix: DataFrame = Corpus.sourceMix(docs)
    def hashReservoir(k: Int = Curation.ReservoirK): DataFrame =
      Curation.hashReservoirPerSource(docs, k)
    def tokenBudget(budget: Long = Corpus.TokenBudget): DataFrame =
      Corpus.tokenBudgetPlan(docs, budget)
    def curriculum(phases: Long = Curation.CurriculumPhases): DataFrame =
      Curation.curriculumPlan(spark, docs, phases)
    private def docs = Tables.documents(spark, dataDir)
  }

  object text {
    def stats: DataFrame        = TextAnalysis.stats(docs)
    def repetition: DataFrame   = TextAnalysis.repetition(docs)
    def quality: DataFrame      = TextAnalysis.quality(docs)
    def langId: DataFrame       = TextAnalysis.langId(docs)
    def fingerprints: DataFrame = TextAnalysis.fingerprints(docs)
    def tokenCounts: DataFrame  = TextAnalysis.tokenCounts(docs)
    def topTerms(k: Int = 10): DataFrame =
      TextAnalysis.topTermsPerLang(docs, k)
    def heavyHitters(minFrac: Double = 0.002): DataFrame =
      HeavyHitters.frequentTokens(docs, minFrac)
    def keywords(k: Int = 3): DataFrame = TextAnalysis.keywords(docs, k)
    def bm25(query: Seq[String] = Seq("hash", "join", "filter")): DataFrame =
      TextAnalysis.bm25(docs, query)
    def search(k: Int = 20): DataFrame = TextAnalysis.bm25TopK(docs, k)
    def vocabCoverage: DataFrame = TextAnalysis.vocabCoverage(docs)
    def evalLangId: DataFrame = TextAnalysis.evalLangId(docs)
    def evalAucRoc(bins: Int = 10): DataFrame =
      TextAnalysis.evalAucRoc(docs, bins)
    def evalCalibration: DataFrame = TextAnalysis.evalCalibration(docs)
    def evalPrCurve(bins: Int = 10): DataFrame =
      TextAnalysis.evalPrCurve(docs, bins)
    def phraseSearch(term1: String = TextAnalysis.PhraseTerm1,
        term2: String = TextAnalysis.PhraseTerm2): DataFrame =
      TextAnalysis.phraseSearch(docs, term1, term2)
    def blocklist(terms: Seq[String] = TextAnalysis.BlocklistTerms)
        : DataFrame = TextAnalysis.blocklistScreen(docs, terms)
    def readability: DataFrame = TextAnalysis.readability(docs)
    def compressRatio: DataFrame = TextAnalysis.compressRatio(docs)
    def winnow(n: Int = TextAnalysis.WinnowGram,
        w: Int = TextAnalysis.WinnowWindow): DataFrame =
      TextAnalysis.winnowFingerprints(docs, n, w)
    def countMin(topK: Int = 20): DataFrame =
      graft.ext.HeavyHitters.countMinEstimates(docs, topK)
    def qualityLinear: DataFrame = TextAnalysis.linearQuality(spark, docs)
    def kneserNey(k: Int = Corpus.KnTopK): DataFrame =
      Corpus.knSmoothedBigrams(docs, k)
    def kneserNey3(k: Int = Corpus.KnTopK): DataFrame =
      Corpus.knSmoothedTrigrams(docs, k)
    def wordpiece(vocabSize: Int = Corpus.WordpieceVocab,
        maxPiece: Int = Corpus.WordpieceMaxPiece): DataFrame =
      Corpus.wordpieceReport(docs, vocabSize, maxPiece)
    def unigram(vocabSize: Int = Corpus.UnigramVocab,
        maxPiece: Int = Corpus.UnigramMaxPiece): DataFrame =
      Corpus.unigramReport(docs, vocabSize, maxPiece)
    def lmDocScores(refSource: String = Corpus.LmRefSource): DataFrame =
      Corpus.lmDocScores(docs, refSource)
    def doremiMix(refSource: String = Corpus.LmRefSource): DataFrame =
      Corpus.doremiMix(docs, refSource)
    def distinctNgramProfile: DataFrame = Corpus.distinctNgramProfile(docs)
    def ccnetBuckets(refSource: String = Corpus.LmRefSource): DataFrame =
      Corpus.ccnetBuckets(docs, refSource)
    private def docs = Tables.documents(spark, dataDir)
  }

  /** PII redaction + anonymization + release audits — see
    * [[graft.ext.Privacy]].
    */
  object privacy {
    def redact(df: DataFrame, textCol: String): DataFrame =
      Privacy.redactText(df, textCol)
    def maskCustomers: DataFrame =
      Privacy.maskCustomers(Tables.customer(spark, dataDir))
    def kAnonymity: DataFrame =
      Privacy.kAnonymityAudit(Tables.customer(spark, dataDir))
    def lDiversity(lBar: Int = 3): DataFrame =
      Privacy.lDiversityAudit(Tables.customer(spark, dataDir), lBar)
    def tCloseness(tBar: Double = 0.15): DataFrame =
      Privacy.tClosenessAudit(Tables.customer(spark, dataDir), tBar)
    def dpCounts(salt: Long = 0L): DataFrame = Privacy.dpNoisyCounts(
      Tables.customer(spark, dataDir), Tables.nation(spark, dataDir), salt)
    def erasureAudit: DataFrame = Privacy.erasureAudit(
      Tables.customer(spark, dataDir), Tables.orders(spark, dataDir),
      Tables.lineitem(spark, dataDir))
    def randomizedResponse(salt: Long = 0L): DataFrame =
      Privacy.randomizedResponse(Tables.customer(spark, dataDir),
        Tables.nation(spark, dataDir), salt)
  }

  object similarity {
    def topK(k: Int = Similarity.TopK): DataFrame =
      Similarity.bruteForceTopK(emb, k)
    def knnGraph: DataFrame = Similarity.nearestNeighborGraph(emb)
    def knnLabelEval(k: Int = Similarity.KnnEvalK): DataFrame =
      Similarity.knnLabelEval(emb, k)
    def knnLabelEvalIvf(k: Int = Similarity.KnnEvalK,
        probes: Int = Similarity.NearDupProbes): DataFrame =
      Similarity.knnLabelEvalIvf(emb, k, probes)
    def topKApprox(k: Int = Similarity.TopK): DataFrame =
      Similarity.ivfTopK(emb, k)
    def nearDupPairs(threshold: Double = 0.35): DataFrame =
      Similarity.embeddingNearDupPairs(emb, threshold)
    def nearDupPairsIvf(threshold: Double = 0.35): DataFrame =
      Similarity.embeddingNearDupPairsIvf(emb, threshold)
    def quantizeInt8: DataFrame = Similarity.quantizeInt8(emb)
    def topKSq(k: Int = Similarity.TopK): DataFrame =
      Similarity.sqTopK(emb, k)
    def topKSqIvf(k: Int = Similarity.TopK): DataFrame =
      Similarity.sqTopK(emb, k, candidates = Some(
        Similarity.ivfCandidates(emb)
          .select("query_id", "neighbor_id")))
    def trainCentroids(k: Int = Similarity.Centroids,
        iters: Int = Similarity.KmeansIters): DataFrame =
      Similarity.trainCentroids(emb, k, iters)
    def kmeansProfile: DataFrame = Similarity.kmeansClusterProfile(emb)
    def silhouette(codebook: Option[DataFrame] = None): DataFrame =
      Similarity.silhouetteProfile(emb, codebook)
    def rangeSearch(
        threshold: Double = Similarity.RangeSearchThreshold): DataFrame =
      Similarity.rangeSearchEval(emb, threshold)
    def dimProfile: DataFrame = Similarity.dimProfile(emb)
    def labelCentroids: DataFrame = Similarity.labelCentroids(emb)
    def centroidOutliers: DataFrame = Similarity.centroidOutliers(emb)
    def gramMatrix: DataFrame = Similarity.gramMatrix(emb)
    def srpEval(threshold: Double = 0.35): DataFrame =
      Similarity.srpEval(emb, threshold)
    def thresholdSweep(
        thresholds: Seq[Double] = Similarity.VecSweepThresholds): DataFrame =
      Similarity.embeddingThresholdSweep(emb, thresholds)
    def pqProfile: DataFrame = Similarity.pqProfile(emb)
    def hardNegatives(k: Int = Similarity.HardNegK): DataFrame =
      Similarity.hardNegatives(emb, k)
    def topKPq(k: Int = Similarity.TopK,
        shortlist: Int = Similarity.PqShortlist): DataFrame =
      Similarity.pqTopK(emb, k, shortlist)
    def topKIvfPq(k: Int = Similarity.TopK,
        shortlist: Int = Similarity.PqShortlist): DataFrame =
      Similarity.ivfPqTopK(emb, k, shortlist)
    def semDedup(eps: Double = Similarity.SemDedupEps): DataFrame =
      Similarity.semDedup(emb, eps)
    def semDedupSweep(
        epsArms: Seq[Double] = Similarity.SemDedupSweepEps): DataFrame =
      Similarity.semDedupSweep(emb, epsArms)
    def matryoshkaEval(k: Int = Similarity.TopK,
        dims: Seq[Int] = Similarity.MatryoshkaDims): DataFrame =
      Similarity.matryoshkaEval(emb, k, dims)
    def topComponent: DataFrame = Similarity.topComponent(emb)
    def topComponents(r: Int = Similarity.TopComponentsR): DataFrame =
      Similarity.topComponents(emb, r)
    def abttTransform: DataFrame = Similarity.abttTransform(emb)
    def abttEval(k: Int = Similarity.TopK): DataFrame =
      Similarity.abttEval(emb, k)
    def whitenTransform(r: Int = Similarity.TopComponentsR): DataFrame =
      Similarity.whitenTransform(emb, r)
    def whitenEval(k: Int = Similarity.TopK): DataFrame =
      Similarity.whitenEval(emb, k)
    def embeddingDecontam(benchLabel: Int = Similarity.DecontamBenchLabel,
        eps: Double = Similarity.DecontamEps): DataFrame =
      Similarity.embeddingDecontam(emb, benchLabel, eps)
    def mmrTopK(k: Int = Similarity.TopK,
        shortlist: Int = Similarity.MmrShortlist,
        lam: Double = Similarity.MmrLambda): DataFrame =
      Similarity.mmrTopK(emb, k, shortlist, lam)
    def kcenterCoreset(k: Int = Similarity.CoresetK): DataFrame =
      Similarity.kcenterCoreset(emb, k)
    def ivfListStats: DataFrame = Similarity.ivfListStats(emb)
    def ivfProbeSweep(
        arms: Seq[Int] = Similarity.IvfProbeArms): DataFrame =
      Similarity.ivfProbeSweep(emb, arms)
    def hadamardRotate: DataFrame = Similarity.hadamardRotate(emb)
    def hadamardSpectrum: DataFrame = Similarity.hadamardSpectrum(emb)
    def lofScores(k: Int = Similarity.LofK,
        threshold: Double = Similarity.LofThreshold): DataFrame =
      Similarity.lofScores(emb, k, threshold)
    def knnGraphIvfEval(k: Int = Similarity.TopK,
        probes: Int = Similarity.NearDupProbes): DataFrame =
      Similarity.knnGraphIvfEval(emb, k, probes)
    def embeddingDecontamSweep(
        benchLabel: Int = Similarity.DecontamBenchLabel): DataFrame =
      Similarity.embeddingDecontamSweep(emb, benchLabel)
    private def emb = Tables.embeddings(spark, dataDir)
  }

  object timeSeries {
    def seasonalNaive: DataFrame =
      TimeSeries.seasonalNaiveBacktest(Tables.orders(spark, dataDir))
    def gapFillDailySales: DataFrame =
      TimeSeries.gapFillDailySales(Tables.orders(spark, dataDir))
    def rollingCustomerSpend: DataFrame =
      TimeSeries.rollingCustomerSpend(Tables.orders(spark, dataDir))
    def scd2UserPhases: DataFrame =
      TimeSeries.scd2UserPhases(Tables.events(spark, dataDir))
    def funnel(stages: Seq[String] = Seq("view", "click", "purchase"),
        window: Option[String] = None): DataFrame =
      TimeSeries.funnel(Tables.events(spark, dataDir), stages, window)
    def transitions: DataFrame =
      TimeSeries.transitionMatrix(Tables.events(spark, dataDir))
    def cohortRetention: DataFrame =
      TimeSeries.cohortRetention(Tables.events(spark, dataDir))
    def cohortLtv: DataFrame =
      TimeSeries.cohortLtv(Tables.orders(spark, dataDir))
    def holt: DataFrame =
      TimeSeries.holtDailyRevenue(Tables.orders(spark, dataDir))
    def holtWinters: DataFrame =
      TimeSeries.holtWintersDailyRevenue(Tables.orders(spark, dataDir))
    def forecastBacktest: DataFrame =
      TimeSeries.forecastBacktest(Tables.orders(spark, dataDir))
    def decompose: DataFrame =
      TimeSeries.decomposeDaily(Tables.orders(spark, dataDir))
    def userStreaks: DataFrame =
      TimeSeries.userStreaks(Tables.events(spark, dataDir))
    def twap: DataFrame =
      TimeSeries.twapUserValue(Tables.events(spark, dataDir))
    def cusum: DataFrame =
      TimeSeries.cusumDailyRevenue(Tables.orders(spark, dataDir))
    def seasonality: DataFrame =
      TimeSeries.dowSeasonality(Tables.orders(spark, dataDir))
    def forwardFill: DataFrame =
      TimeSeries.forwardFillDaily(Tables.events(spark, dataDir))
    def interpolate: DataFrame =
      TimeSeries.interpolateDaily(Tables.events(spark, dataDir))
    def activeUsers: DataFrame =
      TimeSeries.activeUsers(Tables.events(spark, dataDir))
    def newVsReturning: DataFrame =
      TimeSeries.newVsReturning(Tables.events(spark, dataDir))
    def thresholdEpisodes: DataFrame =
      TimeSeries.thresholdEpisodes(Tables.orders(spark, dataDir))
    def robustAnomalies: DataFrame =
      TimeSeries.robustAnomalies(Tables.orders(spark, dataDir))
    def rollingMedian(window: Int = TimeSeries.RollingMedianWindow)
        : DataFrame =
      TimeSeries.rollingMedianDailyRevenue(
        Tables.orders(spark, dataDir), window)
    def lagFeatures: DataFrame =
      TimeSeries.lagFeatures(Tables.orders(spark, dataDir))
    def markovSteadyState(iters: Int = TimeSeries.MarkovIters): DataFrame =
      TimeSeries.markovSteadyState(Tables.events(spark, dataDir), iters)
    def seasonalAnomalies: DataFrame =
      TimeSeries.seasonalAnomalies(Tables.orders(spark, dataDir))
    def retentionTriangle: DataFrame =
      TimeSeries.retentionTriangle(Tables.events(spark, dataDir))
  }

  /** Commerce analytics over orders/lineitem — see [[graft.ext.Retail]]. */
  object retail {
    def abc: DataFrame =
      Retail.abcClassification(Tables.lineitem(spark, dataDir))
    def basketLift(minSupport: Int = 3, k: Int = 100): DataFrame =
      Retail.basketLift(Tables.lineitem(spark, dataDir), minSupport, k)
    def rfm: DataFrame = Retail.rfmSegments(Tables.orders(spark, dataDir))
    def repeatIntervals: DataFrame =
      Retail.repeatIntervals(Tables.orders(spark, dataDir))
    def skyline: DataFrame = Retail.skylineParts(Tables.part(spark, dataDir))
    def priceIndex: DataFrame =
      Retail.unitValueIndex(Tables.lineitem(spark, dataDir))
  }

  /** Experiment readouts over events — see [[graft.ext.Experiment]]. */
  object experiment {
    def wilson: DataFrame = Experiment.wilsonAb(Tables.events(spark, dataDir))
    def mannWhitney: DataFrame =
      Experiment.mannWhitney(Tables.events(spark, dataDir))
    def cuped: DataFrame = Experiment.cuped(Tables.events(spark, dataDir))
    def srm: DataFrame = Experiment.srm(Tables.events(spark, dataDir))
    def mde: DataFrame = Experiment.mde(Tables.events(spark, dataDir))
  }

  /** Co-purchase graph analytics — see [[graft.ext.Graph]]. */
  object graph {
    private def edges =
      Graph.coPurchaseEdges(Tables.lineitem(spark, dataDir))
    def pagerank(iterations: Int = 3): DataFrame =
      Graph.pagerank(edges, iterations)
    def triangles: DataFrame = Graph.triangleCount(edges)
    def degrees: DataFrame = Graph.degreeDistribution(edges)
    def kcore(k: Int = 80): DataFrame = Graph.kcore(edges, k)
    def edgeJaccard: DataFrame = Graph.edgeJaccard(edges)
    def hits: DataFrame = Graph.hits(Tables.lineitem(spark, dataDir),
      Tables.orders(spark, dataDir))
    def assortativity: DataFrame = Graph.assortativity(edges)
    def communities(rounds: Int = Graph.LpaRounds): DataFrame =
      Graph.labelPropagation(edges, rounds)
    def communityModularity(rounds: Int = Graph.LpaRounds): DataFrame =
      Graph.lpaModularity(edges, rounds)
    def personalizedPagerank(iterations: Int = 3,
        seedCount: Int = Graph.PprSeedCount): DataFrame =
      Graph.personalizedPagerank(edges, iterations, seedCount)
    def bfs(seedCount: Int = Graph.PprSeedCount,
        rounds: Int = Graph.BfsRounds): DataFrame =
      Graph.bfsDistances(edges, seedCount, rounds)
    def linkPrediction(topK: Int = Graph.LinkPredTopK): DataFrame =
      Graph.linkPrediction(edges, topK)
    def components: DataFrame = Graph.weakComponents(edges)
  }

  /** Exact-arithmetic statistics — see [[graft.ext.Stats]]. */
  object stats {
    def trend: DataFrame = Stats.trendSegmentSpend(
      Tables.orders(spark, dataDir), Tables.customer(spark, dataDir))
    def correlation: DataFrame =
      Stats.corrQtyValue(Tables.lineitem(spark, dataDir))
    def concentration: DataFrame = Stats.hhiRegionRevenue(
      Tables.orders(spark, dataDir), Tables.customer(spark, dataDir),
      Tables.nation(spark, dataDir), Tables.region(spark, dataDir))
    def benford: DataFrame =
      Stats.benfordOrderTotals(Tables.orders(spark, dataDir))
    def autocorrelation(lags: Seq[Int] = Stats.AutocorrLags): DataFrame =
      Stats.autocorrDailyRevenue(Tables.orders(spark, dataDir), lags)
    def pacf(maxLag: Int = Stats.PacfMaxLag): DataFrame =
      Stats.pacfDailyRevenue(Tables.orders(spark, dataDir), maxLag)
    def rollingCorrelation(window: Int = Stats.RollingCorrWindow): DataFrame =
      Stats.rollingCorrDaily(Tables.orders(spark, dataDir), window)
    def mannKendall: DataFrame = Stats.mannKendallSegment(
      Tables.orders(spark, dataDir), Tables.customer(spark, dataDir))
    def theilSen: DataFrame = Stats.theilSenSegment(
      Tables.orders(spark, dataDir), Tables.customer(spark, dataDir))
    def olsTrend: DataFrame = Stats.olsSegment(
      Tables.orders(spark, dataDir), Tables.customer(spark, dataDir))
    def bootstrap(arms: Int = Stats.BootstrapArms): DataFrame =
      Stats.poissonBootstrap(Tables.orders(spark, dataDir), arms)
    def welchT: DataFrame =
      Stats.welchTOrderValues(Tables.orders(spark, dataDir))
    def anova: DataFrame =
      Stats.anovaOrderValues(Tables.orders(spark, dataDir))
    def permutation(reps: Int = Stats.PermutationReps): DataFrame =
      Stats.permutationTest(Tables.events(spark, dataDir), reps)
    def bhFdr(reps: Int = Stats.PermutationReps): DataFrame =
      Stats.bhFdrSegments(Tables.events(spark, dataDir), reps)
  }

  object quality {
    def profile(df: DataFrame): DataFrame = Quality.profile(df)
    def outliers: DataFrame = Quality.outliers(Tables.orders(spark, dataDir))
    def expectations: DataFrame = graft.etl.Expectations.ordersSuite(
      Tables.orders(spark, dataDir), Tables.customer(spark, dataDir))
    def zscore: DataFrame =
      Quality.zscoreQuantity(Tables.lineitem(spark, dataDir))
    def binning: DataFrame =
      Quality.decileBinning(Tables.lineitem(spark, dataDir))
    def cdf: DataFrame = Quality.featureCdf(Tables.lineitem(spark, dataDir))
    def crosstab: DataFrame =
      Quality.crosstabChi2(Tables.events(spark, dataDir))
    def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame =
      Quality.keySkew(df, keyCol, label)
    def mad: DataFrame = Quality.madQuantity(Tables.lineitem(spark, dataDir))
    def referentialIntegrity: DataFrame =
      Quality.referentialIntegrity(spark, dataDir)
    def freshness: DataFrame = Quality.freshnessAudit(spark, dataDir)
    def uniqueness: DataFrame = Quality.uniquenessAudit(spark, dataDir)
  }

  object streaming {
    def hourly(stream: DataFrame): DataFrame =
      EventsStreaming.hourlyStream(stream)
    def sessions(stream: DataFrame): DataFrame =
      EventsStreaming.sessionsStream(stream)
    def dedup(stream: DataFrame): DataFrame =
      EventsStreaming.dedupStream(stream)
    def enrich(stream: DataFrame): DataFrame = EventsStreaming.enrichStream(
      stream, Tables.customer(spark, dataDir))
    def nearDupCandidates(docStream: DataFrame,
        maxPerBucket: Int = graft.streaming.NearDupStream.DefaultMaxPerBucket)
        : DataFrame =
      graft.streaming.NearDupStream
        .candidatesStream(docStream, maxPerBucket).toDF()
    def topUsers(k: Int = EventsStreaming.TopUsersK): DataFrame =
      EventsStreaming.topUsersBatch(Tables.events(spark, dataDir), k)
    def heavyUsers(typedStream: org.apache.spark.sql.Dataset[
        graft.streaming.HeavyUsersStream.TypedEvent],
        k: Int = graft.streaming.HeavyUsersStream.DefaultCounters)
        : DataFrame =
      graft.streaming.HeavyUsersStream.heavyUsersStream(typedStream, k).toDF()
    def rateMonitor(typedStream: org.apache.spark.sql.Dataset[
        graft.streaming.RateMonitorStream.MinuteEvent],
        k: Int = graft.streaming.RateMonitorStream.EwmaDepth): DataFrame =
      graft.streaming.RateMonitorStream.rateMonitorStream(typedStream, k)
        .toDF()
    def rateMonitorBatch(k: Int = graft.streaming.RateMonitorStream.EwmaDepth)
        : DataFrame =
      EventsStreaming.rateMonitorBatch(Tables.events(spark, dataDir), k)
    def dispersion: DataFrame =
      EventsStreaming.dispersionByType(Tables.events(spark, dataDir))
  }

  /** MERGE INTO-style upsert of `source` into `target` by `keys`. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      validateUniqueSource: Boolean = false): DataFrame =
    MergeUpsert.upsert(target, source, keys, validateUniqueSource)

  /** CDC apply: fold an (op, seq) change feed into a snapshot by `keys`. */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keys: Seq[String]): DataFrame =
    MergeUpsert.applyChanges(target, changes, keys)

  /** Key-based snapshot diff — see [[graft.operators.SnapshotDiff]]. */
  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame =
    SnapshotDiff.diff(old, neu, keys, compareCols)

  /** Bloom-pruned fact⋈dim join — see [[graft.operators.BloomJoin]]. */
  def bloomJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame =
    BloomJoin.bloomPrunedJoin(fact, factKey, dim, dimKey, fpp)

  /** Merge a delta batch's partial aggregates into stored partials —
    * see [[graft.operators.IncrementalAgg]].
    */
  def mergePartials(stored: DataFrame, delta: DataFrame): DataFrame =
    IncrementalAgg.merge(stored, delta)

  /** Release block-manager storage held by leased checkpoints (call after
    * consuming a dedup/recursive result in a long-lived session).
    */
  def releaseCheckpoints(): Unit = CheckpointLease.releaseAll()

  object multimodal {
    def catalog: DataFrame = Multimodal.catalog(docs)
    def frames(frameBytes: Int = 16, stride: Int = 4): DataFrame =
      Multimodal.sampleFrames(docs, frameBytes, stride)
    def resize(outLen: Int = 256): DataFrame = {
      import spark.implicits._
      Multimodal.resizeNearest(
        Multimodal.assets(docs).as[Multimodal.Asset], outLen).toDF()
    }
    def decodePng: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.decodePng(Multimodal.encodePng(ds)).toDF()
    }
    def decodeWav: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.decodeWav(Multimodal.encodeWav(ds)).toDF()
    }
    def imageFeatures: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.imageFeatures(Multimodal.encodePng(ds)).toDF()
    }
    def perceptualHash: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.perceptualHash(Multimodal.encodePng(ds)).toDF()
    }
    def phashNearDups(maxHamming: Int = 6): DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.phashNearDupPairs(Multimodal.encodePng(ds), maxHamming)
    }
    def phashClusters: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.phashClusters(Multimodal.encodePng(ds))
    }
    def averageHash: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.averageHash(Multimodal.encodePng(ds)).toDF()
    }
    def audioFingerprint(frameLen: Int = 160): DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.audioFingerprint(Multimodal.encodeWav(ds), frameLen).toDF()
    }
    def audioNearDups(maxHamming: Int = 6): DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.audioNearDupPairs(Multimodal.encodeWav(ds),
        maxHamming = maxHamming)
    }
    def audioClusters: DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.audioClusters(Multimodal.encodeWav(ds))
    }
    def audioResample(frameLen: Int = 160): DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.audioResampleEnergy(Multimodal.encodeWav(ds), frameLen)
        .toDF()
    }
    def audioSnr(msqThreshold: Long = Multimodal.VadMsqThreshold)
        : DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.audioSnr(Multimodal.encodeWav(ds),
        msqThreshold = msqThreshold)
    }
    def audioVad(msqThreshold: Long = Multimodal.VadMsqThreshold)
        : DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.audioVadSegments(Multimodal.encodeWav(ds),
        msqThreshold = msqThreshold)
    }
    def videoShots(deltaThreshold: Long = Multimodal.ShotDeltaThreshold)
        : DataFrame =
      Multimodal.videoShots(docs, deltaThreshold = deltaThreshold)
    def videoNearDupPairs(maxMismatch: Int = 1): DataFrame =
      Multimodal.videoNearDupPairs(docs, maxMismatch = maxMismatch)
    def videoClusters(maxMismatch: Int = 1): DataFrame =
      Multimodal.videoClusters(docs, maxMismatch = maxMismatch)
    def blankFilter(varThreshold: Double = Multimodal.BlankVarThreshold)
        : DataFrame = {
      import spark.implicits._
      val ds = Multimodal.assets(docs).as[Multimodal.Asset]
      Multimodal.imageMoments(Multimodal.encodePng(ds), varThreshold).toDF()
    }
    private def docs = Tables.documents(spark, dataDir)
  }

  object analytics {
    def pricingSummary: DataFrame =
      Relational.pricingSummary(Tables.lineitem(spark, dataDir))
    def topCustomers: DataFrame = Relational.topCustomersPerSegment(
      Tables.lineitem(spark, dataDir), Tables.orders(spark, dataDir),
      Tables.customer(spark, dataDir))
    def latestOrderAsOf: DataFrame = AsOfJoin.latestOrderAsOf(
      Tables.events(spark, dataDir), Tables.orders(spark, dataDir))
    def eventsNearOrders(toleranceDays: Int): DataFrame =
      RangeJoin.eventsNearOrders(Tables.events(spark, dataDir),
        Tables.orders(spark, dataDir), toleranceDays)
    def bucketedRevenue: DataFrame =
      graft.sources.Bronze.bucketedJoinRevenue(spark, dataDir)
    def dppRevenue: DataFrame =
      graft.sources.Bronze.dppJoinRevenue(spark, dataDir)
    def shippingPriority: DataFrame = Relational.shippingPriority(
      Tables.customer(spark, dataDir), Tables.orders(spark, dataDir),
      Tables.lineitem(spark, dataDir))
    def localSupplierVolume: DataFrame = Relational.localSupplierVolume(
      Tables.region(spark, dataDir), Tables.nation(spark, dataDir),
      Tables.customer(spark, dataDir), Tables.supplier(spark, dataDir),
      Tables.orders(spark, dataDir), Tables.lineitem(spark, dataDir))
    def topSupplier: DataFrame = Relational.topSupplier(
      Tables.supplier(spark, dataDir), Tables.lineitem(spark, dataDir))
    def hashSample: DataFrame = Relational.hashSampledUnion(
      Tables.orders(spark, dataDir), Tables.documents(spark, dataDir))
    def explosionProfile(topN: Int = 10): DataFrame =
      SkewJoin.joinExplosionProfile(Tables.events(spark, dataDir), topN)
    def saltedJoin(big: DataFrame, small: DataFrame, key: String,
        salts: Int = 16): DataFrame = {
      import org.apache.spark.sql.functions.{col, xxhash64}
      // Hash the whole fact row for the salt seed: within a hot key the
      // non-key columns vary, so rows spread across the sub-keys.
      SkewJoin.saltedJoin(big, small, key, key,
          xxhash64(big.columns.map(col).toSeq: _*), salts)
        .drop(small(key))
    }
  }

  /** Multi-dimensional file layout (Z-order clustering + layout-quality
    * metric) — see [[graft.sources.Layout]].
    */
  object layout {
    def writeZOrdered(df: DataFrame, path: String, colA: String,
        colB: String, files: Int): Unit =
      graft.sources.Layout.writeZOrdered(df, path, colA, colB, files)
    def writeHilbertOrdered(df: DataFrame, path: String, colA: String,
        colB: String, files: Int): Unit =
      graft.sources.Layout.writeHilbertOrdered(df, path, colA, colB, files)
    def fileSpanFraction(df: DataFrame, keyCol: String): Double =
      graft.sources.Layout.fileSpanFraction(df, keyCol)
    def compact(path: String, targetFiles: Int,
        sortKey: Option[String] = None): Unit =
      graft.sources.Layout.compact(spark, path, targetFiles, sortKey)
    def rangePlan(parts: Long = graft.plans.Layout.RangeParts): DataFrame =
      graft.plans.Layout.rangePartitionPlan(
        Tables.orders(spark, dataDir), parts)
    def clusteringDepth: DataFrame =
      graft.plans.Layout.clusteringDepth(Tables.orders(spark, dataDir))
    def bloomSkip(bits: Long = graft.plans.Layout.BloomBits): DataFrame =
      graft.plans.Layout.bloomSkipAudit(
        Tables.orders(spark, dataDir), bits)
    def broadcastAdvisor: DataFrame =
      graft.plans.Layout.broadcastAdvisor(spark, dataDir)
  }

  /** Stored-ANN-index lifecycle (build → append → pruned serve) — see
    * [[graft.sources.AnnIndex]].
    */
  object ann {
    def buildIndex(dir: String): Unit = {
      graft.sources.AnnIndex.buildIvfPq(
        Tables.embeddings(spark, dataDir), dir)
      ()
    }
    def appendIndex(newVecs: DataFrame, dir: String): Unit =
      graft.sources.AnnIndex.appendIvfPq(spark, newVecs, dir)
    def serve(dir: String, k: Int = graft.ext.Similarity.TopK): DataFrame =
      graft.sources.AnnIndex.serveIvfPqTopK(spark, dir,
        Tables.embeddings(spark, dataDir), k)
  }

  /** Full medallion run with validation; throws on any failed check. */
  def runPipeline(outDir: String): Seq[Pipeline.CheckResult] =
    Pipeline.runAll(spark, dataDir, outDir)

  /** Full training-data curation run (screen → despan → dedup →
    * curriculum) with validation; throws on any failed check.
    */
  def runCorpusPipeline(outDir: String): Seq[Pipeline.CheckResult] =
    graft.ext.CorpusPipeline.runAll(spark, dataDir, outDir)
}
