package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale properties the scaladocs promise must
  * be visible in `.explain("formatted")`, not just asserted in prose —
  * column pruning reaching the parquet scan, predicate pushdown, broadcast
  * vs shuffle join choices, and shuffle counts. These are the checks that
  * catch a "correct but reads everything" regression long before a 100 TB
  * run would.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)
  private def exchanges(df: DataFrame): Int =
    "(?m)^\\s*\\(\\d+\\) Exchange".r.findAllIn(plan(df)).length

  test("column pruning: a two-column projection reads a two-column schema") {
    val p = plan(Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.Funcs.fingerprint(col("text")).as("md5")))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
      .map(_.group(1)).getOrElse(fail(s"no ReadSchema in plan:\n$p"))
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("source") && !read.contains("lang"), s"unpruned scan: $read")
  }

  test("predicate pushdown: a literal filter reaches the parquet scan as PushedFilters") {
    val p = plan(Tables.documents(spark, dir).filter(col("source") === "src3")
      .select(col("doc_id")))
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(source,src3\\)".r.findFirstIn(p).isDefined,
      s"filter not pushed:\n$p")
  }

  test("map-side operators plan zero shuffles") {
    assert(exchanges(Pipeline.hashSplit(Tables.documents(spark, dir))) == 0)
    assert(exchanges(TextAnalysis.normalizeText(Tables.documents(spark, dir))) == 0)
    assert(exchanges(Pipeline.redactPii(Tables.documents(spark, dir))) == 0)
    assert(exchanges(Pipeline.bernoulliSample(Tables.documents(spark, dir), 0.25)) == 0)
    // model scoring: literal weights, one projection, no join anywhere
    assert(exchanges(TextAnalysis.linearQualityScore(
      Tables.documents(spark, dir), (0 until 64).map(_.toLong))) == 0)
    // round-6 map-side family: HTML strip, C4 line rules, span corruption
    assert(exchanges(TextAnalysis.stripHtml(Tables.documents(spark, dir))) == 0)
    assert(exchanges(TextAnalysis.c4LineFilter(Tables.documents(spark, dir))) == 0)
    assert(exchanges(Pipeline.spanCorrupt(Tables.documents(spark, dir))) == 0)
    // round-7 map-side family: token-exact blocklist gate, and the whole
    // Dolma-style attributes sidecar composing five taggers in one pass
    assert(exchanges(TextAnalysis.badWordFilter(
      Tables.documents(spark, dir), Seq("slow"))) == 0)
    assert(exchanges(TextAnalysis.attributeReport(Tables.documents(spark, dir))) == 0)
  }

  test("stupidBackoffScore: every shuffle partitions on 8-byte fp keys or doc_id, never gram strings") {
    val p = plan(TextAnalysis.stupidBackoffScore(
      Tables.documents(spark, dir), col("source") =!= "src0"))
    val exchangeLines = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    exchangeLines.foreach { l =>
      assert(!l.contains("text") && !l.contains("gram") && !l.contains("word"),
        s"backoff shuffle carries strings: $l")
    }
  }

  test("thresholdSweep: one aggregate reduction, no join, no window — the corpus reads once") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, BroadcastHashJoinExec, ShuffledHashJoinExec}
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 10).cast("double").as("s"),
        col("n_chars").as("n_tokens"))
    val df = graft.operators.Pipeline.thresholdSweep(
      scored, "s", "n_tokens", Seq(0.0, 5.0))
    val sp = df.queryExecution.sparkPlan
    assert(sp.collect { case w: WindowExec => w }.isEmpty, "unexpected window")
    assert(sp.collect {
      case j: SortMergeJoinExec => j
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
    }.isEmpty, "unexpected join")
    // the only exchanges are the two-phase aggregate's (partial → final)
    assert(exchanges(df) <= 2, s"extra exchanges:\n${plan(df)}")
  }

  test("bigramSurprisal shuffles 8-byte fingerprints, never token-pair strings") {
    val p = plan(TextAnalysis.bigramSurprisal(Tables.documents(spark, dir)))
    // every Exchange partitions on the hashed keys (bk/pk) or the final
    // doc_id group — a 'prev'/'word' string column in any Exchange means
    // the fingerprint projection regressed
    val exchangeLines = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    exchangeLines.foreach { l =>
      assert(!l.contains("prev") && !l.contains("word"),
        s"bigram shuffle carries strings: $l")
    }
  }

  test("dedup_exact is exactly one digest-keyed shuffle") {
    assert(exchanges(Dedup.exact(Tables.documents(spark, dir))) == 1)
  }

  test("enrichment join broadcasts the dimension side (no shuffle of the stream side)") {
    val p = plan(Relational.enrichmentJoin(
      Tables.orders(spark, dir), Tables.customer(spark, dir)))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("brute-force top-k broadcasts the query side: corpus is never shuffled pre-rank") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val p = plan(Similarity.bruteForceTopK(queries, emb.select("vec_id", "embedding"), 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("decontaminate over the broadcast bound: probe joins shuffle-keyed, zero BroadcastExchange") {
    // planner broadcasts off so any BroadcastExchange could only come from
    // the operator's own hint — which the tripped guard must suppress
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Pipeline.decontaminate(
        Tables.documents(spark, dir), n = 5, broadcastMaxRows = 0L))
      assert(!p.contains("BroadcastExchange"),
        s"guard tripped but the probe side still broadcasts:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle equi-join on gram:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("decontaminateBloom: the bloom prune is a Filter on the train-gram side, before any join") {
    val p = plan(Pipeline.decontaminateBloom(Tables.documents(spark, dir), n = 5))
    // the prune must survive as a Filter feeding the join — if Catalyst
    // ever reordered it above the join, the corpus side would shuffle
    // every gram and the operator's whole point would be gone
    val filterIdx = p.indexOf("graft_bloom_contains")
    assert(filterIdx >= 0, s"no bloom prune in plan:\n$p")
    assert("(?i)join".r.findFirstIn(p).isDefined, s"no exact verify join:\n$p")
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("globalOrderShards: the only unpartitioned window runs over the per-bucket offsets, never the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    val sp = Pipeline.globalOrderShards(Tables.documents(spark, dir))
      .queryExecution.sparkPlan
    val windows = sp.collect { case w: WindowExec => w }
    val (unpart, part) = windows.partition(_.partitionSpec.isEmpty)
    assert(part.nonEmpty, "expected the bucket-partitioned rank window")
    assert(unpart.size == 1, s"expected exactly one unpartitioned window, got ${unpart.size}")
    // the unpartitioned window's subtree must aggregate to per-bucket rows
    // (the ≤256-row offsets relation) before the window ever runs — i.e.
    // a grouped aggregate sits between it and any corpus scan
    val grouped = unpart.head.collectFirst {
      case a: HashAggregateExec if a.groupingExpressions.nonEmpty       => a
      case a: ObjectHashAggregateExec if a.groupingExpressions.nonEmpty => a
      case a: SortAggregateExec if a.groupingExpressions.nonEmpty       => a
    }
    assert(grouped.isDefined,
      s"unpartitioned window runs over an unaggregated input:\n${unpart.head}")
  }

  test("materializeMixture: every window is source-partitioned — per-source budgets never funnel the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = graft.operators.Pipeline.materializeMixture(
      Tables.documents(spark, dir), budgetTokens = 24000L)
      .queryExecution.sparkPlan
    val windows = sp.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the bucket running-total windows")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window in the per-source sampler:\n$sp")
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("duplicatedSpans: every window is doc-partitioned — the interval merge never funnels the corpus") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = Dedup.duplicatedSpans(Tables.documents(spark, dir))
      .queryExecution.sparkPlan
    val windows = sp.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the gaps-and-islands windows")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found an unpartitioned window in the span merge")
  }

  test("whole-stage codegen covers the scoring hot path (native dot product fuses)") {
    val emb = Tables.embeddings(spark, dir)
    val p = plan(emb.select(
      graft.functions.Native.dotF(col("embedding"), col("embedding")).as("d")))
    // FormattedMode marks codegen stages with "[codegen id : N]" on each
    // participating operator; the Project carrying the dot product must be in one
    assert("Project \\[codegen id".r.findFirstIn(p).isDefined, s"no codegen span:\n$p")
  }

  test("importanceTopK compiles to TakeOrderedAndProject — per-partition top-k, never a global sort") {
    val p = plan(TextAnalysis.importanceTopK(
      Tables.documents(spark, dir), col("source") === "src0", k = 100))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject:\n$p")
    // a standalone global Sort would mean the limit did not fuse
    assert(!"(?m)^\\s*\\(\\d+\\) Sort".r.findFirstIn(p).isDefined, s"global sort leaked:\n$p")
  }

  test("semanticDedup assignment is map-side literal-centroid codegen: no centroid relation joins the corpus") {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 2)
    val assigned = emb.select(col("vec_id"),
      Similarity.nearestBucket(col("embedding"), cents).as("cluster"))
    assert(exchanges(assigned) == 0, s"assignment shuffled:\n${plan(assigned)}")
    val p = plan(assigned)
    assert(!p.contains("Join"), s"assignment joined a centroid relation:\n$p")
  }

  test("perplexityBuckets: the tertile cuts broadcast — no shuffled cross join of the corpus") {
    val p = plan(TextAnalysis.perplexityBuckets(Tables.documents(spark, dir)))
    assert(p.contains("BroadcastNestedLoopJoin"), s"cuts not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian leaked:\n$p")
  }

  test("lineDedup: first occurrence is a partial-agg min — no window anywhere in the plan") {
    import org.apache.spark.sql.execution.window.WindowExec
    val lined = Tables.documents(spark, dir).select(col("doc_id"),
      regexp_replace(col("text"), " ", "\n").as("text"))
    val qe = Dedup.lineDedup(lined).queryExecution
    assert(qe.sparkPlan.collect { case w: WindowExec => w }.isEmpty,
      "line first-occurrence must never be a line-partitioned window")
    assert(plan(Dedup.lineDedup(lined)).contains("partial_min"),
      "expected map-side partial aggregation of the packed first-occurrence key")
    Dedup.releaseCaches(spark)
  }

  test("pqTopK: the LUT side broadcasts — the codes scan is never shuffled pre-rank") {
    val cb: Array[Array[Array[Float]]] =
      Array.tabulate(8, 16, 8)((s, c, j) => (((s * 3 + c * 5 + j * 7) % 17) - 8).toFloat)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val df = Similarity.pqTopK(queries, Similarity.pqEncode(emb, cb), cb, k = 5)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"), s"query LUTs not broadcast:\n$p")
    // the only exchange is the final per-query rank window
    assert(exchanges(df) == 1, s"codes side shuffled pre-rank:\n$p")
  }

  test("verifyEditSimilarity: candidate-bounded — equi-joins only, never a pairwise text blow-up") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1L).as("id_b"))
    val df = Dedup.verifyEditSimilarity(pairs, docs, threshold = 0.25, maxChars = 256)
    val p = plan(df)
    // the DP cost lives in a projection over candidate rows; the joins
    // that feed it must stay id-keyed equi-joins
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise blow-up:\n${p.take(2000)}")
    assert(p.contains("levenshtein"), "verification must ride the codegen'd builtin")
    val tok = Dedup.verifyTokenEditSimilarity(pairs, docs, threshold = 0.25, maxTokens = 64)
    val pt = plan(tok)
    assert(!pt.contains("CartesianProduct") && !pt.contains("BroadcastNestedLoopJoin"),
      s"pairwise blow-up (token):\n${pt.take(2000)}")
    assert(pt.toLowerCase.contains("tokenedit"), "token verify must ride the native DP")
    // the barrier must have held: the DP may never sink into a JOIN
    // condition (the serialized-verify regression this plan shape fixes —
    // the optimizer rewrote the threshold filters in terms of the DP and
    // hoisted them into the broadcast join at pre-spread parallelism).
    // Formatted details list one "(N) Operator" block per node; no
    // Join block may mention the DP expression.
    Seq(p -> "levenshtein", pt -> "tokenedit").foreach { case (pl, name) =>
      assert(pl.contains("RoundRobinPartitioning"),
        s"explicit spread exchange missing from the $name plan")
      val joinBlocks = pl.split("(?m)^\\(\\d+\\) ").filter(_.takeWhile(_ != '\n').contains("Join"))
      assert(joinBlocks.nonEmpty, s"no join detail blocks found in the $name plan")
      joinBlocks.foreach { b =>
        assert(!b.toLowerCase.contains(name),
          s"$name DP sunk into a join condition — barrier failed:\n${b.take(500)}")
      }
    }
  }

  test("pipeline_full_prep: equi-joins only, persisted multi-consumer boundaries") {
    val df = SparkEntry.queries("pipeline_full_prep")(spark, dir)
    val p = plan(df)
    // eight chained stages with derive-then-join-back shapes must never
    // degrade to a cartesian — every stage joins on doc_id or a gram key
    assert(!p.contains("CartesianProduct"), s"cartesian in the composed DAG:\n$p")
    // the multi-consumer boundaries are cached: without them Catalyst
    // re-executes the upstream chain once per branch (15 s → 4 s at sf0.1)
    assert(p.contains("InMemoryRelation"),
      "composed DAG lost its persisted stage boundaries")
    Dedup.releaseCaches(spark)
  }

  test("curriculumOrder: the only unpartitioned window runs over the (stage, bucket) offsets") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    val sp = Pipeline.curriculumOrder(Tables.documents(spark, dir),
        when(col("n_chars") < 225, 0).when(col("n_chars") < 390, 1).otherwise(2))
      .queryExecution.sparkPlan
    val windows = sp.collect { case w: WindowExec => w }
    val (unpart, part) = windows.partition(_.partitionSpec.isEmpty)
    assert(part.nonEmpty, "expected the (stage, bucket)-partitioned rank window")
    assert(unpart.size == 1, s"expected exactly one unpartitioned window, got ${unpart.size}")
    val grouped = unpart.head.collectFirst {
      case a: HashAggregateExec if a.groupingExpressions.nonEmpty       => a
      case a: ObjectHashAggregateExec if a.groupingExpressions.nonEmpty => a
      case a: SortAggregateExec if a.groupingExpressions.nonEmpty       => a
    }
    assert(grouped.isDefined,
      s"unpartitioned window runs over an unaggregated input:\n${unpart.head}")
  }

  test("urlDedup: ONE fp-keyed exchange — keeper and group size share the partitioning") {
    import spark.implicits._
    val docs = Seq((1L, "https://a.com/x", 10L)).toDF("doc_id", "url", "n_chars")
    val df = Dedup.urlDedup(docs)
    // two window specs (ordered first_value, unordered count) over the
    // same xxhash64(canon_url) partitioning must plan a single Exchange —
    // a second one means the specs diverged and the corpus shuffles twice
    assert(exchanges(df) == 1, s"urlDedup shuffles more than once:\n${plan(df)}")
    // the shuffle key is the 8-byte fingerprint, not the URL string
    val exchangeLine = plan(df).linesIterator
      .find(_.contains("Arguments: hashpartitioning")).getOrElse("")
    assert(exchangeLine.contains("fp"), s"exchange not fp-keyed: $exchangeLine")
  }

  test("hardNegatives: query side broadcasts; corpus is never shuffled pre-rank") {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val df = Similarity.hardNegatives(queries, emb, k = 5)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"), s"queries not broadcast:\n$p")
    // only the final per-query rank window shuffles — the band filter is
    // applied in the scan stage, before any exchange
    assert(exchanges(df) == 1, s"corpus shuffled pre-rank:\n$p")
  }

  test("bpeVocabHist: histogram is partial-aggregated before its exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "low low")).toDF("doc_id", "text")
    val df = TextAnalysis.bpeVocabHist(docs, Seq(("l", "o"), ("lo", "w")))
    val p = plan(df)
    // map-side combine on (piece, doc_id) then piece — a missing partial
    // phase would shuffle one row per corpus TOKEN unreduced
    assert(p.contains("partial_count"), s"no map-side partial aggregation:\n$p")
  }

  test("lineDedupIncremental: store probe is a left-anti fp join, claims partial-aggregate") {
    import spark.implicits._
    val store = Seq((1L, 1L)).toDF("fp", "keep_okey")
    val batch = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val (cleaned, novel, _) = Dedup.lineDedupIncremental(batch, store)
    val np = plan(novel)
    assert(np.contains("LeftAnti"), s"store probe is not an anti join:\n$np")
    // batch-first claim is a partial-agg'd min over the packed okey —
    // the lineDedup rule; a window here would single-partition the lines
    assert(np.contains("partial_min"), s"no map-side first-claim partial:\n$np")
    assert(!plan(cleaned).contains("CartesianProduct"))
    Dedup.releaseCaches(spark)
  }

  test("bm25TopK: tiny df/stats relations broadcast; global top-k is TakeOrderedAndProject") {
    val p = plan(TextAnalysis.bm25TopK(Tables.documents(spark, dir), Seq("spark", "join"), 10))
    assert(p.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$p")
    // df joins as a broadcast hash join, the single-row stats as a
    // broadcast nested-loop — the corpus-sized tf side never re-shuffles
    // for either
    assert(p.contains("BroadcastHashJoin"), s"df relation not broadcast:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"stats row not broadcast:\n$p")
  }

  test("bm25PerQuery: every join against the corpus flow is broadcast — no sort-merge anywhere") {
    import spark.implicits._
    val queries = Seq((0L, Seq("spark")), (1L, Seq("join", "scan"))).toDF("query_id", "terms")
    val p = plan(TextAnalysis.bm25PerQuery(Tables.documents(spark, dir), queries, 5))
    assert(!p.contains("SortMergeJoin"), s"a tiny relation shuffled the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab/df/qterms not broadcast:\n$p")
    // the removal variant anti-joins the ≤ queries·k hit ids broadcast
    val pd = plan(TextAnalysis.decontaminateByRetrieval(Tables.documents(spark, dir), queries, 5))
    assert(pd.contains("LeftAnti") && !pd.contains("SortMergeJoin"),
      s"hit-id removal shuffles the corpus:\n$pd")
  }

  test("clusterCapSample: literal-centroid assignment is join-free — the only exchange is the cap window") {
    import spark.implicits._
    val emb = Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f)).toDF("vec_id", "embedding")
    val df = Pipeline.clusterCapSample(emb, Array(Array(1f, 0f), Array(0f, 1f)), 5)
    val p = plan(df)
    assert(!p.contains("Join"), s"assignment joins instead of literal arithmetic:\n$p")
    assert(exchanges(df) == 1, s"expected exactly the window exchange:\n$p")
  }

  test("domainQuality: map-side signals, one partial-aggregated rollup exchange, no self-join") {
    val urlDocs = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
      concat(lit("https://"), col("source"), lit(".example.com/p")).as("url"))
    val df = TextAnalysis.domainQuality(urlDocs)
    val p = plan(df)
    assert(!p.contains("Join"), s"gate verdicts joined back instead of inlined:\n$p")
    assert(exchanges(df) == 1, s"expected one rollup exchange:\n$p")
    assert(p.contains("partial_count"), s"no map-side partial aggregation:\n$p")
  }

  test("videoNearDup: the clip signature is the ONE-PASS native expression — no per-frame decode surfaces in the plan") {
    // the HOF composition (aviMjpegFrames → transform(jpegDecodeLuma →
    // dHash)) re-evaluates its whole CodegenFallback subtree once per
    // signature REFERENCE (null scrub, each band key, verify payload) and
    // re-walks the container per lambda element — measured ~100 walks and
    // ~36 decodes per row before MjpegClipSig replaced it. This pin makes
    // that recomposition unrepresentable: the decode must appear ONLY
    // inside the native clip-sig expression, never as a standalone
    // jpeg-decode node the optimizer can duplicate.
    val clips = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("avi"))
    val p = plan(Multimodal.videoNearDup(clips, 72, 32, nSample = 2, maxHamming = 1))
      .toLowerCase
    assert(p.contains("mjpegclipsig") || p.contains("graft_mjpeg_clip_sig"),
      s"clip signature is not the native one-pass expression:\n$p")
    assert(!p.contains("jpeglumadecode") && !p.contains("avimjpegframes"),
      s"standalone walk/decode nodes in the near-dup plan — the HOF recomposition regression:\n$p")
  }

  test("modality decode tiers are map-side: WAV stats/gate and the AVI frame walk plan zero shuffles") {
    val clips = Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("wav"))
    assert(exchanges(Multimodal.audioQualityGate(clips)) == 0)
    val avis = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("avi"))
    assert(exchanges(avis.select(
      Multimodal.mjpegClipSig(col("avi"), 72, 32, 2),
      size(Multimodal.aviMjpegFrames(col("avi"))))) == 0)
    assert(exchanges(avis.select(
      Multimodal.jpegDecodeLuma(col("avi")),
      Multimodal.wavPcm16Stats(col("avi")))) == 0)
  }
}
