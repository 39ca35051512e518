package graft

import graft.functions.Funcs
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5.4): each law is checked over a seeded
  * scalacheck-generated dataset evaluated in ONE Spark job (a per-case job
  * would be 100× slower for the same coverage). Seeds are fixed so runs
  * are deterministic.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): List[T] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val epoch2025 = 1735689600L // 2025-01-01 00:00:00 UTC, seconds

  test("tumbling law: every event lands in exactly one 1-min bucket, aligned to its own minute") {
    val ts = sample(Gen.chooseNum(0L, 365L * 24 * 3600), 500, 1L)
      .map(s => new java.sql.Timestamp((epoch2025 + s) * 1000))
    val df = ts.toDF("ts")
    val assigned = df.select($"ts", window($"ts", "1 minute").as("w"))
    // exactly one window per event (window() is scalar) with the event inside it
    assert(assigned.filter(!($"ts" >= $"w.start" && $"ts" < $"w.end")).isEmpty)
    // alignment: start == floor to minute; width == 1 min
    assert(assigned.filter($"w.start" =!= date_trunc("minute", $"ts")).isEmpty)
    assert(assigned.filter(unix_timestamp($"w.end") - unix_timestamp($"w.start") =!= 60).isEmpty)
  }

  test("sliding pair law: an event is counted in another's forward window iff 0 ≤ Δt < size") {
    // adversarial timestamps: clustered with duplicates and boundary gaps
    // (exactly size apart must NOT co-window: the frame is [t, t+size))
    val size = 300L // 5 min in seconds
    val gen = for {
      key <- Gen.oneOf("a", "b")
      base <- Gen.chooseNum(0L, 3600L)
      jitter <- Gen.oneOf(0L, 1L, size - 1, size, size + 1)
    } yield (key, new java.sql.Timestamp((epoch2025 + base + jitter) * 1000))
    val ev = sample(gen, 300, 2L).toDF("user_id", "ts")
      .select($"user_id", $"ts") // slidingCount keys on user_id
    val got = operators.Relational.slidingCount(
      ev.withColumn("user_id", $"user_id"), sizeMinutes = 5)
    val a = ev.select($"user_id".cast("string").as("key"), $"ts")
    // anchors deduped: duplicate events anchor the SAME window once, but
    // still count as members of every window covering them (right side)
    val oracle = a.dropDuplicates("key", "ts").join(
        a.select($"key".as("k2"), $"ts".as("ts2")),
        $"key" === $"k2" && $"ts2" >= $"ts" && $"ts2" < $"ts" + expr(s"INTERVAL $size SECONDS"))
      .groupBy($"key", $"ts").agg(count(lit(1)).as("cnt"))
    val mismatch = got.withColumnRenamed("window_start", "ts")
      .join(oracle, Seq("key", "ts"), "full_outer")
      .filter(got("cnt") =!= oracle("cnt") || got("cnt").isNull || oracle("cnt").isNull)
    assert(mismatch.isEmpty)
  }

  test("UNKNOWN-fallback totality: any value string yields a non-null key") {
    val junk = sample(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.alphaNumStr.map(s => s"""{"order_id":"$s"}"""),
      Gen.const("""{"order_id": null}"""),
      Gen.const(""), Gen.const("{"), Gen.const("[1,2,3]"),
      Gen.listOf(Gen.oneOf("∀", "💥", "\\", "\"", "\n", "{", "}")).map(_.mkString)), 400, 3L)
    val df = junk.toDF("v")
    assert(df.select(Funcs.jsonKeyOrUnknown($"v", "$.order_id").as("k"))
      .filter($"k".isNull).isEmpty)
  }

  test("timestamp parse-chain totality: arbitrary strings never null out given a fallback") {
    val fallback = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    val raw = sample(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.chooseNum(-3_000_000_000_000L, 3_000_000_000_000L).map(_.toString),
      Gen.chooseNum(1970, 2100).map(y => f"$y%04d-07-15"),
      Gen.const("2025-13-45"),                 // invalid date
      Gen.const("99999999999999999999999999"), // overflows BIGINT cast
      Gen.const("")), 400, 4L)
    val df = raw.toDF("raw")
    assert(df.select(Funcs.eventTimeChain($"raw", lit(fallback)).as("ts"))
      .filter($"ts".isNull).isEmpty)
  }

  test("count additivity: per-key counts are invariant under arbitrary stream splitting") {
    val gen = for (k <- Gen.chooseNum(0, 30)) yield k.toString
    val keys = sample(gen, 1000, 5L).toDF("key")
    val whole = keys.groupBy($"key").agg(count(lit(1)).as("cnt"))
    // split by a hash coin-flip (any partition of the rows must do)
    val partA = keys.filter(xxhash64($"key", monotonically_increasing_id()) % 2 === 0)
    val partB = keys.exceptAll(partA)
    val merged = partA.groupBy($"key").agg(count(lit(1)).as("ca"))
      .join(partB.groupBy($"key").agg(count(lit(1)).as("cb")), Seq("key"), "full_outer")
      .select($"key", (coalesce($"ca", lit(0L)) + coalesce($"cb", lit(0L))).as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("winnow guarantee: docs sharing ≥ w+k−1 consecutive tokens always share a fingerprint") {
    val k = 4; val w = 4
    val gen = for {
      sharedLen <- Gen.chooseNum(k + w - 1, 20)
      shared <- Gen.listOfN(sharedLen, Gen.chooseNum(0, 50).map(i => s"s$i"))
      pre <- Gen.listOfN(5, Gen.chooseNum(0, 50).map(i => s"p$i"))
      post <- Gen.listOfN(5, Gen.chooseNum(0, 50).map(i => s"q$i"))
    } yield ((pre ++ shared).mkString(" "), (shared ++ post).mkString(" "))
    val pairs = sample(gen, 50, 6L).toDF("ta", "tb")
    def fp(c: org.apache.spark.sql.Column) =
      graft.functions.Native.winnow(
        Funcs.shingleHashes(Funcs.wordShingles(Funcs.tokens(c), k)), w)
    assert(pairs.select(size(array_intersect(fp($"ta"), fp($"tb"))).as("common"))
      .filter($"common" < 1).isEmpty)
  }

  test("normalizeText idempotence: normalizing an already-normal text is the identity") {
    val gen = Gen.listOfN(12, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("\t", "\n", "\r", "  ", " ", "", "UPPER", "MiXeD")))
      .map(_.mkString(""))
    val docs = sample(gen, 300, 9L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = graft.operators.TextAnalysis.normalizeText(docs)
      .select($"doc_id", $"text_norm".as("text"))
    val twice = graft.operators.TextAnalysis.normalizeText(once)
      .select($"doc_id", $"text_norm".as("text"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("incremental dedup law: id-ordered batches replayed through the store ≡ one-shot exact dedup") {
    val gen = Gen.oneOf(Gen.oneOf("alpha", "beta", "gamma", "delta"), // forced collisions
      Gen.alphaNumStr.map(s => s"u$s"))
    val texts = sample(gen, 200, 10L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val all = texts.toDF("doc_id", "text")
    // batches split by id so "first occurrence" agrees between the two paths
    val (b1, b2) = texts.partition(_._1 < 100L)
    val empty = Seq.empty[(String, Long)].toDF("fp", "keep_id")
    val (k1, store1) = graft.operators.Dedup.exactIncremental(b1.toDF("doc_id", "text"), empty)
    val (k2, _) = graft.operators.Dedup.exactIncremental(b2.toDF("doc_id", "text"), store1)
    val incremental = k1.select($"keep_id").union(k2.select($"keep_id"))
    val oneShot = graft.operators.Dedup.exact(all).select($"keep_id")
    assert(incremental.except(oneShot).isEmpty && oneShot.except(incremental).isEmpty)
  }

  test("duplicatedSpans law: distributed gaps-and-islands ≡ brute-force interval merge on random corpora") {
    val n = 3
    // tiny vocabulary forces heavy in-doc and cross-doc gram repeats;
    // lengths below n exercise the whole-doc-shingle branch
    val docGen = Gen.chooseNum(1, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    val docs = sample(docGen, 120, 11L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), n)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // brute force: string grams, exact frequency, linear interval merge
    val grams = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      val gs = if (toks.size >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      gs.zipWithIndex.map { case (g, i) => (id, i, g) }
    }
    val freq = grams.groupBy(_._3).view.mapValues(_.size).toMap
    docs.foreach { case (id, text) =>
      val nt = text.split(" ").length.toLong
      val dup = grams.collect { case (d, p, g) if d == id && freq(g) >= 2 => p.toLong }.sorted
      var regions = 0L; var cov = 0L; var curStart = -1L; var curEnd = -1L
      dup.foreach { p =>
        val e = math.min(p + n, nt)
        if (curEnd < 0 || p > curEnd) {
          if (curEnd >= 0) cov += curEnd - curStart
          regions += 1; curStart = p; curEnd = e
        } else curEnd = math.max(curEnd, e)
      }
      if (curEnd >= 0) cov += curEnd - curStart
      assert(got(id) == ((nt, dup.size.toLong, regions, cov)),
        s"doc $id: got ${got(id)}, brute ${(nt, dup.size, regions, cov)} for '$text'")
    }
  }

  test("crossNearDup symmetry law: swap(cross(A,B)) ≡ cross(B,A) on cold buckets") {
    // random small-vocab corpora with heavy overlap so the verified pair
    // set is non-trivial; cap high enough that no bucket trips the
    // (asymmetric, documented) representative guard
    val docGen = Gen.chooseNum(4, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.mkString(" ")))
    val a = sample(docGen, 60, 21L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // B = independent corpus PLUS edited copies of A's first docs, so the
    // verified cross-pair set is guaranteed non-trivial
    val b = sample(docGen, 40, 22L).zipWithIndex.map { case (t, i) => (1000L + i, t) } ++
      a.take(20).map { case (i, t) => (2000L + i, t + " q") }
    val ab = graft.operators.Dedup.crossNearDup(
      a.toDF("doc_id", "text"), b.toDF("doc_id", "text"),
      threshold = 0.4, maxBucketSize = 10000)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ba = graft.operators.Dedup.crossNearDup(
      b.toDF("doc_id", "text"), a.toDF("doc_id", "text"),
      threshold = 0.4, maxBucketSize = 10000)
      .select($"id_b", $"id_a").as[(Long, Long)].collect().toSet
    assert(ab.nonEmpty, "fixture produced no pairs — law checked vacuously")
    assert(ab == ba)
  }

  test("bigramSurprisal invariants: mean ≤ max, n_bigrams = n_tokens − 1, all-unique-transitions doc scores ln(pcnt)") {
    val docGen = Gen.chooseNum(2, 15).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val docs = sample(docGen, 100, 23L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.TextAnalysis.bigramSurprisal(docs.toDF("doc_id", "text"))
      .as[(Long, Double, Double, Long)].collect()
    assert(got.length == docs.size) // every ≥2-token doc present
    got.foreach { case (id, mean, mx, nb) =>
      assert(mean <= mx + 1e-9 && mean >= -1e-9, s"doc $id: mean $mean, max $mx")
      assert(nb == docs(id.toInt)._2.split(" ").length - 1L)
    }
  }

  test("per-source budget sampler law: two-phase bucketed selection ≡ naive cumsum with joined budgets, on random corpora") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(47)
    val docs = (0 until 400).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(20))("w" + rnd.nextInt(30)).mkString(" ")
      (i.toLong, words, "s" + rnd.nextInt(5))
    }.toDF("doc_id", "text", "source")
    // random budgets: some tiny (boundary inside the first bucket), some
    // past availability (keep-all), one source missing (dropped)
    val budgets = Seq(("s0", 7L), ("s1", 100L), ("s2", 100000L), ("s3", 0L))
      .toDF("source", "budget_tokens")
    val got = graft.operators.Pipeline.sampleToTokenBudgets(docs, budgets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs
      .select($"doc_id", $"source",
        size(graft.functions.Funcs.tokens($"text")).cast("bigint").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .join(budgets, Seq("source"))
      .filter($"cum_before" < $"budget_tokens")
      .select($"doc_id", $"source", $"n_tokens")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    graft.operators.Dedup.releaseCaches(spark)
  }

  test("WebP VP8L round-trip law: decode(encode(px)) luma ≡ exact-integer luma on random dims and channels") {
    // random geometry AND content, both color types, in one Spark job:
    // the encoder's spec-valid literal stream and the full decoder must
    // agree with the closed-form ITU-R 601 luma for EVERY byte
    val caseGen = for {
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 12)
      alpha <- Gen.oneOf(false, true)
      px <- Gen.listOfN(w * h * (if (alpha) 4 else 3), Gen.chooseNum(0, 255))
    } yield (w, alpha, px.map(_.toByte).toArray)
    val cases = sample(caseGen, 40, 77L).zipWithIndex
      .map { case ((w, a, px), i) => (i.toLong, w, a, px) }
    val rows = cases.map { case (i, w, a, px) => (i, w, a, px) }
      .toDF("id", "w", "alpha", "px")
    val got = rows
      .select($"id",
        when($"alpha",
          graft.operators.Multimodal.webpDecodeLuma(
            graft.operators.Multimodal.webpEncodeVp8l($"px", $"w", alpha = true)))
          .otherwise(
            graft.operators.Multimodal.webpDecodeLuma(
              graft.operators.Multimodal.webpEncodeVp8l($"px", $"w"))).as("luma"))
      .as[(Long, Array[Byte])].collect().toMap
    cases.foreach { case (i, w, a, px) =>
      val bpp = if (a) 4 else 3
      val expect = Array.tabulate(px.length / bpp) { j =>
        ((299 * (px(j * bpp) & 0xff) + 587 * (px(j * bpp + 1) & 0xff) +
          114 * (px(j * bpp + 2) & 0xff) + 500) / 1000).toByte
      }
      assert(got(i) != null && got(i).sameElements(expect),
        s"case $i (w=$w alpha=$a) diverged")
    }
  }

  test("linearQualityScore negation law: flipping the weights negates every logit") {
    val docGen = Gen.chooseNum(1, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("x", "y", "z", "w", "v")).map(_.mkString(" ")))
    val docs = sample(docGen, 80, 24L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w: Seq[Long] = (0 until 32).map(i => (i * 73L) % 201L - 100L)
    val pos = graft.operators.TextAnalysis.linearQualityScore(docs, w)
      .select($"doc_id", $"logit_milli").as[(Long, Long)].collect().toMap
    val neg = graft.operators.TextAnalysis.linearQualityScore(docs, w.map(-_))
      .select($"doc_id", $"logit_milli").as[(Long, Long)].collect().toMap
    assert(pos.keySet == neg.keySet)
    pos.foreach { case (id, l) => assert(neg(id) == -l) }
  }
}
