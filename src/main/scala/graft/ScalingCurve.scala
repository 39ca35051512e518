package graft

import org.apache.spark.sql.SparkSession

/** Scaling-curve gate: runs the heaviest queries at sf0.001 / sf0.01 /
  * sf0.1 and fits the log-log growth exponent, so superlinear operators
  * can't hide behind a single-scale benchmark. All correctness and perf
  * evidence elsewhere is at one scale factor; the bar is "would this plan
  * survive 100×", and the growth exponent across two decades of data is
  * the closest measurable proxy this box offers: an operator whose cost is
  * ~linear in input shows exponent ≈ 1 between the two largest scales; a
  * pair-explosion (candidate join past its blocking), an accidental
  * O(n²) window, or a driver-side collect that grows with the corpus all
  * push it toward 2.
  *
  * Two exponents are reported per query:
  *   - `exp_fit`: least-squares slope of log(t) over log(sf) on all three
  *     points — robust, but biased LOW by the fixed per-job overhead
  *     (~0.1 s scheduler/codegen floor dominates sf0.001);
  *   - `exp_big`: the sf0.01 → sf0.1 pairwise slope — the decision value,
  *     because the largest decade is where real work dominates overhead.
  * The gate flags `exp_big >= FlagExponent` (1.3: a 100×-scale-up of a
  * 1.3-exponent operator is 10^(2·0.3) ≈ 4× worse than linear — past the
  * 2×-of-baseline perf budget).
  *
  * Self-defense mirrors [[Bench]]: median of reps, ambient loadavg
  * recorded, and the canary bracket stamps `contaminated` so a loaded box
  * can't fabricate (or mask) a superlinear verdict.
  *
  * Output: ONE JSON line on stdout AND `SCALING.json` in the cwd.
  */
object ScalingCurve {

  /** The heaviest queries by r7 bench cost, plus the ones whose SHAPE could
    * hide superlinearity even when cheap today: candidate-pair stages
    * (minhash/ngram/simhash/embedding near-dup), window-based spans/lines,
    * multi-query BM25 (postings × queries), and the composed prep DAG. */
  private[graft] val Targets: Seq[String] = Seq(
    "pipeline_full_prep",
    "dedup_spans",
    "dedup_remove_spans",
    "dedup_lines",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_components",
    "dedup_keep_best",
    "dedup_semantic",
    "text_heavy_hitters",
    "text_bm25_multi",
    "text_backoff_lm",
    "decontaminate_bloom",
    "decontaminate_neardup",
    "source_overlap",
    // text_train_score left the curve in r13: its train set is now the
    // SF-independent committed plant (constant cost by construction);
    // the corpus-scale bounded-training contract is pinned by spec
    "dedup_image",
    "json_rekey_count",
    "c4_clean",
    // round-8 additions: the incremental index builds (full append+probe
    // cost per invocation — a write-path regression shows up here), the
    // real-PNG decode composition, and the pair-shaped EditSim verify
    "sim_topk_ivf_incr",
    "sim_topk_ivfpq_incr",
    "dedup_image_png",
    "dedup_editsim",
    "dedup_editsim_tok",
    // round-9 additions: the three new modality near-dup compositions —
    // each is map-side decode (entropy-coded for JPEG/AVI) into the shared
    // banded LSH, so the expected shape is scan-bound ~linear; anything
    // superlinear means the candidate join or a plant degenerated
    "dedup_image_jpeg_color",
    "dedup_audio",
    "dedup_video",
    // round-10/11 additions: the MP4 sample-table walk rides the same
    // fused map-side signature (expect the dedup_video exponent); the
    // retraction queries carry the full store build+retract+compact+read
    // cycle (expect ~the incremental-index exponents — anything
    // superlinear means a store read degenerated into a corpus rescan);
    // the capped EditSim curve is THE point of maxPairsPerDoc — per-doc
    // DP cost is bounded, so the curve must stay scan-shaped where the
    // uncapped hub-heavy worst case would bend up
    "dedup_video_mp4",
    "multimodal_mp4_frames",
    "dedup_editsim_cap",
    "store_retract",
    "sim_topk_ivf_retract",
    // the WebP near-dup tier: VP8L decode is map-side like PNG/JPEG —
    // expect the dedup_image_png exponent
    "dedup_image_webp",
    // round-12 additions: the GIF near-dup tier (map-side LZW decode —
    // expect the dedup_image_webp exponent) and the sidecar-predicate
    // takedown cycle (a store protocol cycle like store_retract, plus
    // one shard⋈attrs join — superlinearity would mean the predicate
    // scan degenerated)
    "dedup_image_gif",
    "dedup_image_bmp",
    "dedup_image_tiff",
    "store_retract_attrs",
    // round-13 additions: the palette/Adam7 PNG near-dup tier (map-side
    // PLTE expand + deinterlace — expect the dedup_image_png exponent)
    // and the progressive-JPEG tier (map-side multi-scan Annex-G decode
    // — expect the dedup_image_jpeg exponent)
    "dedup_image_png_palette",
    "dedup_image_jpeg_prog",
    // and the FLAC audio near-dup tier (map-side frame decode →
    // envelope — expect the dedup_audio exponent)
    "dedup_audio_flac",
    // the extended-profile WAV tier: cross-profile near-dup (float32 vs
    // pcm24 canonicalization, map-side — expect the dedup_audio
    // exponent) and the IMA-ADPCM decode (per-nibble step-table walk,
    // map-side — scan-shaped like the other decode queries)
    "dedup_audio_wavx",
    "multimodal_decode_adpcm",
    // round-14 additions: the CCITT G4 near-dup tier (map-side T.6 MMR
    // decode → dHash — expect the dedup_image_tiff exponent), the
    // G4 + JPEG-in-TIFF decode query (scan-shaped, five decodes per
    // row), and the MS-ADPCM decode (per-nibble coefficient walk,
    // map-side — expect the multimodal_decode_adpcm exponent)
    "dedup_image_tiff_g4",
    "multimodal_decode_tiff_ccitt",
    "multimodal_decode_msadpcm",
    // round-15 additions: the lossy-VP8 tiers (map-side RFC 6386
    // keyframe decode — the decode query is scan-shaped; the dedup
    // query adds one digest shuffle + an equi-join, expect the
    // dedup_exact shape) and the 12-bit JPEG decode (the sequential
    // core at wide samples — expect the multimodal-decode scan shape)
    "multimodal_decode_vp8",
    "dedup_image_vp8",
    "multimodal_decode_jpeg12",
    // round-16 additions: the Layer III tiers (map-side fixture encode +
    // full decode — scan-shaped like every decode query; the dedup query
    // adds one digest shuffle + equi-join, expect the dedup_image_vp8
    // shape) and the HEIF/AVIF census (a bounded meta-box walk per
    // payload — the cheapest decode-family shape in the suite)
    "multimodal_decode_mp3",
    "dedup_audio_mp3",
    "multimodal_avif_meta")

  private[graft] val FlagExponent = 1.3

  /** Least-squares slope of y over x. */
  private[graft] def slope(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.length.toDouble
    val mx = xs.sum / n
    val my = ys.sum / n
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = xs.map(x => (x - mx) * (x - mx)).sum
    num / den
  }

  private def loadavg1(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val sfs = Seq(0.001, 0.01, 0.1)
    // the FOURTH decade: a synthesized sf1-equivalent ([[SynthScale]] —
    // ×10 replicas of sf0.1 with honest cardinality scaling), picked up
    // automatically when present. Two decades top out at ~600k rows,
    // inside memory-cache scale; the fourth point is where pair
    // explosions and accidental O(n²) windows that hide behind cache
    // warmth first become measurable.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "synthdata/sf1")
    val sf1Present = new java.io.File(s"$sf1Dir/documents.parquet").exists()
    val dirs = sfs.map(sf => sf -> s"$base/sf$sf") ++
      (if (sf1Present) Seq(1.0 -> sf1Dir) else Nil)
    if (!sf1Present)
      System.err.println(s"[scaling] no sf1 synth corpus at $sf1Dir — " +
        "3-point fit (run graft.SynthScale to add the fourth decade)")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val ambient = loadavg1()
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // builder-side fast iteration (mirrors SPARK_GRAFT_BENCH_ONLY): the
    // driver never sets this, so its per-round curve stays complete
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_SCALING_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names.filterNot(Targets.contains)
      if (unknown.nonEmpty) {
        System.err.println(s"[scaling] unknown SPARK_GRAFT_SCALING_ONLY names: " +
          unknown.toSeq.sorted.mkString(", "))
        sys.exit(1)
      }
    }
    val targets = Targets.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n)))

    // warm-up at the largest scale (codegen + page cache), as in Bench
    targets.foreach { name =>
      try SparkEntry.queries(name)(spark, dirs.last._2)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()

    def measure(name: String, dir: String): Double = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      times(times.length / 2)
    }

    def canaryWith(q: SparkSession => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q(spark).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      times(times.length / 2)
    }
    def canary(): Double = canaryWith(Bench.canaryQuery)
    def bwCanary(): Double = canaryWith(Bench.bandwidthCanaryQuery)

    val canaryBefore = canary()
    val bwCanaryBefore = bwCanary()
    var failures = List.empty[String]
    val rows = targets.flatMap { name =>
      try {
        val ts = dirs.map { case (sf, dir) => sf -> measure(name, dir) }
        val lx = ts.map { case (sf, _) => math.log(sf) }
        val ly = ts.map { case (_, t) => math.log(t) }
        val expFit = slope(lx, ly)
        // the decision value: the pairwise slope over the LARGEST decade
        // available (sf0.1 → sf1 when the synth corpus exists)
        val n = lx.length
        val expBig = (ly(n - 1) - ly(n - 2)) / (lx(n - 1) - lx(n - 2))
        System.err.println(f"[scaling] $name: " +
          ts.map { case (sf, t) => f"sf$sf=$t%.3fs" }.mkString(" ") +
          f" exp_fit=$expFit%.2f exp_big=$expBig%.2f" +
          (if (expBig >= FlagExponent) "  ** FLAG **" else ""))
        Some((name, ts, expFit, expBig))
      } catch { case e: Throwable =>
        System.err.println(s"[scaling] $name FAILED: ${e.getMessage}")
        failures ::= name
        None
      }
    }
    val canaryAfter = canary()
    val bwCanaryAfter = bwCanary()
    val canarySec = math.max(canaryBefore, canaryAfter)
    val bwCanarySec = math.max(bwCanaryBefore, bwCanaryAfter)
    val contaminated = Bench.isRunContaminated(canarySec, bwCanarySec, ambient)

    def fmt(d: Double) = f"$d%.4f"
    val qjson = rows.map { case (name, ts, expFit, expBig) =>
      val tj = ts.map { case (sf, t) => "\"sf" + sf + "\":" + fmt(t) }.mkString(",")
      s""""$name":{$tj,"exp_fit":${fmt(expFit)},"exp_big":${fmt(expBig)},"flag":${expBig >= FlagExponent}}"""
    }.mkString("{", ",", "}")
    val flagged = rows.collect { case (n, _, _, e) if e >= FlagExponent => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"scaling","queries":$qjson,"flagged":$flagged,"flag_exponent":$FlagExponent,"points":${dirs.length},"reps":$reps,"ambient_load":${fmt(ambient)},"ambient_load_cap":${fmt(Bench.AmbientLoadCap)},"canary_sec":${fmt(canarySec)},"canary_floor":${fmt(Bench.CanaryFloorSec)},"canary_bw_sec":${fmt(bwCanarySec)},"canary_bw_floor":${fmt(Bench.BandwidthCanaryFloorSec)},"contaminated":$contaminated,"failed":${failures.size}}"""
    println(json)
    // subset runs must not clobber the committed full curve: when
    // SPARK_GRAFT_SCALING_ONLY is set and no explicit output path is
    // given, default to SCALING.partial.json instead of SCALING.json —
    // before this, a forgotten SPARK_GRAFT_SCALING_JSON silently
    // overwrote the full 39-target curve with a 2-target one
    val defaultOut = if (only.isDefined) "SCALING.partial.json" else "SCALING.json"
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALING_JSON", defaultOut))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
