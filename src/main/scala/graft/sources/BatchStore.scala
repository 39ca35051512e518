package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The append-only batch-store protocol shared by the incremental corpus
  * store (`graft.apps.CorpusPrep`) and the incremental ANN index
  * (`graft.operators.Similarity.appendIvfIndex`): one directory per
  * ingested batch under `<root>/batches/`, an empty `_COMMIT` marker
  * written LAST, readers union only committed directories. Atomicity
  * without a transaction log:
  *
  *  - batch ids are deterministic content hashes, so a crash between
  *    relation writes leaves an uncommitted directory that (a) no reader
  *    ever sees and (b) a retry of the same batch OVERWRITES in place
  *    before committing — replay of a committed batch is a detectable
  *    no-op;
  *  - compaction SUPERSEDES rather than re-orders: the compacted
  *    directory records its source directory names in a
  *    `_COMPACTED_FROM` manifest written before its own `_COMMIT`, and
  *    [[committedDirs]] skips any committed directory named by another
  *    committed directory's manifest — the single `_COMMIT` create
  *    atomically swaps N sources for their union, and deleting sources
  *    afterwards is mere garbage collection;
  *  - single-writer by design (an append-only ingest log); concurrent
  *    ingests would need an external lock;
  *  - RETRACTION is a first-class batch kind, not an in-place delete
  *    ([[appendTombstones]]): a takedown/robots-revocation lands as a
  *    committed `t_<hash>_<n>` directory whose single `tomb` relation
  *    lists the retracted ids. Readers anti-join committed tombstones
  *    (id-sized, so the filter is a broadcast at any corpus size);
  *    compaction physically drops the retracted rows AND consumes the
  *    tombstone directories (deleted outright rather than superseded —
  *    a crash between the compacted commit and the tombstone GC leaves
  *    them active, which merely re-filters ids that are already
  *    physically absent). Because tombstone directory names are content
  *    hashes, re-retracting an id set that a compaction already consumed
  *    is a replay no-op UNTIL new data for those ids arrives — at which
  *    point the same ids in a new retraction batch get a fresh commit
  *    and filter again.
  */
object BatchStore {

  /** Fold a decimal(38,0) per-row-hash SUM back to 64 bits (two's-
    * complement wrap). Batch content ids combine per-row xxhash64 values
    * with a wrapping SUM, not bit_xor — xor cancels rows repeated an even
    * number of times, so two different all-doubled batches would collide
    * on 0 and the later append would be silently dropped as a replay.
    * The sum runs as decimal(38,0) because ANSI mode makes a BIGINT sum
    * throw on overflow; BigInteger.longValue keeps the low 64 bits. */
  def wrap64(d: java.math.BigDecimal): Long = d.toBigInteger.longValue

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Committed, non-superseded batch directories under `root/batches` —
    * the only state any store reader sees. */
  def committedDirs(spark: SparkSession, root: String): Seq[String] = {
    val (fs, batchesPath) = hadoopFs(spark, s"$root/batches")
    if (!fs.exists(batchesPath)) return Seq.empty
    val committed = fs.listStatus(batchesPath).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_COMMIT")))
      .map(_.getPath)
    val superseded: Set[String] = committed.flatMap { p =>
      val m = new org.apache.hadoop.fs.Path(p, "_COMPACTED_FROM")
      if (fs.exists(m)) {
        val in = fs.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      } else Nil
    }.toSet
    committed.filterNot(p => superseded.contains(p.getName)).map(_.toString)
  }

  /** True iff `dir` already carries a `_COMMIT` marker (replay detection). */
  def isCommitted(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = hadoopFs(spark, s"$dir/_COMMIT")
    fs.exists(p)
  }

  /** Write the empty `_COMMIT` marker — the LAST write of any batch. */
  def commit(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = hadoopFs(spark, s"$dir/_COMMIT")
    fs.create(p, true).close()
  }

  /** Write the `_COMPACTED_FROM` supersession manifest (source directory
    * NAMES, one per line) — before the compacted directory's `_COMMIT`. */
  def writeSupersedes(spark: SparkSession, dir: String, sourceNames: Seq[String]): Unit = {
    val (fs, p) = hadoopFs(spark, s"$dir/_COMPACTED_FROM")
    val out = fs.create(p, true)
    try out.write((sourceNames.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Union-read relation `name` across the given batch dirs with an
    * explicit schema; empty DataFrame when no dir carries it. */
  def readRelation(spark: SparkSession, dirs: Seq[String],
      name: String, ddl: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val paths = dirs.map(d => s"$d/$name").filter { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(hconf).exists(path)
    }
    if (paths.nonEmpty) spark.read.schema(ddl).parquet(paths: _*)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
  }

  /** Run independent store-relation writes as CONCURRENT Spark jobs from
    * a bounded driver-side pool (optimization guide §2.6: actions are only
    * sequential because driver code calls them sequentially; overlapping
    * independent jobs lets the next job's tasks back-fill executors the
    * current job's tail leaves idle). Each thunk must target its OWN
    * directory — the session is the only shared state, and Spark's
    * scheduler is multi-thread-safe by design. Blocks until ALL thunks
    * finish; the FIRST failure is rethrown (after the others complete, so
    * a caller's crash-retry sees a stable directory state), which keeps
    * every caller's write-then-`_COMMIT` ordering intact. */
  def runConcurrently(writes: Seq[() => Unit]): Unit = {
    if (writes.isEmpty) return
    if (writes.length == 1) { writes.head(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(writes.length, 4))
    try {
      import scala.jdk.CollectionConverters._
      val futures = pool.invokeAll(
        writes.map(w => new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = w()
        }).asJava)
      // invokeAll waits for completion; surface the first failure
      futures.asScala.foreach(_.get())
    } finally pool.shutdown()
  }

  /** Delete directories (compaction garbage collection). */
  def delete(spark: SparkSession, dirs: Seq[String]): Unit =
    dirs.foreach { d =>
      val (fs, p) = hadoopFs(spark, d)
      fs.delete(p, true)
    }

  /** True iff `dir` carries relation `name` (a parquet directory). */
  def hasRelation(spark: SparkSession, dir: String, name: String): Boolean = {
    val (fs, p) = hadoopFs(spark, s"$dir/$name")
    fs.exists(p)
  }

  /** The dirs among `dirs` carrying relation `name` — the split every
    * tombstone-aware reader needs (a retraction batch has `tomb` and
    * nothing else, so a blind multi-dir parquet read would fail on it). */
  def dirsWithRelation(spark: SparkSession, dirs: Seq[String], name: String): Seq[String] =
    dirs.filter(hasRelation(spark, _, name))

  /** Append a RETRACTION batch: `ids` (one BIGINT column, any name —
    * doc_id, vec_id) lands distinct as the `tomb` relation of a committed
    * `t_<contenthash>_<n>` directory. Same atomicity story as data
    * batches: deterministic content-hash name (a crashed partial write is
    * invisible and the retry overwrites it in place), `_COMMIT` written
    * last, replay of a committed retraction returns false and writes
    * nothing. Returns false for an empty id set too (an empty committed
    * directory would fail readers' schema inference).
    *
    * What retraction MEANS is the store owner's contract; the protocol
    * only promises: readers that anti-join [[readTombstones]] never see a
    * retracted id, and a compaction that consumes the tombstones makes
    * the absence physical. */
  def appendTombstones(spark: SparkSession, root: String, ids: DataFrame): Boolean = {
    require(ids.columns.length == 1,
      s"appendTombstones: one id column expected, got ${ids.columns.mkString(", ")}")
    import org.apache.spark.sql.functions._
    val norm = ids.select(ids.col(ids.columns.head).cast("bigint").as("id")).distinct()
    // order-independent content hash (the wrapping-SUM stance of the data
    // batches — see wrap64); over the DISTINCT set, so logically-equal
    // retractions land on one directory regardless of input duplication
    val idRow = norm
      .agg(coalesce(sum(expr("xxhash64(id)").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)), count(lit(1)))
      .collect()(0)
    if (idRow.getLong(1) == 0L) return false
    val dir = f"$root/batches/t_${wrap64(idRow.getDecimal(0))}%016x_${idRow.getLong(1)}"
    if (isCommitted(spark, dir)) return false
    norm.write.mode("overwrite").parquet(s"$dir/tomb")
    commit(spark, dir)
    true
  }

  /** All committed retracted ids under `root` (column `id` BIGINT; empty
    * when no tombstone batch exists). Distinct by construction per batch;
    * readers anti-join, so cross-batch repeats are harmless.
    *
    * Carries an explicit `broadcast()` hint: the retraction contract is
    * that readers anti-join an ID-SIZED relation into corpus-sized scans,
    * and that plan must be STRUCTURAL, not an artifact of
    * `autoBroadcastJoinThreshold`'s size estimate — a takedown set past
    * the ~10 MB default would otherwise silently degrade every reader to
    * sort-merge-joining the corpus. The hint's own bound is executor
    * memory: a tombstone set is 8 bytes/id, so even 100M retracted ids
    * broadcast in ~800 MB — past THAT, compact the store (which consumes
    * the tombstones) rather than carrying a corpus-sized takedown. */
  def readTombstones(spark: SparkSession, root: String): DataFrame =
    org.apache.spark.sql.functions.broadcast(
      readRelation(spark, committedDirs(spark, root), "tomb", "id BIGINT"))
}
