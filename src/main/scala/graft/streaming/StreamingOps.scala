package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming operators. The reference models its event stream as
  * weekly batch over date partitions (SURVEY.md §1.1 — no streaming); a
  * Spark-native engine gets true incremental processing from the same
  * DataFrame declarations: `readStream` → identical transforms →
  * `writeStream`. These helpers mirror the batch operators' semantics so a
  * pipeline can run either mode:
  *
  *  - [[windowedEventCounts]] ≈ zone_report's calendar bucketing, as
  *    watermarked tumbling windows (late data handled by the watermark
  *    instead of weekly full refresh).
  *  - [[sessionize]] ≈ WindowOps.sessionize, as arbitrary stateful
  *    processing (flatMapGroupsWithState) emitting CLOSED sessions
  *    incrementally.
  */
object StreamingOps {

  /** Tumbling-window counts per event_type with late-data watermark.
    * Works on either a batch or streaming DataFrame with (ts, event_type). */
  def windowedEventCounts(events: DataFrame, watermarkDelay: String,
                          windowDuration: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Incremental zone activity report — the reference's stage 3
    * (calculate_zone_report.py) as a streaming aggregation: tumbling
    * windows × zone × per-event-type conditional counts (streaming plans
    * don't support pivot; conditional aggregation is the equivalent with
    * an explicit value list). `events` needs ts, zone_id, event_type. */
  def zoneActivityStream(events: DataFrame, eventTypes: Seq[String],
                         watermarkDelay: String, windowDuration: String): DataFrame = {
    val counts = eventTypes.map(t =>
      count(when(col("event_type") === t, 1)).as(s"n_$t"))
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("zone_id"))
      .agg(counts.head, counts.tail: _*)
      .select(Seq(col("window.start").as("window_start"), col("zone_id")) ++
        eventTypes.map(t => col(s"n_$t")): _*)
  }

  /** Streaming exact dedup on a key column: duplicates arriving within the
    * watermark horizon are dropped with bounded state
    * (`dropDuplicatesWithinWatermark` expires keys once the watermark
    * passes them — the streaming twin of DedupOps.exactDupRank's keep-first
    * semantics). `df` needs an event-time column `ts`. */
  def dedupStream(df: DataFrame, keyCols: Seq[String], watermarkDelay: String): DataFrame =
    df.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-dup dedup (MinHash-LSH) via foreachBatch against a
    * persistent band store — the pattern for dedup state that outgrows
    * executor memory at corpus scale: seen LSH band keys live as a parquet
    * table in the lake (joinable, compactable, restart-safe), and each
    * micro-batch is (1) deduped within itself, (2) anti-joined against the
    * store, (3) its surviving bands appended back.
    *
    * A doc is dropped iff it shares ANY band key with an earlier-kept doc
    * (standard LSH-candidate semantics without the refinement join — a
    * streaming-appropriate recall/latency trade documented here). Returns
    * the kept docs of this batch. Wire into
    * `docs.writeStream.foreachBatch { (b, _) => nearDupDedupBatch(b, store) … }`.
    *
    * `batch` must have columns `doc_id` (long) and `text` (string). */
  def nearDupDedupBatch(batch: DataFrame, storePath: String,
                        shingleK: Int = 3, nPerm: Int = 64,
                        nBands: Int = 16): DataFrame = {
    import graft.ops.{DedupOps, TextOps}
    val spark = batch.sparkSession
    val banded = batch
      .withColumn("__hs", TextOps.shingleHashes(col("text"), shingleK))
      .where(size(col("__hs")) > 0)
      .withColumn("__band",
        explode(DedupOps.lshBandKeys(
          DedupOps.minhashSignature(col("__hs"), nPerm), nBands, nPerm / nBands)))
      .select(col("doc_id"), col("__band"))
      .persist()
    // explicit existence probe, NOT try/catch on the read: a corrupted or
    // unreadable store must fail the batch loudly — treating it as "first
    // batch" would silently restart dedup state and re-admit duplicates
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storePath), spark.sparkContext.hadoopConfiguration)
    val storeExists = fs.exists(new org.apache.hadoop.fs.Path(storePath))
    val seen: DataFrame =
      if (storeExists) spark.read.parquet(storePath).select(col("__band"))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__band",
            org.apache.spark.sql.types.StringType))))
    // within-batch: keep the lowest doc_id per band; a doc survives only if
    // it wins (or is alone in) EVERY one of its bands AND none of its bands
    // is already in the store
    val batchLoser = banded.groupBy("__band")
      .agg(min(col("doc_id")).as("__keep"))
    val dropped = banded
      .join(batchLoser, Seq("__band"))
      .where(col("doc_id") =!= col("__keep"))
      .select("doc_id")
      .union(banded.join(seen, Seq("__band")).select("doc_id"))
      .distinct()
    // eager localCheckpoint before the store append (settle-before-mutate,
    // see the verified twins): the returned frame's lineage reads `seen`,
    // and a re-evaluation after the append would find the kept docs' own
    // bands in the store and drop them against themselves
    val kept = batch.join(dropped, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val newBands = banded.join(kept.select("doc_id"), Seq("doc_id"))
      .select("__band").distinct()
    newBands.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
    banded.unpersist()
    kept
  }

  /** Streaming VERIFIED near-dup dedup via foreachBatch against the
    * partitioned signature index — the streaming twin of the
    * dedup_delta_batch2 protocol, and the full-fidelity sibling of
    * [[nearDupDedupBatch]]: band collisions are candidates only, and every
    * verdict is confirmed by exact Jaccard over STORED shingle sets
    * ([[graft.ops.DedupOps.dedupDeltaBatchPruned]]), so recall/precision
    * match the batch pipeline instead of trading refinement away.
    *
    * Per micro-batch: (1) signatures for the batch only; (2) first batch
    * bootstraps the index, later batches probe it with shard-pruned
    * band-key equi-joins; (3) verdicts per doc (drop iff it near-dups an
    * indexed doc or a smaller-id doc of the same batch); (4) KEPT docs'
    * signatures are appended to the index so dropped near-dups never
    * poison future batches. State lives in the lake (parquet, joinable,
    * compactable, restart-safe), never in executor memory — the only
    * shape that survives a 100 TB corpus. Returns the batch's verdict
    * rows (doc_id, verdict, matched_id, matched_jac_e4, matched_in).
    *
    * Wire into `docs.writeStream.foreachBatch { (b, _) =>
    * deltaDedupVerifiedBatch(b, indexPath, 0.7) … }`; `batch` needs
    * `doc_id` (long) and `text` (string). */
  def deltaDedupVerifiedBatch(batch: DataFrame, indexPath: String, minJac: Double,
                              shingleK: Int = 3, nPerm: Int = 64,
                              nBands: Int = 16, nParts: Int = 8): DataFrame = {
    import graft.ops.DedupOps
    val spark = batch.sparkSession
    val sigs = DedupOps.signatureIndex(
      batch, shingleK, nPerm, nBands, nPerm / nBands).persist()
    // explicit existence probe, NOT try/catch on the read (see
    // nearDupDedupBatch): a corrupted store must fail loudly, not be
    // mistaken for a first batch and silently re-admit duplicates
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration)
    val storeExists = fs.exists(new org.apache.hadoop.fs.Path(indexPath))
    // self-heal at open: a forget/compaction that died mid-rewrite leaves
    // staging/backup dirs behind; rolling them to a rewrite boundary here
    // (no-op when clean — one listStatus per table) means at-least-once
    // batch processing never probes a half-swapped index
    if (storeExists) DedupOps.recoverSignatureIndex(spark, indexPath)
    // eager localCheckpoint, not persist+count: verdicts must be SETTLED
    // before the index mutates below — a cache entry can be recomputed
    // later against the grown index (observed on the IVF sibling:
    // search-before-insert silently became search-after-insert), and the
    // checkpoint truncates lineage so re-evaluation is impossible
    val verdicts = (if (storeExists)
      DedupOps.dedupDeltaBatchPruned(
        batch.select("doc_id"), sigs, indexPath, minJac, nParts,
        excludeOwnIds = true) // replay-safe: a retried batch never sees
                              // its own failed attempt's index rows
    else // bootstrap: within-batch arm only, against an empty index
      DedupOps.dedupDeltaBatch(
        batch.select("doc_id"), sigs, sigs.where(lit(false)), minJac)
    ).localCheckpoint(true)
    val kept = verdicts.where(col("verdict") === "keep").select("doc_id")
    val keptSigs = sigs.join(kept, Seq("doc_id"), "left_semi")
    // replay-safe append: a RETRIED batch's kept signatures are already in
    // the index — appendNewToSignatureIndex anti-joins them away on their
    // own doc_pt shards, so at-least-once retries never duplicate index
    // rows (plain append would, unboundedly, and nothing downstream dedups
    // them — the parity battery pins index row counts across a replay)
    if (storeExists)
      DedupOps.appendNewToSignatureIndex(keptSigs, indexPath,
        nPerm, nBands, nPerm / nBands, nParts = nParts)
    else
      DedupOps.writeSignatureIndex(keptSigs, indexPath,
        nPerm, nBands, nPerm / nBands, nParts = nParts)
    sigs.unpersist()
    verdicts
  }

  /** Streaming right-to-be-forgotten via foreachBatch against the
    * partitioned signature index — the RETRACTION twin of
    * [[deltaDedupVerifiedBatch]] (a deletion-request stream is exactly
    * how forget runs in production). Each micro-batch of `doc_id` rows is
    * removed from the persisted index
    * ([[graft.ops.DedupOps.removeFromSignatureIndex]]: affected shards
    * only, crash-safe staged rewrite), so no LATER batch can match the
    * forgotten docs — a near-dup of only-forgotten content is admitted
    * again. Returns one SETTLED row per distinct batch id:
    * (doc_id, was_indexed) — whether the doc was present before this
    * removal; the receipt a deletion-request pipeline audits. The
    * receipt is checkpointed BEFORE the removal mutates the index
    * (settle-before-mutate), so it can never observe post-removal state.
    *
    * REPLAY-SAFE under foreachBatch's at-least-once contract: removal of
    * an absent id is a no-op (the shard anti-join keeps everything), so
    * a retried batch converges to the identical index state; its receipt
    * reports was_indexed=false for ids the first attempt already removed
    * — monotone in the safe direction (the doc is certainly gone). */
  def forgetBatch(batch: DataFrame, indexPath: String,
                  nPerm: Int = 64, nBands: Int = 16,
                  nParts: Int = 8): DataFrame = {
    import graft.ops.DedupOps
    // self-heal at open (see deltaDedupVerifiedBatch): a prior forget
    // that died mid-rewrite must not leave this one reading a
    // half-swapped shard set
    DedupOps.recoverSignatureIndex(batch.sparkSession, indexPath)
    val ids = batch.select(col("doc_id").cast("long").as("doc_id")).distinct()
    val present = DedupOps.presentInSignatureIndex(ids, indexPath, nParts)
      .withColumn("was_indexed", lit(true))
    val receipt = ids.join(present, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("was_indexed"), lit(false)).as("was_indexed"))
      .localCheckpoint(true)
    DedupOps.removeFromSignatureIndex(ids, indexPath,
      nPerm, nBands, nPerm / nBands, nParts = nParts)
    receipt
  }

  /** LOGICAL right-to-be-forgotten twin of [[forgetBatch]], on the
    * tombstone path ([[graft.ops.DedupOps.tombstoneInSignatureIndex]]):
    * the batch's ids are appended to the index's deletion vector —
    * O(|batch|) write I/O, corpus-independent — instead of rewriting the
    * hit shards immediately; every later probe and presence check
    * anti-joins the tombstones, so the docs are unmatchable from this
    * batch on, and the next compaction purges them physically. Same
    * receipt contract as [[forgetBatch]]: one SETTLED
    * (doc_id, was_indexed) row per distinct batch id, checkpointed
    * before the mutation; replay-safe (a retried batch re-tombstones
    * idempotently and its receipt reports was_indexed=false for ids the
    * first attempt already forgot — monotone in the safe direction).
    * Use [[forgetBatch]] when the payloads must leave DISK immediately;
    * this twin when retraction throughput matters and
    * purge-at-next-compaction retention is acceptable. */
  def forgetBatchLogical(batch: DataFrame, indexPath: String,
                         nParts: Int = 8): DataFrame = {
    import graft.ops.DedupOps
    DedupOps.recoverSignatureIndex(batch.sparkSession, indexPath)
    val ids = batch.select(col("doc_id").cast("long").as("doc_id")).distinct()
    val present = DedupOps.presentInSignatureIndex(ids, indexPath, nParts)
      .withColumn("was_indexed", lit(true))
    val receipt = ids.join(present, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("was_indexed"), lit(false)).as("was_indexed"))
      .localCheckpoint(true)
    DedupOps.tombstoneInSignatureIndex(ids, indexPath)
    receipt
  }

  // ----- generation-versioned IVF index layout ----------------------------
  //
  // All IVF index state lives under `<index>/g=<N>/{centroids,postings}`
  // with a single `_gen` pointer file naming the CURRENT generation.
  // Ordinary batches and compaction mutate the current generation in
  // place (their own crash protocols cover that); [[refreshCentroids]] —
  // which must replace BOTH tables consistently — writes a complete NEW
  // generation beside the live one and atomically repoints, so a reader
  // never observes postings partitioned by one centroid set while the
  // centroids table holds another, and a reader that resolved the old
  // generation keeps reading it untouched (zero-downtime refresh: the
  // previous generation survives until the NEXT refresh prunes it).
  //
  // Crash states and recovery ([[recoverIndex]], run at every open):
  //  - gen dir above the pointer WITHOUT its `_GEN_OK` sentinel → an
  //    unfinished refresh: deleted; the live generation is untouched.
  //  - gen dir above the pointer WITH `_GEN_OK` → a refresh that died
  //    between sentinel and repoint: rolled FORWARD (pointer advanced).
  //  - pointer missing but complete generations exist (a crash inside
  //    the pointer's delete+rename rewrite) → repoint the max complete.
  //  - pointer missing, `g=0` holds a complete centroids table → a
  //    bootstrap that died before its pointer write: finished.
  //  - a LEGACY flat layout (top-level centroids/postings, no pointer)
  //    is adopted into g=0, idempotently per table.
  //  - anything else partial is deleted; the index bootstraps fresh.

  // fs/pointer plumbing shared with the sharded-store family lives in
  // graft.ops.ShardedStore (round-16 unification)
  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    graft.ops.ShardedStore.fs(spark, path)

  private def hPath(s: String) = graft.ops.ShardedStore.hp(s)

  private def generationDir(indexPath: String, gen: Long) = s"$indexPath/g=$gen"

  /** The current generation number, or None when the index has never
    * completed a bootstrap (reads the `_gen` pointer only — run
    * [[recoverIndex]] first if a prior writer may have died). */
  def currentGeneration(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String): Option[Long] = {
    if (!fsOf(spark, indexPath).exists(hPath(s"$indexPath/_gen"))) None
    else Some(graft.ops.ShardedStore
      .readTextFile(spark, s"$indexPath/_gen").trim.toLong)
  }

  private def touch(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit =
    graft.ops.ShardedStore.touch(fs, path)

  /** Pointer rewrite via [[graft.ops.ShardedStore.writePointer]] (staged
    * temp + delete+rename). The window between delete and rename leaves
    * NO pointer — recoverable, because [[recoverIndex]] repoints the max
    * complete generation when the pointer is missing (HDFS rename cannot
    * overwrite, so a truly atomic in-place rewrite is not available;
    * missing-pointer recovery makes the two-step rewrite safe). */
  private def writeGenPointer(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, gen: Long): Unit =
    graft.ops.ShardedStore.writePointer(spark, indexPath, "_gen", gen.toString)

  /** Resolves the index to its current generation directory, running
    * recovery first — the one call every reader makes at open. The
    * returned directory holds `centroids/` and `postings/` and is NEVER
    * mutated by a later [[refreshCentroids]] (refresh writes a new
    * generation and repoints), so a probe that resolved before a
    * concurrent refresh keeps reading exactly one consistent
    * (centroids, postings) pair. Throws if the index was never
    * bootstrapped. */
  def resolveIndex(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): String = {
    recoverIndex(spark, indexPath)
    val g = currentGeneration(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"IVF index at $indexPath has no generation pointer — never bootstrapped"))
    generationDir(indexPath, g)
  }

  /** Rolls the generation layout to a consistent boundary (see the crash
    * matrix in the section comment), adopts legacy flat layouts, and
    * then recovers any in-generation compaction staging. Idempotent;
    * no-op on a clean index. */
  def recoverIndex(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): Unit = {
    val fs = fsOf(spark, indexPath)
    if (!fs.exists(hPath(indexPath))) return
    val g0 = generationDir(indexPath, 0L)
    if (currentGeneration(spark, indexPath).isEmpty) {
      // legacy flat layout → g=0, idempotent per table (a crash between
      // the two renames resumes here)
      for (t <- Seq("centroids", "postings"))
        if (fs.exists(hPath(s"$indexPath/$t")) && !fs.exists(hPath(s"$g0/$t"))) {
          fs.mkdirs(hPath(g0))
          fs.rename(hPath(s"$indexPath/$t"), hPath(s"$g0/$t")): Unit
        }
    }
    def gens: Seq[Long] = fs.listStatus(hPath(indexPath)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("g="))
      .map(_.stripPrefix("g=").toLong)
    def isComplete(g: Long): Boolean = {
      val gd = generationDir(indexPath, g)
      fs.exists(hPath(s"$gd/_GEN_OK")) ||
        // bootstrap/adoption completeness: the centroids table finished
        // (its parquet _SUCCESS exists) — finish the sentinel here
        (g == 0L && fs.exists(hPath(s"$gd/centroids/_SUCCESS")) &&
          { touch(fs, s"$gd/_GEN_OK"); true })
    }
    currentGeneration(spark, indexPath) match {
      case None =>
        val complete = gens.filter(isComplete)
        if (complete.nonEmpty) writeGenPointer(spark, indexPath, complete.max)
        // only incomplete gens are deleted here — pruning complete older
        // generations (the zero-downtime lookback) stays refresh's job
        gens.filterNot(complete.contains)
          .foreach(g => fs.delete(hPath(generationDir(indexPath, g)), true): Unit)
      case Some(cur) =>
        val above = gens.filter(_ > cur)
        val complete = above.filter(isComplete)
        if (complete.nonEmpty) writeGenPointer(spark, indexPath, complete.max)
        above.filterNot(complete.maxOption.contains)
          .foreach(g => fs.delete(hPath(generationDir(indexPath, g)), true): Unit)
    }
    fs.delete(hPath(s"$indexPath/._gen_tmp"), false)
    currentGeneration(spark, indexPath).foreach(g =>
      recoverCompactions(spark, generationDir(indexPath, g)))
  }

  /** Streaming cluster maintenance via foreachBatch — the stateful twin
    * of dedup_clusters and the downstream consumer of
    * [[deltaDedupVerifiedBatch]]'s verdicts: each micro-batch's verdict
    * rows (doc_id, matched_id — the −1 sentinel marks keeps) fold into
    * the persisted cluster store
    * ([[graft.ops.DedupOps.mergeClustersBatch]]): kept docs open
    * singleton clusters, dropped docs join their matched partner's
    * cluster, and transitive merges relabel every member of every losing
    * cluster (min-member-id labels, equal to a from-scratch
    * connected-components recompute — the catalog entry's oracle).
    * Returns the batch docs' final labels, already settled (the merge's
    * receipt is driver-built). Replay-safe: a retried batch finds its
    * roots merged and its docs present, and writes nothing. State lives
    * in the lake (two sharded parquet tables), never in executor memory.
    *
    * Wire into `docs.writeStream.foreachBatch { (b, _) =>
    *   val v = deltaDedupVerifiedBatch(b, indexPath, 0.7)
    *   clusterMaintainBatch(v, storePath) … }`. */
  def clusterMaintainBatch(verdicts: DataFrame, storePath: String,
                           nParts: Int = 8): DataFrame = {
    import graft.ops.DedupOps
    DedupOps.mergeClustersBatch(
      verdicts.select(col("doc_id").as("id")),
      verdicts.where(col("matched_id") >= 0)
        .select(col("doc_id").as("id_l"), col("matched_id").as("id_r")),
      storePath, nParts)
  }

  /** Streaming cluster RETRACTION via foreachBatch — the forget twin of
    * [[clusterMaintainBatch]] and the downstream consumer of
    * [[forgetBatch]]/[[forgetBatchLogical]] receipts: each micro-batch of
    * deletion-request `doc_id` rows is removed from the persisted cluster
    * store ([[graft.ops.DedupOps.forgetFromClusterStore]]), recomputing
    * ONLY the affected components from the stored pair evidence — a
    * forgotten bridge doc splits its component exactly as a from-scratch
    * recompute over surviving docs would (the catalog entry's oracle).
    * Returns one settled (doc_id, was_clustered) receipt row per distinct
    * batch id; replay-safe (a retried batch finds the ids absent, reports
    * was_clustered=false — monotone in the safe direction — and writes
    * nothing).
    *
    * Wire into the deletion-request stream AFTER the index forget, so
    * verdicts and labels retract together:
    * `dels.writeStream.foreachBatch { (b, _) =>
    *   forgetBatch(b, indexPath); clusterForgetBatch(b, storePath) … }`. */
  def clusterForgetBatch(batch: DataFrame, storePath: String,
                         nParts: Int = 8,
                         allocEpoch: Option[Long] = None): DataFrame = {
    import graft.ops.DedupOps
    DedupOps.forgetFromClusterStore(
      batch.select(col("doc_id").cast("long").as("doc_id")), storePath, nParts,
      allocEpoch = allocEpoch)
  }

  private val ivfPostingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id BIGINT, batch_id BIGINT")

  /** The IVF index manifest (`_manifest.json` at the index root): the
    * vector DIMENSION is a CORPUS property, recorded once when the first
    * non-empty batch arrives and validated against every later batch —
    * not an engine constant (it was a hardcoded 64 through r17). The
    * stakes: the dot kernel folds over min(len_a, len_b), so
    * mixed-dimension input would silently TRUNCATE the product instead
    * of erroring — the manifest turns that into a loud refusal at the
    * writer. Pre-manifest (legacy) indexes derive dim read-only from the
    * stored centroids and are adopted (manifest written) by the next
    * insert batch. */
  private def ivfManifestFile(indexPath: String) = s"$indexPath/_manifest.json"

  /** Manifest format version, stamped alongside dim: any future layout
    * change (posting schema, generation naming, snapshot format) bumps
    * it, and this build refuses a foreign fmt loudly instead of
    * misreading the layout — the same gate the cluster store's fmt
    * field provides. A manifest WITHOUT the field reads as fmt 1 (the
    * field landed one commit after the manifest itself). */
  private val IvfManifestFmt = 1L

  private def writeIvfManifest(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, dim: Int): Unit =
    graft.ops.ShardedStore.writeTextFile(spark, ivfManifestFile(indexPath),
      s"""{"fmt":$IvfManifestFmt,"dim":$dim}""")

  /** The index's recorded vector dimension: the manifest when present,
    * else derived from the current generation's centroids (legacy
    * index — read-only, so pure readers never write). None when
    * underivable (no manifest and an empty or never-bootstrapped
    * index) — dimension validation is skipped then, matching the
    * empty-input contract (every search is empty anyway). */
  def ivfIndexDim(spark: org.apache.spark.sql.SparkSession,
                  indexPath: String): Option[Int] = {
    val fs = fsOf(spark, indexPath)
    if (fs.exists(hPath(ivfManifestFile(indexPath)))) {
      val s = graft.ops.ShardedStore
        .readTextFile(spark, ivfManifestFile(indexPath))
      val fmt = graft.ops.ShardedStore.jsonField(s, "fmt").getOrElse(1L)
      require(fmt == IvfManifestFmt,
        s"IVF index at $indexPath has manifest fmt=$fmt but this build " +
          s"reads fmt=$IvfManifestFmt — rebuild the index or migrate it " +
          "offline; mutating it in place would corrupt the foreign layout")
      Some(graft.ops.ShardedStore.jsonField(s, "dim").map(_.toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"IVF index manifest at $indexPath missing 'dim'")))
    }
    else currentGeneration(spark, indexPath).flatMap { g =>
      val cd = s"${generationDir(indexPath, g)}/centroids"
      if (!fs.exists(hPath(cd))) None
      else spark.read.parquet(cd).select(size(col("c_vec")).as("d"))
        .head(1).headOption.map(_.getInt(0))
    }
  }

  /** One aggregate job over `df`'s embedding column: its uniform
    * dimension, None when empty. Loud on mixed-length rows — the dot
    * kernel would silently truncate them. */
  private def uniformDim(df: DataFrame, colName: String,
                         what: String): Option[Int] = {
    val mm = df.agg(min(size(col(colName))).as("lo"),
      max(size(col(colName))).as("hi")).head
    if (mm.isNullAt(0)) None
    else {
      require(mm.getInt(0) == mm.getInt(1),
        s"$what: mixed embedding dimensions ${mm.getInt(0)}..${mm.getInt(1)}" +
          " in one input — the cosine kernel folds over the shorter row," +
          " which would silently truncate; fix the upstream schema")
      Some(mm.getInt(0))
    }
  }

  /** Writer for postings dirs: every file carries a parquet BLOOM FILTER
    * on vec_id (adaptive-sized, parquet ≥1.14), so presence probes — the
    * forget receipt audit and the re-ingest purge's touched-dir lookup —
    * prune at ROW-GROUP granularity when the probe pushes its id set down
    * (see [[presenceProbe]]) instead of scanning the generation's whole
    * vec_id column. Bloom bytes amortize to well under 1% of a row-group's
    * embedding payload; min/max stats alone cannot prune here because a
    * file's vec_ids are scattered (cells group by SIMILARITY, not id). */
  private def postingsWrite(df: DataFrame) = df.write
    .option("parquet.bloom.filter.enabled#vec_id", "true")
    .option("parquet.bloom.filter.adaptive.enabled", "true")
    .option("parquet.bloom.filter.expected.ndv#vec_id", "200000")

  /** How many probe ids the presence paths push down as per-value parquet
    * predicates (bloom-prunable). Above this, the probe falls back to a
    * broadcast semi-join over the (column-pruned) vec_id scan — correct at
    * any size, corpus-column-sized instead of touched-row-group-sized.
    * Must stay ≤ spark.sql.parquet.pushdown.inFilterThreshold
    * ([[graft.Sessions.defaults]]), past which Spark degrades the
    * pushdown to a min/max range that scattered ids cannot prune with. */
  private[graft] val PresencePushdownLimit = 1000

  /** Rows of `postings` whose vec_id is in the probe set — the shared
    * presence probe: id-list pushdown (footer + bloom + matched row
    * groups) when the caller collected the set, broadcast semi-join
    * otherwise. */
  private def presenceProbe(postings: DataFrame, idRows: Option[Seq[Long]],
                            ids: DataFrame): DataFrame =
    idRows match {
      case Some(rows) => postings.where(col("vec_id").isin(rows: _*))
      case None => postings.join(broadcast(ids), Seq("vec_id"), "left_semi")
    }

  /** The probe set as driver rows when it is small enough to push down —
    * `ids` must be settled (both callers localCheckpoint first). */
  private def probeRows(ids: DataFrame): Option[Seq[Long]] =
    if (ids.count() <= PresencePushdownLimit)
      Some(ids.collect().map(_.getLong(0)).toSeq)
    else None

  /** The IVF index's deletion vector — INDEX-level, not per-generation
    * (vec_ids persist across a refresh; the refresh is also where the
    * debt is settled physically). Same idiom as the signature index's
    * tombstones ([[graft.ops.ShardedStore.DeletionVector]]). */
  private def vecTombs(indexPath: String) =
    graft.ops.ShardedStore.DeletionVector(s"$indexPath/tombstones", "vec_id")

  /** The PER-GENERATION tombstone snapshot: [[refreshCentroids]] settles
    * the index-level deletion vector physically in the NEW generation and
    * then drops it — but the generation it supersedes survives as the
    * in-flight readers' lookback, and a reader still pinned there must
    * keep filtering the forgotten ids (without the snapshot, the drop
    * re-exposed retracted vectors to exactly those readers — a
    * right-to-be-forgotten leak). The refresh copies the vector INTO the
    * superseded generation dir before sealing its successor, so every
    * resolvable (centroids, postings, tombstones) triple is
    * self-consistent; the snapshot is pruned with its generation.
    * A snapshot in the CURRENT generation can only be litter from a
    * refresh that died before sealing. It is TOLERATED by readers
    * (snapshot ⊆ live vector, so the union filter equals the live
    * filter) and cleared ONLY by the two serial-writer ops that can
    * invalidate it — the refresh retry (rewrites it) and the re-ingest
    * purge (whose tombstone clear is the one mutation a stale copy
    * cannot survive). [[recoverIndex]] never touches it: readers run
    * recovery concurrently with a live refresh, and a reader-side
    * delete would race the writer's protocol mid-flight
    * ([[clearSnapshotLitter]]; GenTombstoneSnapshotSpec pins this). */
  private def genTombSnapshot(genDir: String) =
    graft.ops.ShardedStore.DeletionVector(s"$genDir/tombstones", "vec_id")

  /** Anti-join `df` against every tombstone set a reader of `genDir` must
    * respect: the generation-local snapshot (non-current generations;
    * frozen at supersession) plus the index-level live vector (forgets
    * since — retraction applies to ALL readers immediately). Each side is
    * plan-neutral when absent. */
  private def antiVecTombs(indexPath: String, genDir: String,
                           df: DataFrame): DataFrame = {
    val max = graft.ops.DedupOps.DefaultTombstoneBroadcastBytes
    genTombSnapshot(genDir).anti(vecTombs(indexPath).anti(df, max), max)
  }

  /** Deletes snapshot litter a crashed refresh left in the CURRENT
    * generation (died after copying, before sealing its successor).
    * Harmless while it sits there (⊆ the live vector, and anti-joins are
    * idempotent over the union) — it diverges only once a mutation
    * CLEARS a tombstone the stale copy still lists, so exactly the two
    * serial-writer ops that can do that call this first: the refresh
    * retry (rewrites the snapshot) and the re-ingest purge. NOT done in
    * [[recoverIndex]]: readers run recovery concurrently with a live
    * refresh and would delete the snapshot mid-protocol. */
  private def clearSnapshotLitter(spark: org.apache.spark.sql.SparkSession,
                                  genDir: String): Unit = {
    val fs = fsOf(spark, genDir)
    fs.delete(hPath(s"$genDir/.tombstones_tmp"), true)
    fs.delete(hPath(s"$genDir/tombstones"), true): Unit
  }

  /** Streaming right-to-be-forgotten for the VECTOR index — the
    * retraction twin of [[ivfSearchInsertBatch]] and the IVF mirror of
    * [[forgetBatchLogical]]: each micro-batch of deletion-request
    * `vec_id` rows is appended to the index's deletion vector (O(|batch|)
    * write, corpus-independent); every later search anti-joins it, so the
    * vectors are unmatchable from this batch on. Physical purge happens
    * at the next [[refreshCentroids]] (which rewrites every posting
    * anyway — the purge is FREE there and the table is dropped after the
    * repoint) and incrementally at [[compactPostings]] (the merged
    * horizon is written tombstone-free; the table survives because rows
    * above the horizon may remain).
    *
    * Returns one SETTLED (vec_id, was_indexed) receipt row per distinct
    * batch id, checkpointed before the mutation — the presence audit
    * pushes the batch's id list into the parquet scan, where per-file
    * BLOOM FILTERS on vec_id ([[postingsWrite]]) skip every row group
    * holding none of them: reads are footer/bloom-metadata-sized plus the
    * matched row groups, not corpus-column-sized (the r16 shape — the
    * path's one rows-proportional step — measured closed in
    * vector_forget_scaling.json; batches past [[PresencePushdownLimit]]
    * fall back to the column-pruned semi-join scan). Replay-safe:
    * re-tombstoning is idempotent and a retried batch's receipt reports
    * was_indexed=false for already-forgotten ids — monotone in the safe
    * direction. */
  def forgetVectorsBatch(batch: DataFrame, indexPath: String): DataFrame = {
    val spark = batch.sparkSession
    recoverIndex(spark, indexPath)
    val ids = batch.select(col("vec_id").cast("long").as("vec_id"))
      .distinct().localCheckpoint(true)
    val genDirOpt = currentGeneration(spark, indexPath)
      .map(g => generationDir(indexPath, g))
      .filter(gd => fsOf(spark, indexPath).exists(hPath(s"$gd/postings")))
    val present = genDirOpt match {
      case Some(gd) => antiVecTombs(indexPath, gd,
          presenceProbe(spark.read.schema(ivfPostingsSchema)
              .parquet(s"$gd/postings").select("vec_id"),
            probeRows(ids), ids))
        .distinct().withColumn("was_indexed", lit(true))
      case None => ids.where(lit(false)).withColumn("was_indexed", lit(true))
    }
    val receipt = ids.join(present, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("was_indexed"), lit(false)).as("was_indexed"))
      .localCheckpoint(true)
    vecTombs(indexPath).append(ids)
    receipt
  }

  /** Physically removes `ids`' posting rows from one generation — the
    * RE-INGEST path's purge ([[ivfSearchInsertBatch]] calls it for batch
    * ids that are tombstoned): without it, the re-inserted vector's old
    * row would resurface beside the new one once the tombstone clears.
    * Touched (cell, batch) dirs are found with a vec_id-column scan
    * (re-ingest-sized output), their kept rows are SETTLED, rewritten via
    * dynamic overwrite, and emptied dirs retired; crash anywhere leaves
    * the ids still tombstoned (the caller removes tombstones LAST), so a
    * retry converges. */
  private def purgeVectors(spark: org.apache.spark.sql.SparkSession,
                           genDir: String, ids: DataFrame): Unit = {
    val postingsPath = s"$genDir/postings"
    if (!fsOf(spark, genDir).exists(hPath(postingsPath))) return
    val posts = spark.read.schema(ivfPostingsSchema).parquet(postingsPath)
    val touched = presenceProbe(posts, probeRows(ids), ids)
      .select("centroid_id", "batch_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (touched.isEmpty) return
    // static partition pruning to the touched (cell × batch) RECTANGLE —
    // two isin filters stay linear in distinct values — then an exact
    // broadcast semi-join on the pair (an OR-chain of per-dir predicates
    // grows the expression tree linearly in touched dirs and risks
    // analyzer/codegen blowup on a large re-ingest batch)
    import spark.implicits._
    val touchedDf = touched.toSeq.toDF("centroid_id", "batch_id")
    val kept = posts
      .where(col("centroid_id").isin(touched.map(_._1).distinct.toSeq: _*) &&
        col("batch_id").isin(touched.map(_._2).distinct.toSeq: _*))
      .join(broadcast(touchedDf), Seq("centroid_id", "batch_id"), "left_semi")
      .join(broadcast(ids), Seq("vec_id"), "left_anti")
      .select("centroid_id", "vec_id", "embedding", "batch_id")
      .localCheckpoint(true) // settled BEFORE the overwrite mutates its source
    postingsWrite(kept.repartition(col("centroid_id")))
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("centroid_id", "batch_id")
      .parquet(postingsPath)
    // a touched dir whose kept content is EMPTY was not rewritten by the
    // dynamic overwrite — retire it explicitly
    val keptDirs = kept.select("centroid_id", "batch_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fs = fsOf(spark, genDir)
    touched.filterNot(keptDirs).foreach { case (c, b) =>
      fs.delete(hPath(s"$postingsPath/centroid_id=$c/batch_id=$b"), true): Unit }
  }

  /** Streaming IVF search-then-insert via foreachBatch against a
    * persisted, cell-partitioned vector index — the search-side sibling
    * of [[deltaDedupVerifiedBatch]] and the streaming twin of
    * ann_delta_topk's probe: each micro-batch of (vec_id, embedding)
    * rows is (1) SEARCHED against the postings already indexed (top-k
    * exact cosine over only its probed cells — a `centroid_id IN`
    * partition filter from the batch's own probe assignments), then
    * (2) INSERTED — its rn=1 assignments are appended to their cells'
    * posting directories, so later batches can match it. Search-before-
    * insert means a vector never matches itself and batch-internal pairs
    * surface on the NEXT batch — the standard streaming-ANN trade,
    * documented rather than hidden.
    *
    * First batch bootstraps the index: generation 0 is created with
    * centroids from the stride rule over that batch (deterministic,
    * mirrors the batch queries); postings start from its assignments.
    * All mutations land in the CURRENT generation (see the generation
    * section comment); state lives in the lake (centroids + postings
    * parquet), never in executor memory.
    *
    * REPLAY-SAFE under foreachBatch's at-least-once contract when the
    * caller passes the micro-batch id: the search excludes the batch's
    * own `batch_id` partition (a failed attempt's rows are invisible to
    * its retry) and the insert dynamically overwrites exactly its own
    * (cell, batch) directories — the parity spec replays a batch and
    * pins identical hits and an unchanged postings row count. A
    * [[refreshCentroids]] between attempts preserves `batch_id`
    * partitions, so the contract survives a refresh.
    *
    * Returns this batch's hits: (q_id, c_id, rank, cos_e6), empty for
    * the bootstrap batch. */
  def ivfSearchInsertBatch(batch: DataFrame, indexPath: String,
                           batchId: Long = 0L,
                           nProbe: Int = 2, topK: Int = 5,
                           centStride: Long = 41L, centCap: Long = 1312L): DataFrame = {
    import graft.ops.VectorOps
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val fs = fsOf(spark, indexPath)
    // self-heal at open: a refresh or compaction that died mid-protocol
    // leaves staging/generation litter; roll to a boundary before
    // searching (no-op when clean — one listStatus)
    recoverIndex(spark, indexPath)
    // dimension contract ([[ivfManifestFile]]): recorded at the first
    // non-empty batch, validated against every later one (a mismatched
    // or mixed-dim batch fails loudly BEFORE any mutation); legacy
    // pre-manifest indexes are adopted here, on the writer path
    val storedDim = ivfIndexDim(spark, indexPath)
    val batchDim = uniformDim(batch, "embedding", "ivfSearchInsertBatch")
    batchDim.foreach { bd =>
      storedDim.foreach(d => require(bd == d,
        s"ivfSearchInsertBatch: batch embedding dim $bd does not match " +
          s"the index's recorded dim=$d at $indexPath — one index holds " +
          "one corpus dimension; use a separate index path"))
      // record (first non-empty batch) or adopt (legacy index whose dim
      // was derived from centroids): either way the manifest exists
      // after the first write that can know the dimension
      if (!fs.exists(hPath(ivfManifestFile(indexPath))))
        writeIvfManifest(spark, indexPath, storedDim.getOrElse(bd))
    }
    val dim = storedDim.orElse(batchDim).getOrElse(0)
    if (currentGeneration(spark, indexPath).isEmpty) {
      val strided = batch
        .where(col("vec_id") % centStride === 0 && col("vec_id") < centCap)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .localCheckpoint(true)
      // a NON-EMPTY bootstrap batch that misses the stride rule entirely
      // would otherwise write an empty centroid set and permanently dead
      // index (every later search and insert silently empty) — fall back
      // to the batch's lowest-id vector as the single seed centroid
      val cents0 = if (strided.isEmpty)
        batch.orderBy("vec_id").limit(1)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      else strided
      val g0 = generationDir(indexPath, 0L)
      cents0.write.mode("overwrite").parquet(s"$g0/centroids")
      touch(fs, s"$g0/_GEN_OK")
      writeGenPointer(spark, indexPath, 0L)
    }
    val genDir = generationDir(indexPath,
      currentGeneration(spark, indexPath).get)
    // RE-INGEST of a tombstoned vec_id (forgotten, purge pending): purge
    // its stale posting rows first, then clear its tombstone — otherwise
    // the new row would be invisible until the next refresh and the old
    // one would resurface beside it afterwards (the mirror of the
    // signature index's append-path fix; crash between the two steps
    // leaves the id purged AND tombstoned — consistent, replay converges)
    if (vecTombs(indexPath).exists(spark)) {
      val reIngest = vecTombs(indexPath).ids(spark)
        .join(broadcast(batch.select(col("vec_id").cast("long").as("vec_id"))),
          Seq("vec_id"), "left_semi")
        .distinct().localCheckpoint(true)
      if (!reIngest.isEmpty) {
        // the tombstone clear below is the one mutation a stale
        // current-generation snapshot cannot survive (it would keep
        // filtering the re-admitted id) — clear crash litter first
        clearSnapshotLitter(spark, genDir)
        purgeVectors(spark, genDir, reIngest)
        vecTombs(indexPath).remove(reIngest,
          graft.ops.DedupOps.DefaultTombstoneBroadcastBytes)
      }
    }
    val cents = spark.read.parquet(s"$genDir/centroids")
    val wQ = Window.partitionBy("q_id").orderBy(col("cs").desc, col("c_id").asc)
    val ranked = batch.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("cs", VectorOps.cosine(col("q_vec"), col("c_vec"), dim))
      .withColumn("rn", row_number().over(wQ))
      .where(col("rn") <= math.max(nProbe, 1))
      .select(col("q_id"), col("q_vec"), col("c_id").as("centroid_id"), col("rn"))
      .persist()
    val postingsExist = fs.exists(new org.apache.hadoop.fs.Path(s"$genDir/postings"))
    val postingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id BIGINT, batch_id BIGINT")
    val hits = if (postingsExist) {
      val cells = ranked.select("centroid_id").distinct()
        .collect().map(_.getLong(0)).toSeq
      val wR = Window.partitionBy("q_id").orderBy(col("cosine_sim").desc, col("vec_id").asc)
      // logically-forgotten vectors must not act as partners: anti-join
      // the tombstone sets (index-level vector + any generation-local
      // snapshot; each plan-neutral when absent)
      antiVecTombs(indexPath, genDir,
        spark.read.schema(postingsSchema).parquet(s"$genDir/postings")
          // a REPLAYED batch must not see its own failed attempt's rows —
          // without this partition filter, batch-internal pairs would leak
          // into the replayed hits (self-pairs alone are not the issue)
          .where(col("batch_id") =!= batchId && col("centroid_id").isin(cells: _*)))
        .join(broadcast(ranked), Seq("centroid_id"))
        .where(col("q_id") =!= col("vec_id")) // belt-and-braces vs own rows
        .withColumn("cosine_sim", VectorOps.cosine(col("q_vec"), col("embedding"), dim))
        .withColumn("rank", row_number().over(wR)).where(col("rank") <= topK)
        .select(col("q_id"), col("vec_id").as("c_id"),
          col("rank").cast("long").as("rank"),
          round(col("cosine_sim") * 1000000).cast("long").as("cos_e6"))
        // eager localCheckpoint, not persist+count: the hits must be
        // SETTLED before the postings append below — a cache entry can
        // be recomputed later against the mutated directory, silently
        // turning search-before-insert into search-after-insert; the
        // checkpoint truncates lineage so re-evaluation is impossible
        .localCheckpoint(true)
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "q_id BIGINT, c_id BIGINT, rank BIGINT, cos_e6 BIGINT"))
    // exactly-once insert: postings carry a batch_id partition column and
    // the write is a DYNAMIC overwrite, so a replayed batch replaces
    // exactly its own (cell, batch) directories instead of appending
    // duplicates — idempotent under foreachBatch's replay contract
    postingsWrite(ranked.where(col("rn") === 1)
        .select(col("centroid_id"), col("q_id").as("vec_id"),
          col("q_vec").as("embedding"), lit(batchId).as("batch_id"))
        .repartition(col("centroid_id")))
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("centroid_id", "batch_id")
      .parquet(s"$genDir/postings")
    ranked.unpersist()
    hits
  }

  /** Read-only IVF top-k search against a RESOLVED generation dir — the
    * pinned-reader path of the zero-downtime contract: a reader resolves
    * once ([[resolveIndex]]) and may keep probing that generation while
    * a [[refreshCentroids]] supersedes it. The probe respects every
    * tombstone set the generation must honor ([[antiVecTombs]]):
    * forgotten vectors never surface as partners, including AFTER a
    * refresh settles the debt and drops the index-level vector — the
    * generation-local snapshot takes over (spec-pinned; the pre-r17
    * lookback leak). Same probe shape as the insert path's search
    * (nProbe cells by centroid cosine, exact cosine top-k inside them)
    * minus the own-batch exclusion — a pure reader has no batch.
    * `queries` needs (vec_id, embedding); returns settled
    * (q_id, c_id, rank, cos_e6) rows.
    *
    * CONCURRENCY SCOPE — refresh supersession ONLY: a pin protects the
    * reader against [[refreshCentroids]] replacing the index (the
    * superseded generation's files are never mutated, and its tombstone
    * snapshot keeps the forget filter). Reads concurrent with
    * SAME-generation writer batches ([[ivfSearchInsertBatch]]'s
    * re-ingest purge dynamically overwrites old (cell, batch) dirs) are
    * OUTSIDE the contract — serialize readers against in-generation
    * writers, or accept mid-scan file churn.
    *
    * LOOKBACK WINDOW — one refresh cycle: [[refreshCentroids]] retains
    * only the immediate predecessor generation, so a pin is valid across
    * AT MOST one refresh. A reader pinned across two finds its
    * generation pruned and gets a contract error here (checked at probe
    * start; a prune racing mid-probe still surfaces as a raw read
    * failure) — re-resolve and re-issue. */
  def ivfSearchResolved(queries: DataFrame, indexPath: String, genDir: String,
                        nProbe: Int = 2, topK: Int = 5): DataFrame = {
    import graft.ops.VectorOps
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    if (!fsOf(spark, genDir).exists(hPath(genDir)))
      throw new IllegalStateException(
        s"IVF generation at $genDir has been pruned: a resolved generation" +
          " is retained for ONE refreshCentroids cycle (the zero-downtime" +
          " lookback window); this reader pinned it across at least two —" +
          " re-resolve the index (resolveIndex) and re-issue the probe")
    val dim = ivfIndexDim(spark, indexPath).getOrElse(0)
    uniformDim(queries, "embedding", "ivfSearchResolved").foreach(qd =>
      if (dim > 0) require(qd == dim,
        s"ivfSearchResolved: query embedding dim $qd does not match the" +
          s" index's recorded dim=$dim at $indexPath"))
    if (!fsOf(spark, genDir).exists(hPath(s"$genDir/postings")))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "q_id BIGINT, c_id BIGINT, rank BIGINT, cos_e6 BIGINT"))
    val cents = spark.read.parquet(s"$genDir/centroids")
    val wQ = Window.partitionBy("q_id").orderBy(col("cs").desc, col("c_id").asc)
    val ranked = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("cs", VectorOps.cosine(col("q_vec"), col("c_vec"), dim))
      .withColumn("rn", row_number().over(wQ))
      .where(col("rn") <= math.max(nProbe, 1))
      .select(col("q_id"), col("q_vec"), col("c_id").as("centroid_id"))
      .persist()
    val cells = ranked.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val wR = Window.partitionBy("q_id")
      .orderBy(col("cosine_sim").desc, col("vec_id").asc)
    val hits = antiVecTombs(indexPath, genDir,
        spark.read.schema(ivfPostingsSchema).parquet(s"$genDir/postings")
          .where(col("centroid_id").isin(cells: _*)))
      .join(broadcast(ranked), Seq("centroid_id"))
      .where(col("q_id") =!= col("vec_id"))
      .withColumn("cosine_sim", VectorOps.cosine(col("q_vec"), col("embedding"), dim))
      .withColumn("rank", row_number().over(wR)).where(col("rank") <= topK)
      .select(col("q_id"), col("vec_id").as("c_id"),
        col("rank").cast("long").as("rank"),
        round(col("cosine_sim") * 1000000).cast("long").as("cos_e6"))
      // settled: the caller may hold these hits across later maintenance
      .localCheckpoint(true)
    ranked.unpersist()
    hits
  }

  /** Compacts the [[ivfSearchInsertBatch]] postings layout: every
    * micro-batch adds one file per touched (cell, batch) directory, and
    * probe cost degrades with file count. All batch partitions at or
    * below `upToBatchId` are merged into a single `batch_id=upToBatchId`
    * partition per cell — SAFE only for batches at or below the
    * streaming checkpoint's replay horizon (a replay of a compacted
    * batch would double its rows; batches above the horizon keep their
    * own partitions precisely so replays stay idempotent).
    *
    * CRASH-SAFE two-phase rewrite (the DedupOps.stageShards idiom; the
    * earlier delete-then-append lost the horizon if the process died
    * between the two): phase 1 stages the full compacted content under a
    * dot-prefixed dir readers ignore — reads run against untouched live
    * dirs, so nothing depends on cache or lineage; phase 2 swaps per
    * cell, and [[recoverPostings]] rolls a mid-swap crash forward (or
    * discards an incomplete staging). Operates on the CURRENT
    * generation's postings (a compaction never spans a refresh). */
  def compactPostings(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String, upToBatchId: Long): Unit = {
    recoverIndex(spark, indexPath)
    currentGeneration(spark, indexPath).foreach { g =>
      val gd = generationDir(indexPath, g)
      if (stageCompactedPostings(spark, gd, upToBatchId))
        swapCompactedPostings(spark, gd, upToBatchId)
    }
  }

  /** Phase 1 of [[compactPostings]]: stage the merged horizon content
    * under the GENERATION dir. Returns false (staging nothing) when the
    * horizon is already one batch dir per cell. */
  private[graft] def stageCompactedPostings(
      spark: org.apache.spark.sql.SparkSession,
      genDir: String, upToBatchId: Long): Boolean = {
    val indexPath = genDir
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration)
    val postingsPath = new org.apache.hadoop.fs.Path(s"$indexPath/postings")
    if (!fs.exists(postingsPath)) return false
    val batchDirs = fs.listStatus(postingsPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
      .flatMap(c => fs.listStatus(c.getPath).toSeq
        .filter(b => b.isDirectory && b.getPath.getName.startsWith("batch_id=") &&
          b.getPath.getName.stripPrefix("batch_id=").toLong <= upToBatchId)
        .map(_.getPath))
    // one batch dir per cell at the horizon is already compact
    if (batchDirs.size <= batchDirs.map(_.getParent.getName).distinct.size) return false
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id BIGINT, batch_id BIGINT")
    // the merged horizon is written TOMBSTONE-FREE (incremental purge,
    // free inside a rewrite that happens anyway); the deletion vector
    // itself survives — rows ABOVE the horizon may still carry
    // tombstoned ids, and only the refresh rewrites everything
    val genRoot = hPath(indexPath).getParent.toString // <index> above g=N
    postingsWrite(antiVecTombs(genRoot, indexPath,
          spark.read.schema(schema).parquet(s"$indexPath/postings")
            .where(col("batch_id") <= upToBatchId))
        .select(col("centroid_id"), col("vec_id"), col("embedding"))
        .repartition(col("centroid_id")))
      .mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$indexPath/postings/.compact_upto_$upToBatchId")
    true
  }

  /** Phase 2 / recovery arm of [[compactPostings]]: for every staged
    * cell, drop its merged batch dirs and rename the staged content in
    * as `batch_id=upToBatchId`. Idempotent across every crash point —
    * a cell whose staged dir is gone was fully swapped (the rename is
    * that cell's last step), so re-running rolls the compaction forward;
    * an INCOMPLETE staging (no parquet `_SUCCESS`) is discarded with the
    * live dirs untouched. Takes the GENERATION dir. */
  private[graft] def swapCompactedPostings(
      spark: org.apache.spark.sql.SparkSession,
      genDir: String, upToBatchId: Long): Unit = {
    val indexPath = genDir
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val staging = p(s"$indexPath/postings/.compact_upto_$upToBatchId")
    if (!fs.exists(staging)) return
    if (!fs.exists(p(s"$staging/_SUCCESS"))) { fs.delete(staging, true); return }
    fs.listStatus(staging).toSeq
      .filter(_.getPath.getName.startsWith("centroid_id="))
      .foreach { cellDir =>
        val liveCell = p(s"$indexPath/postings/${cellDir.getPath.getName}")
        if (fs.exists(liveCell))
          fs.listStatus(liveCell).toSeq
            .filter(b => b.isDirectory && b.getPath.getName.startsWith("batch_id=") &&
              b.getPath.getName.stripPrefix("batch_id=").toLong <= upToBatchId)
            .foreach(b => fs.delete(b.getPath, true): Unit)
        else fs.mkdirs(liveCell): Unit
        fs.rename(cellDir.getPath, p(s"$liveCell/batch_id=$upToBatchId")): Unit
      }
    fs.delete(staging, true): Unit
  }

  /** Rolls the whole index to a consistent state after a crash in ANY
    * maintenance op — generation recovery ([[recoverIndex]]: unfinished
    * refreshes discarded or rolled forward, pointer repaired) plus
    * in-generation compaction recovery (completed stagings roll forward,
    * incomplete ones are discarded). Run at index open when a prior
    * maintenance run may have died (the sibling of
    * [[graft.ops.DedupOps.recoverSignatureIndex]]). */
  def recoverPostings(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String): Unit =
    recoverIndex(spark, indexPath)

  /** Compaction-staging recovery within one generation dir (the
    * pre-generation recoverPostings body). */
  private def recoverCompactions(spark: org.apache.spark.sql.SparkSession,
                                 genDir: String): Unit = {
    val fs = fsOf(spark, genDir)
    val postingsPath = hPath(s"$genDir/postings")
    if (!fs.exists(postingsPath)) return
    fs.listStatus(postingsPath).toSeq
      .filter(_.getPath.getName.startsWith(".compact_upto_"))
      .foreach(d => swapCompactedPostings(spark, genDir,
        d.getPath.getName.stripPrefix(".compact_upto_").toLong))
  }

  /** Re-clusters a persisted [[ivfSearchInsertBatch]] index's centroids
    * from its CURRENT postings and rewrites every posting into its new
    * cell — the maintenance op that closes the frozen-bootstrap gap: the
    * bootstrap centroids are a strided draw over the FIRST batch, frozen
    * for the index's lifetime, so as inserted batches drift, cells grow
    * unbalanced and recall at fixed nProbe decays
    * (q_ann_recall_evolution is the gate that measures it; this op is
    * what an operator runs when that gate dips).
    *
    * Clustering is KMeansOps.fitExact — integer Lloyd's, deterministic
    * run-to-run — with k = the current centroid count, over L2-NORMALIZED
    * vectors, and the stored centroids are normalized too: the probe
    * ranks cells by COSINE, and for unit vectors L2-argmin ≡
    * cosine-argmax, so assignment and probe agree on what "nearest cell"
    * means (clustering raw vectors measurably REGRESSED recall on the
    * fixture — metric mismatch put true neighbors in cells the probe
    * doesn't visit). New centroid ids are 0..k-1. `batch_id` partitions
    * are PRESERVED so the streaming replay horizon survives a refresh (a
    * replayed batch still dynamically overwrites exactly its own
    * (cell, batch) dirs).
    *
    * ZERO-DOWNTIME via the generation layout (see the section comment):
    * the reassigned postings and new centroids are written as a complete
    * NEW generation, sealed with `_GEN_OK`, and the `_gen` pointer is
    * repointed — so a reader that resolved the index before (or during)
    * the refresh keeps reading its own generation's consistent
    * (centroids, postings) pair, and a reader resolving after sees only
    * the refreshed pair. A crash anywhere before the repoint leaves the
    * live generation untouched ([[recoverIndex]] discards the unsealed
    * new generation, or rolls a sealed one forward). Generations older
    * than the predecessor are pruned here — the predecessor itself
    * survives until the NEXT refresh, giving in-flight readers their
    * lookback window. */
  def refreshCentroids(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, iters: Int = 3): Unit = {
    import graft.ops.KMeansOps
    val fs = fsOf(spark, indexPath)
    def p(s: String) = hPath(s)
    recoverIndex(spark, indexPath)
    val curOpt = currentGeneration(spark, indexPath)
    if (curOpt.isEmpty) return
    val cur = curOpt.get
    val genDir = generationDir(indexPath, cur)
    if (!fs.exists(p(s"$genDir/postings"))) return
    // a crashed predecessor's snapshot litter would be frozen into this
    // refresh's superseded-generation state — rewrite from the live vector
    clearSnapshotLitter(spark, genDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, centroid_id BIGINT, batch_id BIGINT")
    // persisted: every Lloyd iteration scans the postings (plus the final
    // reassignment write) — one parquet read instead of iters + 1.
    // Tombstoned vectors are excluded from BOTH the fit and the new
    // generation (retracted content must not shape centroids): the
    // refresh is the vector index's free physical purge, and the
    // deletion vector is dropped after the repoint below.
    val posts = antiVecTombs(indexPath, genDir,
      spark.read.schema(schema).parquet(s"$genDir/postings")).persist()
    val k = spark.read.parquet(s"$genDir/centroids").count().toInt
    val unit = { // L2-normalize in-row (codegen dot; no shuffle)
      val nrm = sqrt(graft.expressions.F.dot(col("embedding"), col("embedding")))
      transform(col("embedding"), x => (x / nrm).cast("float"))
    }
    val cq = KMeansOps.fitExact(
      posts.select(col("vec_id"), unit.as("embedding")), k, iters)
    if (cq.isEmpty) { posts.unpersist(); return }
    // normalize the fitted centroids too (a mean of unit vectors is not
    // unit), then re-quantize so the assignment below is L2-argmin over
    // unit vectors on both sides ≡ cosine-argmax
    val cUnit = cq.map { c =>
      val n = math.sqrt(c.map(x => (x / 1e6) * (x / 1e6)).sum).max(1e-12)
      c.map(x => x / 1e6 / n)
    }
    val cqUnit = cUnit.map(_.map(x => math.round(x * 1e6)))
    import spark.implicits._
    val newCents = cUnit.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.map(_.toFloat).toSeq) }
      .toDF("c_id", "c_vec")
    val next = generationDir(indexPath, cur + 1)
    // recoverIndex above removed any unsealed leftover; belt-and-braces
    fs.delete(p(next), true)
    postingsWrite(posts
        .withColumn("centroid_id", KMeansOps.assignmentExact(
          KMeansOps.quantize(unit, 1000000L), cqUnit).cast("long"))
        .select("centroid_id", "vec_id", "embedding", "batch_id")
        .repartition(col("centroid_id")))
      .mode("overwrite").partitionBy("centroid_id", "batch_id")
      .parquet(s"$next/postings")
    posts.unpersist()
    newCents.write.mode("overwrite").parquet(s"$next/centroids")
    // snapshot the deletion vector INTO the generation being superseded,
    // UNDER the successor's seal (seal durable ⇒ snapshot present): a
    // reader still pinned to `cur` keeps its forget filter after the
    // index-level vector drops below (see [[genTombSnapshot]]). Staged
    // via temp dir + rename so a concurrent pinned reader never sees a
    // partial snapshot. If the refresh dies before the seal, the copy is
    // litter in the still-current generation: harmless to readers
    // (snapshot ⊆ live vector) and cleared only by the refresh retry
    // (clearSnapshotLitter above) or a re-ingest purge — NEVER by
    // recovery, which readers run concurrently with live refreshes.
    if (vecTombs(indexPath).exists(spark)) {
      val tmp = s"$genDir/.tombstones_tmp"
      fs.delete(p(tmp), true)
      vecTombs(indexPath).ids(spark).distinct()
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      fs.delete(p(s"$genDir/tombstones"), true)
      fs.rename(p(tmp), p(s"$genDir/tombstones")): Unit
    }
    touch(fs, s"$next/_GEN_OK") // sealed: recovery now rolls FORWARD
    writeGenPointer(spark, indexPath, cur + 1)
    // the new generation is tombstone-free: the debt is settled, drop the
    // vector (a crash before this leaves purged rows + live tombstones —
    // anti-joins no-op on them; the next refresh or forget converges it).
    // Readers pinned to the PREVIOUS generation keep filtering via its
    // snapshot — the pre-r17 lookback leak is closed.
    vecTombs(indexPath).drop(spark)
    // prune generations older than the immediate predecessor; `cur`
    // itself stays as the in-flight readers' lookback until next refresh
    fs.listStatus(p(indexPath)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("g=")).map(_.stripPrefix("g=").toLong)
      .filter(_ < cur)
      .foreach(g => fs.delete(p(generationDir(indexPath, g)), true): Unit)
  }

  /** Streaming snapshot maintenance via foreachBatch: fold each micro-batch
    * of (key, version, …) rows into a hive-partitioned lake snapshot with
    * [[graft.ops.Sinks.mergeUpsert]] — the incremental twin of the batch
    * mart refresh. The batch is reduced to its latest row per key first, so
    * the merge's version window never sees an intra-batch tie (rows sharing
    * BOTH key and version resolve arbitrarily — supply a unique version,
    * e.g. event time, if that matters); cost per micro-batch is bounded by
    * the batch's partition footprint, not the snapshot size. Wire into
    * `updates.writeStream.foreachBatch { (b, _) => snapshotMaintainBatch(b, …) }`.
    *
    * First batch bootstraps the snapshot (plain partitioned write). */
  def snapshotMaintainBatch(batch: DataFrame, snapPath: String,
                            keyCols: Seq[String], partitionCols: Seq[String],
                            versionCol: String): Unit = {
    import graft.ops.{Sinks, WindowOps}
    val spark = batch.sparkSession
    val reduced = WindowOps.latestPerKey(batch, keyCols, Seq(col(versionCol)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(snapPath), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(snapPath)))
      Sinks.mergeUpsert(spark, snapPath, reduced, keyCols, partitionCols, versionCol)
    else
      Sinks.writePartitioned(reduced, snapPath, partitionCols)
  }

  /** Stream-stream inner interval join: left rows match right rows with the
    * same keys and rightTs ∈ [leftTs, leftTs + maxGap]. Both sides carry a
    * watermark and the join condition bounds event-time in BOTH directions,
    * so Spark can expire join state — without the time bound a stream-stream
    * join buffers both streams forever. State per key is O(rows within the
    * watermark+gap horizon), independent of stream length — the property
    * that matters when the streams never end.
    *
    * Output columns: all left columns, then right columns renamed with
    * `rightPrefix` (stream-stream joins on same-named columns would
    * otherwise be ambiguous to downstream selects). */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTs: String, rightTs: String, watermark: String,
                         maxGap: String, rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "streamIntervalJoin: keys must be non-empty")
    val clash = right.columns.map(rightPrefix + _).toSet intersect left.columns.toSet
    require(clash.isEmpty,
      s"streamIntervalJoin: rightPrefix '$rightPrefix' collides with left columns $clash")
    val l = left.withWatermark(leftTs, watermark)
    // atomic select-alias rename (a sequential withColumnRenamed fold would
    // collide mid-way when right contains both 'c' and '<prefix>c')
    val rRenamed = right.select(
      right.columns.map(c => col(c).as(rightPrefix + c)).toIndexedSeq: _*)
    val r = rRenamed.withWatermark(rightPrefix + rightTs, watermark)
    val rts = col(rightPrefix + rightTs)
    val cond = keys.map(k => col(k) === col(rightPrefix + k)).reduce(_ && _) &&
      rts >= col(leftTs) && rts <= col(leftTs) + expr(s"INTERVAL $maxGap")
    l.join(r, cond, "inner")
  }

  /** Per-user session aggregates via the BUILT-IN `session_window` (gap
    * merging done by Spark's native streaming session-window state ops —
    * contrast with [[sessionize]], which hand-rolls the same semantics on
    * flatMapGroupsWithState for custom per-session logic). Emits one row
    * per closed session once the watermark passes its end. Native session
    * windows use the dedicated merging state format, so at scale this is
    * the cheaper of the two: no per-event user state objects, and the
    * window merge runs inside the aggregation operator. */
  def sessionWindowCounts(events: DataFrame, gap: String,
                          watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Stream-static enrichment: a streaming fact joined to a bounded static
    * dimension. The static side is planned per micro-batch as an ordinary
    * broadcast hash join — no streaming state AT ALL is kept for it (the
    * scale property that makes dimension enrichment free on a stream; the
    * reference's geo-enrich step, streaming). */
  def streamStaticEnrich(stream: DataFrame, dim: DataFrame,
                         keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming twin of `quality_linear_score`: the SAME in-row hashing-trick
    * classifier expression applied to a document stream, keeping only
    * positive-scoring docs. Stateless and narrow — no watermark, no state
    * store, no shuffle — so it composes with any downstream stateful op and
    * is exactly as 100 TB-safe as the batch plan (ingest-time quality
    * filtering is where a training pipeline runs this). */
  def qualityFilterStream(docs: DataFrame): DataFrame = {
    import graft.queries.TextQueries.QualityModel
    import graft.ops.TextOps
    val toks = TextOps.tokens(col("text"))
    val score = aggregate(
      transform(toks, t => QualityModel.weight(QualityModel.bucket(t))),
      lit(0L), (acc, x) => acc + x)
    docs.withColumn("score", score).where(col("score") > 0)
  }

  case class KeyedValue(user_id: Long, v: Long)
  case class RunningTotal(user_id: Long, n: Long, total: Long)

  /** Per-key running totals on the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed ValueState on the RocksDB state store) —
    * the successor of flatMapGroupsWithState: named state variables,
    * per-variable TTL, timers, and state readable by the state data
    * source. One updated (n, total) row is emitted per key per
    * micro-batch; state is O(1) per key, and `ttl` (e.g. "PT1H") lets
    * inactive keys expire instead of accumulating forever — the
    * property a per-entity accumulator needs on an unbounded stream. */
  class RunningTotalProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, KeyedValue, RunningTotal] {
    @transient private var state: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)], ttl)
    override def handleInputRows(key: Long, rows: Iterator[KeyedValue],
                                 timers: TimerValues): Iterator[RunningTotal] = {
      var (n, tot) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { r => n += 1; tot += r.v }
      state.update((n, tot))
      Iterator.single(RunningTotal(key, n, tot))
    }
  }

  /** Wire [[RunningTotalProcessor]] over a keyed stream. Requires the
    * RocksDB state store provider (transformWithState's only supported
    * backend):
    * `spark.sql.streaming.stateStore.providerClass=
    *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`. */
  def runningTotals(events: Dataset[KeyedValue],
                    ttl: TTLConfig = TTLConfig.NONE): Dataset[RunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  case class EwmaOut(user_id: Long, n: Long, ewma_scaled: Long)

  /** Streaming binary-decay smoother: per key, each value folds as
    * S := v·128 + (S >> 1) — the same α=1/2 decay as q_ewma_revenue, but
    * a DIFFERENT statistic: unnormalized, over an infinite event-step
    * horizon with per-step right-shift truncation (the batch query is a
    * wsum-normalized exact 8-term ladder — do not parity-check one
    * against the other). Integer arithmetic throughout; a contribution
    * vanishes after ~64 shifts, so state magnitude is bounded by
    * 256·max(v) — O(1) state on an unbounded stream. Values fold in
    * arrival order within a micro-batch, so the smoother is well-defined
    * when the source preserves per-key order (the kafka-per-partition /
    * sorted-replay contract). */
  class EwmaProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, KeyedValue, EwmaOut] {
    @transient private var state: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("ewma",
        org.apache.spark.sql.Encoders.product[(Long, Long)], ttl)
    override def handleInputRows(key: Long, rows: Iterator[KeyedValue],
                                 timers: TimerValues): Iterator[EwmaOut] = {
      var (n, s) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { r => n += 1; s = r.v * 128L + (s >> 1) }
      state.update((n, s))
      Iterator.single(EwmaOut(key, n, s))
    }
  }

  /** Wire [[EwmaProcessor]] over a keyed stream (RocksDB state store, as
    * for [[runningTotals]]). */
  def ewmaStream(events: Dataset[KeyedValue],
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  case class KeyedHash(k: String, hv: Long)
  case class KmvSketch(hs: Array[Long])
  case class KmvOut(k: String, n_held: Long, estimate: Long)

  /** Streaming K-minimum-values distinct sketch — the stateful twin of the
    * batch `q_kmv_distinct`/`q_kmv_union` queries, and the reason KMV is
    * the right sketch for streams: state is the k smallest distinct
    * hashes per key (O(k) BOUNDED on an unbounded stream), merging a
    * micro-batch is set-union + re-truncate (associative + commutative +
    * idempotent, so replays and reordering cannot corrupt it), and the
    * estimate (k−1)·P div h_k is re-emitted per batch. Same hash space
    * and estimator as the batch queries: feed it `HashOps.hashP` values
    * and the final estimate equals the batch sketch of the same data —
    * spec-pinned. */
  class KmvProcessor(k: Int, hashP: Long, ttl: TTLConfig)
    extends StatefulProcessor[String, KeyedHash, KmvOut] {
    @transient private var state: ValueState[KmvSketch] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KmvSketch]("kmv",
        org.apache.spark.sql.Encoders.product[KmvSketch], ttl)
    override def handleInputRows(key: String, rows: Iterator[KeyedHash],
                                 timers: TimerValues): Iterator[KmvOut] = {
      val held = if (state.exists()) state.get().hs else Array.empty[Long]
      val merged = (held ++ rows.map(_.hv)).distinct.sorted.take(k)
      state.update(KmvSketch(merged))
      val est =
        if (merged.length < k) merged.length.toLong
        else (k - 1).toLong * hashP / merged.last
      Iterator.single(KmvOut(key, merged.length.toLong, est))
    }
  }

  /** Wire [[KmvProcessor]] over a keyed hash stream (RocksDB state store). */
  def kmvDistinctStream(hashes: Dataset[KeyedHash], k: Int, hashP: Long,
                        ttl: TTLConfig = TTLConfig.NONE): Dataset[KmvOut] = {
    val spark = hashes.sparkSession
    import spark.implicits._
    hashes.groupByKey(_.k)
      .transformWithState(new KmvProcessor(k, hashP, ttl),
        TimeMode.None(), OutputMode.Update())
  }

  case class TwapEvent(user_id: Long, ts_us: Long, event_id: Long, cents: Long)
  case class TwapState(last_ts: Long, last_id: Long, last_cents: Long,
                       wsum: Long, dur: Long, n: Long)
  case class TwapOut(user_id: Long, n_holds: Long, total_dur_us: Long, twap_cents: Long)

  /** Streaming TWAP — the stateful twin of the batch `q_twap`: a value is
    * HELD from one observation to the next, so state per user is exactly
    * the open hold (last ts/value) plus the running Σ(cents·dur) and Σdur
    * — O(1) regardless of stream length. Events are folded in
    * (ts, event_id) order within each micro-batch (the batch query's
    * tie-break); across batches the per-key ordered-log assumption holds
    * (same contract as [[sessionize]]). Feeding the batch fixture through
    * in order yields bit-identical per-user TWAP — spec-pinned. */
  class TwapProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, TwapEvent, TwapOut] {
    @transient private var state: ValueState[TwapState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TwapState]("twap",
        org.apache.spark.sql.Encoders.product[TwapState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[TwapEvent],
                                 timers: TimerValues): Iterator[TwapOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var st = if (state.exists()) state.get() else null
      sorted.foreach { e =>
        st =
          if (st == null) TwapState(e.ts_us, e.event_id, e.cents, 0L, 0L, 0L)
          else {
            val d = e.ts_us - st.last_ts
            TwapState(e.ts_us, e.event_id, e.cents,
              st.wsum + st.last_cents * d, st.dur + d, st.n + 1)
          }
      }
      state.update(st)
      Iterator.single(TwapOut(key, st.n, st.dur,
        if (st.dur > 0) st.wsum / st.dur else 0L))
    }
  }

  /** Wire [[TwapProcessor]] over a keyed event stream (RocksDB state). */
  def twapStream(events: Dataset[TwapEvent],
                 ttl: TTLConfig = TTLConfig.NONE): Dataset[TwapOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TwapProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  case class UserEvent(user_id: Long, ts_us: Long)
  case class SessionState(start_us: Long, last_us: Long, n: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Incremental gap-based sessionization: state = the user's open session;
    * a new event more than `gapMicros` after the last closes it (emitted)
    * and opens a new one. Batch-equivalent of WindowOps.sessionize for the
    * closed sessions. */
  def sessionize(events: Dataset[UserEvent], gapMicros: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val evs = it.toIndexedSeq.sortBy(_.ts_us)
          var closed = List.empty[ClosedSession]
          var open = state.getOption
          evs.foreach { e =>
            open = open match {
              case Some(s) if e.ts_us - s.last_us > gapMicros =>
                closed ::= ClosedSession(uid, s.start_us, s.last_us, s.n)
                Some(SessionState(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                Some(s.copy(last_us = e.ts_us, n = s.n + 1))
              case None =>
                Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          open.foreach(state.update)
          closed.reverse.iterator
      }
  }

  case class TypedEvent(user_id: Long, ts_us: Long, event_type: String)
  case class AttribState(start_us: Long, last_us: Long, n: Long,
                         first_type: String, conv: Boolean)
  case class AttributedSession(user_id: Long, start_us: Long, end_us: Long,
                               n_events: Long, first_type: String,
                               converted: Boolean)

  /** Streaming twin of the batch first-touch attribution mart
    * (BehaviorQueries.qAttributionFirstTouch): gap sessionization that
    * carries the acquisition channel (the session's FIRST event type) and
    * the conversion flag (any 'purchase') in per-user state, emitting each
    * closed session already attributed. Aggregating the emitted sessions
    * by first_type reproduces the batch mart's channel counts for closed
    * sessions. State is O(1) per user (one open session), unbounded-stream
    * safe. */
  def attributedSessions(events: Dataset[TypedEvent],
                         gapMicros: Long): Dataset[AttributedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, AttributedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val evs = it.toIndexedSeq.sortBy(_.ts_us)
          var closed = List.empty[AttributedSession]
          var open = state.getOption
          evs.foreach { e =>
            val isConv = e.event_type == "purchase"
            open = open match {
              case Some(s) if e.ts_us - s.last_us > gapMicros =>
                closed ::= AttributedSession(uid, s.start_us, s.last_us, s.n,
                  s.first_type, s.conv)
                Some(AttribState(e.ts_us, e.ts_us, 1, e.event_type, isConv))
              case Some(s) =>
                Some(s.copy(last_us = e.ts_us, n = s.n + 1, conv = s.conv || isConv))
              case None =>
                Some(AttribState(e.ts_us, e.ts_us, 1, e.event_type, isConv))
            }
          }
          open.foreach(state.update)
          closed.reverse.iterator
      }
  }

  case class FunnelEvent(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String)
  /** −1 = step not reached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelLevel(user_id: Long, level: Long, t1_us: Long, t3_us: Long)

  /** Streaming twin of the batch strict window-funnel
    * (BehaviorQueries.qWindowFunnel): per-user state is exactly the three
    * chain timestamps (first view, first click after it, first purchase
    * after that — all within `windowUs` of the view), O(1) on an
    * unbounded stream. Events fold in (ts, event_id) order within each
    * micro-batch (the repo-wide total-order tie-break — the strict `>`
    * window guards make the final state tie-insensitive, but the fold
    * order itself stays deterministic);
    * a chain step arriving in a LATER micro-batch than its predecessor
    * advances the level then (spec-pinned). Emits the user's current
    * level on every update — downstream counts per level reproduce the
    * batch funnel. */
  class FunnelProcessor(windowUs: Long, ttl: TTLConfig)
    extends StatefulProcessor[Long, FunnelEvent, FunnelLevel] {
    @transient private var state: ValueState[FunnelState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[FunnelLevel] = {
      var st = if (state.exists()) state.get() else FunnelState(-1L, -1L, -1L)
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" if st.t1 < 0 => st = st.copy(t1 = e.ts_us)
          case "click" if st.t1 >= 0 && st.t2 < 0 &&
            e.ts_us > st.t1 && e.ts_us <= st.t1 + windowUs =>
            st = st.copy(t2 = e.ts_us)
          case "purchase" if st.t2 >= 0 && st.t3 < 0 &&
            e.ts_us > st.t2 && e.ts_us <= st.t1 + windowUs =>
            st = st.copy(t3 = e.ts_us)
          case _ => ()
        }
      }
      state.update(st)
      val level = if (st.t3 >= 0) 3L else if (st.t2 >= 0) 2L
      else if (st.t1 >= 0) 1L else 0L
      Iterator.single(FunnelLevel(key, level, st.t1, st.t3))
    }
  }

  /** Wire [[FunnelProcessor]] over a keyed event stream (RocksDB state). */
  def funnelStream(events: Dataset[FunnelEvent], windowUs: Long,
                   ttl: TTLConfig = TTLConfig.NONE): Dataset[FunnelLevel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(windowUs, ttl),
        TimeMode.None(), OutputMode.Update())
  }

  case class SSEvent(user_id: Long, ts_us: Long, event_id: Long, item: String)
  case class SSState(items: Array[String], counts: Array[Long],
    errs: Array[Long], n_seen: Long)
  case class SSOut(user_id: Long, n_seen: Long, item: String, est: Long,
    max_err: Long)

  /** Streaming SpaceSaving top-k (Metwally et al. 2005) — per-key heavy
    * hitters in O(k) state on an unbounded stream: k counters; a known
    * item increments, a new item takes over the MINIMUM counter and
    * inherits its count as the error bound. Guarantees (spec-pinned on a
    * crafted overflow stream): true ≤ est ≤ true + max_err for every
    * tracked item, and any UNtracked item's true count ≤ the minimum
    * tracked est — the bound that makes the sketch trustworthy for
    * top-k extraction. When k ≥ |distinct items| the sketch degenerates
    * to EXACT counting (max_err ≡ 0), which is what the parity battery
    * pins against the batch groupBy on the real fixture. Victim
    * selection tie-breaks (count, then item) so the fold is
    * deterministic; rows fold in the repo-wide (ts_us, event_id) order.
    * Emits the full tracked set (≤ k rows) stamped with n_seen per
    * update — the final state is the max-n_seen emission per key. */
  class SpaceSavingProcessor(k: Int, ttl: TTLConfig)
    extends StatefulProcessor[Long, SSEvent, SSOut] {
    @transient private var state: ValueState[SSState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SSState]("topk",
        org.apache.spark.sql.Encoders.product[SSState], ttl)
    override def handleInputRows(key: Long, rows: Iterator[SSEvent],
                                 timers: TimerValues): Iterator[SSOut] = {
      val st = if (state.exists()) state.get()
      else SSState(Array.empty, Array.empty, Array.empty, 0L)
      val items = scala.collection.mutable.ArrayBuffer(st.items: _*)
      val counts = scala.collection.mutable.ArrayBuffer(st.counts: _*)
      val errs = scala.collection.mutable.ArrayBuffer(st.errs: _*)
      var nSeen = st.n_seen
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        nSeen += 1
        val i = items.indexOf(e.item)
        if (i >= 0) counts(i) += 1
        else if (items.length < k) { items += e.item; counts += 1L; errs += 0L }
        else {
          var j = 0
          var t = 1
          while (t < items.length) {
            if (counts(t) < counts(j) ||
              (counts(t) == counts(j) && items(t) < items(j))) j = t
            t += 1
          }
          errs(j) = counts(j); items(j) = e.item; counts(j) += 1
        }
      }
      state.update(SSState(items.toArray, counts.toArray, errs.toArray, nSeen))
      items.indices.sortBy(items(_)).iterator
        .map(i => SSOut(key, nSeen, items(i), counts(i), errs(i)))
    }
  }

  /** Wire [[SpaceSavingProcessor]] over a keyed event stream (RocksDB
    * state store, as all transformWithState operators). */
  def spaceSavingTopK(events: Dataset[SSEvent], k: Int,
                      ttl: TTLConfig = TTLConfig.NONE): Dataset[SSOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SpaceSavingProcessor(k, ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Batch↔stream twin registry: every streaming operator above, mapped to
    * the batch computation it must reproduce on the shared fixture (a
    * catalog query name, or a description of the inline batch recompute).
    * `StreamingParitySpec` enumerates this map with one parity assertion
    * per entry AND reflects over this object's public operator methods to
    * assert the map is complete — a new streaming twin cannot land without
    * a registry entry, and a registry entry cannot land without a parity
    * runner. Keep keys = method names. */
  val batchTwins: Map[String, String] = Map(
    "windowedEventCounts" -> "q_windowed_counts (same unified helper, batch mode)",
    "zoneActivityStream" -> "inline batch window x zone conditional counts",
    "dedupStream" -> "inline batch distinct on the dedup keys",
    "nearDupDedupBatch" -> "driver replay of the two-batch LSH band-store fold",
    "deltaDedupVerifiedBatch" -> "flat-index batch replay of the bootstrap/probe/append protocol",
    "clusterMaintainBatch" -> "driver union-find over all batches' verdict edges (min-reachable-id labels)",
    "clusterForgetBatch" -> "driver union-find recompute over surviving verdict edges (forget splits bridged components)",
    "forgetBatch" -> "driver presence check + post-removal index content vs a batch-side recompute",
    "forgetBatchLogical" -> "physical-forget equivalence: receipts and probe verdicts match forgetBatch; compaction purge converges the files",
    "ivfSearchInsertBatch" -> "in-memory batch replay of the search-then-insert protocol",
    "ivfSearchResolved" -> "pinned-generation read-only probe: hits frozen across a refresh, forget filter intact via the generation-local snapshot",
    "forgetVectorsBatch" -> "post-forget hits equal a never-inserted twin index; receipts classify indexed/absent; re-ingest re-admits",
    "snapshotMaintainBatch" -> "inline batch WindowOps.latestPerKey over all updates",
    "streamIntervalJoin" -> "inline batch join with the same interval predicate",
    "sessionWindowCounts" -> "q_session_window_sql",
    "streamStaticEnrich" -> "inline batch broadcast left join",
    "qualityFilterStream" -> "inline batch quality_linear_score expression",
    "runningTotals" -> "inline batch groupBy count/sum",
    "ewmaStream" -> "driver fold of the binary-decay recurrence in (ts, event_id) order",
    "kmvDistinctStream" -> "driver KMV of the distinct hash set (k-th smallest estimator)",
    "twapStream" -> "q_twap",
    "sessionize" -> "q_sessionize",
    "attributedSessions" -> "inline batch WindowOps.sessionize + first-touch/conversion agg",
    "funnelStream" -> "q_window_funnel",
    "spaceSavingTopK" -> "inline batch (user, item) counts (k >= |items| => sketch exact)")
}
