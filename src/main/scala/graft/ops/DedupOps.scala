package graft.ops

import graft.ops.Checkpoints._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup detection. Extension surface beyond
  * the reference (which has none); designed so the pair-generation step is
  * always an equi-join on a bucket key — never an O(n²) cross join — which
  * is what survives 100 TB.
  */
object DedupOps {
  import HashOps.P

  /** Exact dedup: rank duplicates within identical `keyCol` content, keeping
    * the lowest `idCol` as canonical. Adds `dup_rank` (1 = canonical) and
    * `canonical_id`. One shuffle on the content hash. */
  def exactDupRank(df: DataFrame, keyCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(idCol.asc)
    df.withColumn("dup_rank", row_number().over(w))
      .withColumn("canonical_id", first(idCol).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** MinHash signature: for each of `nPerm` universal-hash permutations,
    * the minimum permuted shingle hash — computed IN-ROW by a codegen'd
    * expression over the shingle-hash array (no explode, no shuffle; the
    * classic explode→groupBy formulation shuffles |docs|·|shingles|·|perms|
    * rows, which is exactly what dies at scale, and the higher-order-
    * function formulation is interpreted).
    * Returns array<bigint> of length nPerm (null for an empty set).
    * DuckDB mirror: min((a_i*h + b_i) % P) grouped by (doc, i). */
  def minhashSignature(shingleHashes: Column, nPerm: Int): Column =
    graft.expressions.F.minhash(shingleHashes, nPerm)

  /** LSH band keys from a MinHash signature: `nBands` bands of
    * `rowsPerBand` signature positions, each rendered as a string key
    * "band:v1,v2,...". Docs sharing ANY band key are candidate pairs.
    * DuckDB: list_transform(range(0, bands), b ->
    *   b || ':' || array_to_string(list_slice(sig, b*r+1, b*r+r), ',')) */
  def lshBandKeys(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => concat_ws(":", b.cast("string"),
        concat_ws(",", transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")))))

  /** SimHash fingerprint: see graft.expressions.SimHash (codegen kernel)
    * via graft.expressions.F.simhash. */

  /** Hamming distance between two ≤63-bit fingerprints via arithmetic bit
    * extraction (portable; Spark also has bit_count but DuckDB's operates on
    * BIT — keep one portable formulation). Bits come from integer
    * `shiftright`, never `/` (double division truncates the 53-bit mantissa
    * for fingerprints ≥ 2^53, corrupting low-order bits). */
  def hamming(a: Column, b: Column, nBits: Int): Column =
    (0 until nBits).map { j =>
      val bitA = shiftright(a.cast("long"), j) % 2L
      val bitB = shiftright(b.cast("long"), j) % 2L
      (bitA - bitB) * (bitA - bitB)
    }.reduce(_ + _)

  /** Candidate pairs from exploded bucket keys: equi-join on the key with
    * `idL < idR` canonical ordering, deduplicated across buckets. The scale
    * workhorse: shuffle is bounded by bucket membership, never |n|². */
  def bucketPairs(df: DataFrame, idCol: String, bucketCol: String): DataFrame = {
    val l = df.select(col(idCol).as("id_l"), col(bucketCol).as("__b"))
    val r = df.select(col(idCol).as("id_r"), col(bucketCol).as("__b"))
    l.join(r, "__b").where(col("id_l") < col("id_r"))
      .select("id_l", "id_r").distinct()
  }

  /** Intersection cardinality of two SORTED distinct long-array columns
    * (as produced by ShingleHashSet) — codegen'd two-pointer merge. */
  def intersectSizeSorted(a: Column, b: Column): Column =
    graft.expressions.F.intersectSizeSorted(a, b)

  /** Exact Jaccard similarity between two shingle-hash SET columns (arrays
    * already distinct), as e4-scaled bigint for oracle-stable comparison. */
  def jaccardE4(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - size(array_intersect(a, b))
    round(inter / union * 10000).cast("long")
  }

  /** Connected components over undirected pair edges: every node's label
    * converges to the minimum node id reachable from it (= deterministic
    * cluster id) — the dedup-pipeline step that turns near-dup PAIRS into
    * keep-one CLUSTERS. `nodes` must have column `id`; `pairs` columns
    * `id_l`,`id_r`.
    *
    * Scale shape: only nodes that appear in an edge are iterated —
    * singletons (the overwhelming majority of a near-dup graph at corpus
    * scale) short-circuit to their own id with zero rounds. Each round
    * combines one-hop min-label propagation with pointer doubling
    * (label := min(label, label(label), min neighbor label)), so
    * convergence is O(log diameter) rounds rather than O(diameter); change
    * detection reads the already-materialized round output (old label kept
    * alongside new — no extra join). Labels only ever move within a
    * component and never below its min id, so the fixpoint is exactly the
    * min-reachable-id labeling the recursive-CTE oracle computes.
    *
    * Throws if the loop exits before fixpoint — silently returning
    * unconverged labels would corrupt downstream keep/drop decisions.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxIter: Int = 20,
                          driverEdgeLimit: Long = 1000000L): DataFrame = {
    val p = pairs.select(col("id_l").cast("long").as("src"),
      col("id_r").cast("long").as("dst")).cutLineage()
    val nPairs = p.count()
    // Adaptive plan choice, AQE-style: the near-dup pair graph is usually
    // orders of magnitude smaller than the corpus (it exists only where
    // near-dups exist), so below `driverEdgeLimit` pairs the component
    // labeling runs as driver-side union-find (exact min-root invariant) in
    // one pass, and only the label map — ≤ 2·pairs entries — is broadcast
    // back. Above the limit, the distributed pointer-doubling loop below
    // takes over; both paths produce identical min-reachable-id labels
    // (equality is pinned by a spec).
    if (nPairs <= driverEdgeLimit) return ccViaDriver(nodes, p)
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .cutLineage()
    // localCheckpoint (not persist): the doubling self-join would otherwise
    // triple the logical plan every round — lineage must be cut, not cached.
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label")).cutLineage()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      // pointer doubling: every label is itself a node id in `labels`.
      // Round 1 skips it — labels are still the identity map, so
      // label(label) = label and the self-join would be a pure-overhead
      // shuffle.
      val doubled =
        if (i == 0) labels.select(col("node").as("dnode"), col("label").as("dlabel"))
        else labels.alias("x")
          .join(labels.alias("y"), col("x.label") === col("y.node"))
          .select(col("x.node").as("dnode"), col("y.label").as("dlabel"))
      val stepped = labels.alias("l")
        .join(doubled.alias("d"), col("l.node") === col("d.dnode"))
        .join(nbrMin.alias("n"), col("l.node") === col("n.src"), "left")
        .select(col("l.node").as("node"), col("l.label").as("old_label"),
          least(col("l.label"), col("d.dlabel"),
            coalesce(col("n.nbr_label"), col("l.label"))).as("label"))
        .cutLineage()
      changed = stepped.where(col("label") =!= col("old_label")).count()
      labels = stepped.select("node", "label")
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds ($changed labels still moving)")
    val singletons = nodes.select(col("id").as("node"))
      .join(labels.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("cluster_id"))
    labels.select(col("node"), col("label").as("cluster_id")).union(singletons)
  }

  /** One row of the persisted dedup SIGNATURE INDEX per document with a
    * non-empty shingle set: (doc_id, hs sorted-distinct shingle hashes,
    * sig MinHash signature, bands LSH band keys). This is the structure
    * "dedup a new batch against 100 TB already ingested" persists once and
    * probes per batch: signatures and band keys are per-document (corpus-
    * independent), so index rows never need recomputation when new data
    * arrives, and the stored `hs` lets exact-Jaccard verification run
    * WITHOUT rescanning the ingested corpus's text. */
  def signatureIndex(docs: DataFrame, shingleK: Int, nPerm: Int,
                     nBands: Int, rowsPerBand: Int): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        TextOps.shingleHashes(col("text"), shingleK).as("hs"))
      .where(size(col("hs")) > 0)
      .withColumn("sig", minhashSignature(col("hs"), nPerm))
      .withColumn("bands", lshBandKeys(col("sig"), nBands, rowsPerBand))

  /** Partition count for the persisted signature index's shard
    * directories ([[writeSignatureIndex]] / [[dedupDeltaBatchPruned]]). */
  val IndexParts = 32

  private val bandsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, bk STRING, band_pt INT")
  private val sigsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, hs ARRAY<BIGINT>, doc_pt INT")

  /** Index-level parameters, stamped once at bootstrap
    * ([[writeSignatureIndex]] overwrite) and validated by every later
    * append, forget, and pruned probe: band keys and shard assignments
    * are deterministic functions of these four values, so an op run with
    * DIFFERENT values computes a wrong band_pt/doc_pt set and silently
    * misses rows — e.g. a forget whose recomputed band keys don't match
    * the stored ones leaves the forgotten doc matchable, defeating the
    * right-to-be-forgotten guarantee with no error. */
  final case class IndexManifest(nPerm: Int, nBands: Int,
                                 rowsPerBand: Int, nParts: Int)

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def manifestFile(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/_manifest.json")

  private def writeManifest(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, m: IndexManifest): Unit = {
    val out = hadoopFs(spark, indexPath).create(manifestFile(indexPath), true)
    try out.write((s"""{"nPerm":${m.nPerm},"nBands":${m.nBands},""" +
      s""""rowsPerBand":${m.rowsPerBand},"nParts":${m.nParts}}""").getBytes("UTF-8"))
    finally out.close()
  }

  /** Reads the parameter manifest of a [[writeSignatureIndex]] layout;
    * throws if absent (an index without one predates the bootstrap or is
    * not a signature index at all — proceeding would guess parameters). */
  def readManifest(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): IndexManifest = {
    val fs = hadoopFs(spark, indexPath)
    require(fs.exists(manifestFile(indexPath)),
      s"signature index at $indexPath has no parameter manifest — " +
        "not a writeSignatureIndex layout (or an incomplete bootstrap)")
    val in = fs.open(manifestFile(indexPath))
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def f(k: String): Int = ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"manifest at $indexPath missing '$k': $s"))
    IndexManifest(f("nPerm"), f("nBands"), f("rowsPerBand"), f("nParts"))
  }

  private def validateManifest(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, want: IndexManifest): Unit = {
    val got = readManifest(spark, indexPath)
    require(got == want,
      s"signature-index parameter mismatch at $indexPath: written with $got, " +
        s"caller supplied $want — band/shard assignments would silently diverge")
  }

  // ----- crash-safe shard rewrite ------------------------------------------
  //
  // Forget and compaction replace whole shard directories. A naive
  // delete-then-write loses a shard if the process dies between the two
  // (multi-second window — the write recomputes from upstream). The rewrite
  // here is two phases with a recovery routine, so the live table is never
  // observably partial:
  //
  //  phase 1 (stage)  — the complete replacement content lands under
  //                     `<table>/.staging/<ptCol>=K` (dot-prefixed: parquet
  //                     partition discovery ignores it). All reads feeding it
  //                     run against the UNTOUCHED live dirs, and the write
  //                     materializes everything to disk, so no lineage into
  //                     live data survives into phase 2 — the round-13
  //                     settle-before-mutate hazard is structural here, not
  //                     a persist/checkpoint convention.
  //  phase 2 (swap)   — per shard: live → `.old.<ptCol>=K`, staged → live,
  //                     drop `.old.`. The only non-atomic window is between
  //                     two renames of ONE shard, and the old content is
  //                     still on disk then, so [[recoverSignatureIndex]] can
  //                     always roll forward to the staged state (or back, if
  //                     staging never completed).

  /** Phase 1: write `kept` (the full replacement content for the shards
    * being rewritten) under the table's staging dir. `maxParts` bounds the
    * shuffle width; rows are repartitioned BY THE SHARD KEY so each shard
    * dir receives one file (see [[writeSignatureIndex]]).
    *
    * `pts` — the FULL affected-shard list — is persisted with the staging
    * as a `_pts` manifest, written AFTER the parquet `_SUCCESS` and before
    * any swap begins: a shard whose replacement is EMPTY has no staged
    * dir (and, before its swap runs, no `.old.` backup), so without this
    * list a roll-forward could not know to retire it and a forget's
    * emptied shard would stay matchable until the batch replayed.
    * [[recoverSignatureIndex]] treats a staging without `_pts` as
    * incomplete (no swap can have started) and rolls back. */
  private[graft] def stageShards(kept: DataFrame, tableDir: String,
                                 ptCol: String, maxParts: Int,
                                 pts: Seq[Int]): Unit = {
    kept.repartition(math.max(maxParts, 1), col(ptCol))
      .write.mode("overwrite").partitionBy(ptCol).parquet(s"$tableDir/.staging")
    val out = hadoopFs(kept.sparkSession, tableDir).create(
      new org.apache.hadoop.fs.Path(s"$tableDir/.staging/_pts"), true)
    try out.write(pts.mkString(",").getBytes("UTF-8")) finally out.close()
  }

  /** Idempotent single-shard swap (phase 2 step). Entry states it must
    * handle: fresh swap (staged+live), fresh swap onto a missing shard
    * (staged only), emptied shard (live only, no `.old.` — the staged
    * content for it is empty), and every crash point of a previous attempt
    * (`.old.` present in any combination). An `.old.` dir present WITHOUT a
    * staged dir means a prior attempt already renamed staged→live, so live
    * is final and only the backup is dropped. */
  private def swapOne(fs: org.apache.hadoop.fs.FileSystem, tableDir: String,
                      ptCol: String, pt: Int): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$tableDir/$ptCol=$pt")
    val old = new org.apache.hadoop.fs.Path(s"$tableDir/.old.$ptCol=$pt")
    val staged = new org.apache.hadoop.fs.Path(s"$tableDir/.staging/$ptCol=$pt")
    if (fs.exists(staged)) {
      if (fs.exists(live)) { fs.delete(old, true); fs.rename(live, old): Unit }
      fs.rename(staged, live): Unit
    } else if (fs.exists(live) && !fs.exists(old)) {
      // replacement is empty and no swap has started: retire live (backup
      // kept until the delete below so the window stays recoverable)
      fs.rename(live, old): Unit
    }
    fs.delete(old, true): Unit
  }

  /** Phase 2: swap every rewritten shard, then drop the staging dir. */
  private[graft] def swapShards(spark: org.apache.spark.sql.SparkSession,
                                tableDir: String, ptCol: String,
                                pts: Seq[Int]): Unit = {
    val fs = hadoopFs(spark, tableDir)
    pts.foreach(swapOne(fs, tableDir, ptCol, _))
    fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/.staging"), true): Unit
  }

  /** Rolls both index tables to a consistent rewrite boundary after a
    * crash mid-[[removeFromSignatureIndex]]/[[compactSignatureIndex]].
    * If a table's staging completed (parquet `_SUCCESS` marker AND the
    * `_pts` affected-shard manifest — `_pts` is written last in phase 1
    * and phase 2 only starts after it, so its presence implies a complete
    * staging), the rewrite rolls FORWARD — phase 2 re-runs for every
    * shard in the manifest plus every staged and half-swapped one
    * ([[swapOne]] is idempotent across all its crash states, and the
    * manifest covers EMPTIED shards, which leave neither a staged dir nor
    * — before their swap — an `.old.` backup); otherwise it rolls BACK —
    * half-swapped shards are restored from their `.old.` backups and the
    * incomplete staging is discarded. Run this at index open when a
    * prior writer may have died. */
  def recoverSignatureIndex(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String): Unit =
    for ((table, ptCol) <- Seq(("sigs", "doc_pt"), ("bands", "band_pt")))
      recoverTable(spark, s"$indexPath/$table", ptCol)

  private def recoverTable(spark: org.apache.spark.sql.SparkSession,
                           tableDir: String, ptCol: String): Unit = {
    val fs = hadoopFs(spark, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(dir)) return
    val staging = new org.apache.hadoop.fs.Path(s"$tableDir/.staging")
    val ptsFile = new org.apache.hadoop.fs.Path(s"$tableDir/.staging/_pts")
    val oldPts = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s".old.$ptCol="))
      .map(_.stripPrefix(s".old.$ptCol=").toInt)
    val stagedComplete = fs.exists(
      new org.apache.hadoop.fs.Path(s"$tableDir/.staging/_SUCCESS")) &&
      fs.exists(ptsFile)
    if (stagedComplete) {
      val in = fs.open(ptsFile)
      val manifestPts = (try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()).split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt)
      val stagedPts = fs.listStatus(staging).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(s"$ptCol=")).map(_.stripPrefix(s"$ptCol=").toInt)
      swapShards(spark, tableDir, ptCol, (manifestPts ++ stagedPts ++ oldPts).distinct)
    } else {
      oldPts.foreach { pt =>
        val live = new org.apache.hadoop.fs.Path(s"$tableDir/$ptCol=$pt")
        val old = new org.apache.hadoop.fs.Path(s"$tableDir/.old.$ptCol=$pt")
        if (!fs.exists(live)) fs.rename(old, live) else fs.delete(old, true): Unit
      }
      if (fs.exists(staging)) fs.delete(staging, true): Unit
    }
  }

  /** Writes [[signatureIndex]] rows as the PARTITIONED two-table layout
    * [[dedupDeltaBatchPruned]] probes:
    *
    *  - `bands/band_pt=K/` — one (doc_id, bk) row per (doc, band key),
    *    hash-partitioned by band key: the PROBE side. A batch touches only
    *    the shards its own band keys hash into, so partition pruning skips
    *    every other shard's files before any I/O happens.
    *  - `sigs/doc_pt=K/` — one (doc_id, hs) row per doc, hash-partitioned
    *    by doc id: the VERIFICATION payload, fetched only for
    *    band-collided docs (and pruned to their doc_pt shards). `hs` is
    *    the complete per-doc state — signature and band keys are
    *    deterministic functions of it ([[minhashSignature]] /
    *    [[lshBandKeys]]), so storing them again here would only widen
    *    every write and every verification fetch.
    *
    * `mode = "append"` supports index evolution: signatures are
    * per-document, so ingesting a new batch appends rows into existing
    * shard directories and never rewrites old ones. For appends that must
    * be idempotent under at-least-once replay, use
    * [[appendNewToSignatureIndex]].
    *
    * The signature parameters are stamped into `_manifest.json` at
    * bootstrap (written LAST, so a readable manifest implies a complete
    * bootstrap) and validated on every append — see [[IndexManifest]].
    *
    * The input is persisted across the two writes (signature computation
    * is the expensive part — shingling + nPerm MinHash over every doc —
    * and must run once, not once per table), and each table is
    * repartitioned BY ITS SHARD KEY first so every shard directory
    * receives one file per write instead of one per upstream task —
    * without it a P-partition input sprays up to P files into each of
    * the nParts directories, and the small-file metadata cost dominates
    * both the write and every later probe. */
  def writeSignatureIndex(index: DataFrame, path: String,
                          nPerm: Int, nBands: Int, rowsPerBand: Int,
                          mode: String = "overwrite",
                          nParts: Int = IndexParts): Unit = {
    val spark = index.sparkSession
    val m = IndexManifest(nPerm, nBands, rowsPerBand, nParts)
    if (mode == "append") validateManifest(spark, path, m)
    val ix = index.persist()
    try {
      ix.select(col("doc_id"), explode(col("bands")).as("bk"))
        .withColumn("band_pt", pmod(xxhash64(col("bk")), lit(nParts.toLong)).cast("int"))
        .repartition(nParts, col("band_pt"))
        .write.mode(mode).partitionBy("band_pt").parquet(s"$path/bands")
      ix.select(col("doc_id"), col("hs"))
        .withColumn("doc_pt", pmod(col("doc_id"), lit(nParts.toLong)).cast("int"))
        .repartition(nParts, col("doc_pt"))
        .write.mode(mode).partitionBy("doc_pt").parquet(s"$path/sigs")
    } finally ix.unpersist()
    if (mode != "append") writeManifest(spark, path, m)
  }

  /** Appends `sigs` rows ([[signatureIndex]] schema) to a persisted index,
    * SKIPPING docs already present — the idempotence guard an
    * at-least-once replayed micro-batch needs: a plain append would add
    * duplicate sig/band rows per retry that nothing downstream dedups
    * (verdicts survive only via min-aggregation; compaction preserves
    * content). Presence is probed on the ids' own doc_pt shards (partition
    * filter + broadcast semi — batch-sized, never corpus-sized), and the
    * surviving rows are settled to disk BEFORE the append, whose target
    * their lineage otherwise reads (settle-before-mutate).
    *
    * KNOWN WINDOW: the underlying append writes bands BEFORE sigs, and
    * this probe keys on sigs — a crash BETWEEN the two table writes makes
    * the retried batch look absent and re-append its band rows, leaving
    * exact-duplicate bands entries. Every verdict survives (candidate
    * generation consumes bands via semi-joins and distinct pairs), and
    * [[compactSignatureIndex]] collapses the duplicates at the next
    * maintenance pass, so the "index row counts pinned across a replay"
    * invariant holds for crash-free replays and converges after a
    * crashed one once compaction runs (spec-pinned). Probing sigs is the
    * safe choice of the two: keying on bands would skip the SIGS write
    * on such a retry, leaving band rows with no verification payload —
    * those docs would be silently unmatchable forever, not just wider. */
  def appendNewToSignatureIndex(sigs: DataFrame, indexPath: String,
                                nPerm: Int, nBands: Int, rowsPerBand: Int,
                                nParts: Int = IndexParts): Unit = {
    val spark = sigs.sparkSession
    validateManifest(spark, indexPath,
      IndexManifest(nPerm, nBands, rowsPerBand, nParts))
    val ids = sigs.select(col("doc_id")).localCheckpoint(true)
    val dpts = ids.select(pmod(col("doc_id"), lit(nParts.toLong)).cast("int").as("pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (dpts.isEmpty) return
    val present = spark.read.schema(sigsSchema).parquet(s"$indexPath/sigs")
      .where(col("doc_pt").isin(dpts: _*))
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select("doc_id")
    val fresh = sigs.join(present, Seq("doc_id"), "left_anti").localCheckpoint(true)
    if (!fresh.isEmpty)
      writeSignatureIndex(fresh, indexPath, nPerm, nBands, rowsPerBand,
        mode = "append", nParts = nParts)
  }

  /** Removes documents from a persisted [[writeSignatureIndex]] layout —
    * the right-to-be-forgotten / retraction path of the incremental-dedup
    * story: after removal, no future batch can match a forgotten doc, so
    * a near-dup of only-forgotten content is admitted again.
    *
    * Only AFFECTED SHARDS are touched, in both tables:
    *  1. the forgotten ids' `doc_pt` shards are known from the ids alone
    *     (pure pmod — no scan); those sigs shards are read, the forgotten
    *     payloads are captured, and their band keys are RECOMPUTED from
    *     the stored `hs` (signature/bands are deterministic functions of
    *     it — the reason the payload table can stay slim);
    *  2. those band keys' `band_pt` shards are the only bands shards
    *     containing forgotten rows; both shard sets are rewritten as
    *     filtered anti-joins.
    * Cost ∝ shards hit by the forget set, never index size, for forget
    * sets small against nParts.
    *
    * Shard rewrite is the CRASH-SAFE two-phase stage-then-swap (see the
    * block comment above [[stageShards]]): surviving rows are fully on
    * disk under a reader-invisible staging dir before any live dir is
    * touched, and [[recoverSignatureIndex]] rolls a mid-swap crash to a
    * rewrite boundary. Both tables stage first, then sigs swaps BEFORE
    * bands: in the cross-table window a forgotten doc has lost its
    * verification payload while its band rows linger, and a band row
    * without a payload can never produce a verdict (the verification
    * join is inner on the payload) — so no intermediate state readmits
    * forgotten content. */
  def removeFromSignatureIndex(removeIds: DataFrame, indexPath: String,
                               nPerm: Int, nBands: Int, rowsPerBand: Int,
                               nParts: Int = IndexParts): Unit = {
    val spark = removeIds.sparkSession
    validateManifest(spark, indexPath,
      IndexManifest(nPerm, nBands, rowsPerBand, nParts))
    val ids = removeIds.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().persist()
    val dpts = ids.select(pmod(col("doc_id"), lit(nParts.toLong)).cast("int").as("pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (dpts.isEmpty) { ids.unpersist(); return }
    // persisted across its two consumers (band-key recompute + staged
    // write) for CPU only — the live dirs stay untouched until both
    // staging writes complete, so crash safety never depends on the cache
    val sigShards = spark.read.schema(sigsSchema).parquet(s"$indexPath/sigs")
      .where(col("doc_pt").isin(dpts: _*)).persist()
    val removedBandPts = sigShards
      .join(ids, Seq("doc_id"), "left_semi")
      .select(explode(lshBandKeys(
        minhashSignature(col("hs"), nPerm), nBands, rowsPerBand)).as("bk"))
      .select(pmod(xxhash64(col("bk")), lit(nParts.toLong)).cast("int").as("pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val bandShards = spark.read.schema(bandsSchema).parquet(s"$indexPath/bands")
      .where(col("band_pt").isin(removedBandPts: _*))
    stageShards(sigShards.join(ids, Seq("doc_id"), "left_anti"),
      s"$indexPath/sigs", "doc_pt", math.min(nParts, dpts.size), dpts)
    if (removedBandPts.nonEmpty)
      stageShards(bandShards.join(ids, Seq("doc_id"), "left_anti"),
        s"$indexPath/bands", "band_pt", math.min(nParts, removedBandPts.size),
        removedBandPts)
    sigShards.unpersist(); ids.unpersist(): Unit
    swapShards(spark, s"$indexPath/sigs", "doc_pt", dpts)
    if (removedBandPts.nonEmpty)
      swapShards(spark, s"$indexPath/bands", "band_pt", removedBandPts)
  }

  /** Doc ids from `ids` currently MATCHABLE in the index: present in the
    * payload table (probed on their own doc_pt shards only — partition
    * filter + broadcast semi, so the I/O is id-set-shard-sized, never
    * index-sized) and not logically forgotten
    * ([[tombstoneInSignatureIndex]]). */
  def presentInSignatureIndex(ids: DataFrame, indexPath: String,
                              nParts: Int = IndexParts): DataFrame = {
    val spark = ids.sparkSession
    val d = ids.select(col("doc_id").cast("long").as("doc_id")).distinct()
    val dpts = d.select(pmod(col("doc_id"), lit(nParts.toLong)).cast("int").as("pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (dpts.isEmpty) d.where(lit(false))
    else antiTombstoned(spark.read.schema(sigsSchema).parquet(s"$indexPath/sigs")
      .where(col("doc_pt").isin(dpts: _*))
      .join(broadcast(d), Seq("doc_id"), "left_semi")
      .select("doc_id"), indexPath)
  }

  // ----- logical forget: tombstones (the deletion-vector idiom) ------------
  //
  // [[removeFromSignatureIndex]] is the PHYSICAL forget: affected shards
  // are rewritten immediately, and its I/O is shards-hit-sized — for a
  // |F|-doc forget that is the collision-expectation fraction of the bands
  // table (~1-(1-1/nParts)^(|F|·nBands)), because band rows hash-scatter.
  // No band-key-derived re-layout can shrink that: the expected number of
  // touched equal-sized shards depends only on (|F|·nBands draws, total
  // shard count), not on WHICH key function assigns rows to shards — the
  // only physical knob is nParts (more, smaller shards). When retraction
  // traffic matters at 100 TB, the industry answer is a DELETION VECTOR:
  // forget appends doc ids to a tiny tombstone table (O(|F|) write I/O,
  // corpus-independent), every probe and presence check anti-joins the
  // broadcast tombstone set (bounded by retraction volume between
  // maintenance passes), and the next [[compactSignatureIndex]] settles
  // the debt physically — after it, the files hold no trace of the
  // forgotten docs. Logical-then-purge produces byte-equivalent verdicts
  // to the physical path at every point (spec-pinned); the trade is that
  // forgotten PAYLOADS remain on disk until compaction, which is the
  // documented retention contract of this path (use the physical op when
  // "gone from disk now" is required).

  private val tombSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT")

  private def tombstonePath(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")

  /** LOGICAL forget: append `removeIds` to the index's tombstone table —
    * O(|F|) write I/O, corpus-independent. Idempotent under at-least-once
    * replay (duplicate tombstone rows are harmless to the anti-joins and
    * collapsed at purge). Physical purge happens at the next
    * [[compactSignatureIndex]]. */
  def tombstoneInSignatureIndex(removeIds: DataFrame, indexPath: String): Unit = {
    // manifest presence = this is a writeSignatureIndex layout; fail
    // loudly otherwise instead of tombstoning a non-index
    readManifest(removeIds.sparkSession, indexPath): Unit
    removeIds.select(col("doc_id").cast("long").as("doc_id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$indexPath/tombstones")
  }

  /** Filters logically-forgotten docs out of `df` (anti-join on the
    * broadcast tombstone set) — a no-op plan when the index has no
    * tombstone table, so tombstone-free probes keep their exact shape. */
  private def antiTombstoned(df: DataFrame, indexPath: String): DataFrame = {
    val spark = df.sparkSession
    if (!hadoopFs(spark, indexPath).exists(tombstonePath(indexPath))) df
    else df.join(broadcast(
        spark.read.schema(tombSchema).parquet(s"$indexPath/tombstones")),
      Seq("doc_id"), "left_anti")
  }

  /** Compacts a persisted [[writeSignatureIndex]] layout: every APPEND
    * ([[dedupDeltaBatch]] evolution, [[removeFromSignatureIndex]]
    * rewrites) adds batch-sized files to shard directories, and probe
    * cost degrades with per-shard file count. Only shards holding at
    * least `minFiles` files are rewritten (read → one file per shard);
    * cost ∝ compacted shards' data, never index size, when appends are
    * localized. Content-preserving by construction — the spec pins row
    * equality and post-state file counts — EXCEPT that exact-duplicate
    * bands rows are collapsed: a crash between the two table writes of an
    * append leaves a retried batch's band rows duplicated (see
    * [[appendNewToSignatureIndex]]), and compaction is where that debt is
    * settled. Bands rows are (doc_id, bk) facts with no multiplicity
    * meaning, so the collapse is semantics-preserving; sigs rows are
    * never duplicated by that window and are preserved verbatim.
    *
    * Shard rewrite is the same crash-safe stage-then-swap as
    * [[removeFromSignatureIndex]] — the staged single-file-per-shard
    * content is fully on disk before any live dir is touched, and
    * [[recoverSignatureIndex]] covers a mid-swap crash. */
  def compactSignatureIndex(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, minFiles: Int = 2): Unit = {
    val fs = hadoopFs(spark, indexPath)
    recoverSignatureIndex(spark, indexPath)
    // settle the logical-forget debt first: purge tombstoned docs
    // physically (the crash-safe staged rewrite), then drop the tombstone
    // table. A crash between the two leaves the docs both purged AND
    // tombstoned — anti-joins no-op, and the next compaction finishes the
    // drop (idempotent). Single maintenance writer assumed, as for every
    // index-mutating op here (the foreachBatch serial contract).
    if (fs.exists(tombstonePath(indexPath))) {
      val ids = spark.read.schema(tombSchema).parquet(s"$indexPath/tombstones")
        .distinct().localCheckpoint(true) // settled: the purge outlives the table
      if (!ids.isEmpty) {
        val m = readManifest(spark, indexPath)
        removeFromSignatureIndex(ids, indexPath,
          m.nPerm, m.nBands, m.rowsPerBand, m.nParts)
      }
      fs.delete(tombstonePath(indexPath), true): Unit
    }
    for ((table, schema, ptCol) <- Seq(
        ("bands", bandsSchema, "band_pt"), ("sigs", sigsSchema, "doc_pt"))) {
      val tablePath = new org.apache.hadoop.fs.Path(s"$indexPath/$table")
      if (fs.exists(tablePath)) {
        val crowded = fs.listStatus(tablePath).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$ptCol="))
          .filter(d => fs.listStatus(d.getPath)
            .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) >= minFiles)
          .map(_.getPath.getName.stripPrefix(s"$ptCol=").toInt)
        if (crowded.nonEmpty) {
          val raw = spark.read.schema(schema).parquet(s"$indexPath/$table")
            .where(col(ptCol).isin(crowded: _*))
          // bands: collapse the exact duplicates a mid-append crash can
          // leave behind (see the doc comment above)
          val rows = if (table == "bands") raw.distinct() else raw
          stageShards(rows, s"$indexPath/$table", ptCol, crowded.size, crowded)
          swapShards(spark, s"$indexPath/$table", ptCol, crowded)
        }
      }
    }
  }

  /** [[dedupDeltaBatch]] against a PARTITIONED on-disk index
    * ([[writeSignatureIndex]] layout) with the index scan PRUNED to what
    * the batch can possibly collide with — the piece that makes the
    * per-batch cost stop being corpus-sized I/O:
    *
    *  1. the batch's distinct band keys (a bounded, batch-sized set) are
    *     hashed to their shard ids; the `bands/` scan carries a
    *     `band_pt IN (...)` partition filter (≤ nParts values, collected
    *     driver-side — never data-sized), so only collided shards' FILES
    *     are opened;
    *  2. within those shards, a BROADCAST left-semi join on the batch's
    *     band keys keeps only genuinely collided index rows — no shuffle
    *     of the index, ever; those surviving (doc_id, bk) rows ARE the
    *     corpus-side candidate bands (an index band absent from the batch
    *     can never pair), so the candidate join reuses them directly
    *     instead of re-deriving bands from the payload table;
    *  3. the `sigs/` verification fetch is restricted the same way:
    *     `doc_pt IN (...)` partition filter from the collided ids' shards
    *     plus a left-semi on the collided ids themselves.
    *
    * Verdicts are exactly [[dedupDeltaBatch]]'s: docs whose bands miss
    * every batch band key can never form a candidate pair, so dropping
    * them from the probe is lossless (equality vs the flat-index pass is
    * pinned by IncrementalDedupSpec).
    *
    * The returned frame is SETTLED (eager localCheckpoint) and the
    * intermediates this function persists are released before it returns
    * — per-micro-batch callers accumulate no CacheManager entries.
    * `batchSigs` feeds two candidate arms and a verification join; the
    * CALLER should persist it (and owns its release) if it also uses the
    * signatures afterwards, as the index-append path does. */
  def dedupDeltaBatchPruned(batchIds: DataFrame, batchSigs: DataFrame,
                            indexPath: String, minJac: Double,
                            nParts: Int = IndexParts,
                            excludeOwnIds: Boolean = false): DataFrame = {
    val (verdicts, cached) = dedupDeltaBatchPrunedPlan(
      batchIds, batchSigs, indexPath, minJac, nParts, excludeOwnIds)
    val out = verdicts.localCheckpoint(true)
    cached.foreach(_.unpersist(): Unit)
    out
  }

  /** The LAZY probe plan behind [[dedupDeltaBatchPruned]], plus the
    * intermediates it persisted (released by the settled wrapper; a
    * direct caller owns them). Exists so the plan pins (PlanSpec,
    * IncrementalDedupSpec) can inspect the exact frame the settled path
    * materializes — after the checkpoint, the executed plan is just an
    * RDD scan and the partition-filter/broadcast-semi shape is invisible. */
  private[graft] def dedupDeltaBatchPrunedPlan(
      batchIds: DataFrame, batchSigs: DataFrame,
      indexPath: String, minJac: Double,
      nParts: Int = IndexParts,
      excludeOwnIds: Boolean = false): (DataFrame, Seq[DataFrame]) = {
    val spark = batchIds.sparkSession
    val mParts = readManifest(spark, indexPath).nParts
    require(mParts == nParts,
      s"signature index at $indexPath has nParts=$mParts, probe supplied " +
        s"$nParts — the band_pt/doc_pt partition filters would miss shards")
    val bs = batchSigs
    val batchBands = bs.select(explode(col("bands")).as("bk")).distinct().persist()
    val pts = batchBands
      .select(pmod(xxhash64(col("bk")), lit(nParts.toLong)).cast("int").as("band_pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    // persisted: feeds both the doc_pt prune below and the candidate
    // join; collided-rows-sized — batch-proportional, never corpus-
    // proportional
    // logically-forgotten docs must not act as corpus partners: anti-join
    // the broadcast tombstone set (plan-neutral when no tombstones exist)
    val bandsMatchedRaw = antiTombstoned(
      spark.read.schema(bandsSchema).parquet(s"$indexPath/bands")
        .where(col("band_pt").isin(pts: _*))
        .join(broadcast(batchBands), Seq("bk"), "left_semi")
        .select("doc_id", "bk"), indexPath)
    // excludeOwnIds: a RETRIED batch whose kept signatures were already
    // appended must not see its own attempt's index rows — beyond the
    // self-pair guard, a larger-id batch doc indexed by the failed
    // attempt would qualify as an unordered "corpus" partner and flip a
    // keep to a drop on replay (streaming twin contract). Broadcast
    // anti on the batch's own ids — batch-sized, never corpus-sized.
    val bandsMatched = (if (excludeOwnIds)
      bandsMatchedRaw.join(broadcast(batchIds
          .select(col("doc_id").cast("long").as("doc_id"))),
        Seq("doc_id"), "left_anti")
    else bandsMatchedRaw).persist()
    val collided = bandsMatched.select("doc_id").distinct()
    val dpts = collided
      .select(pmod(col("doc_id"), lit(nParts.toLong)).cast("int").as("doc_pt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val prunedHs = spark.read.schema(sigsSchema).parquet(s"$indexPath/sigs")
      .where(col("doc_pt").isin(dpts: _*))
      .join(collided, Seq("doc_id"), "left_semi")
      .select("doc_id", "hs")
    (dedupDeltaCore(batchIds, bs, bandsMatched, prunedHs, minJac),
      Seq(batchBands, bandsMatched))
  }

  /** Incremental near-dup verdicts for a NEW BATCH against a persisted
    * corpus signature index — the delta-dedup step that never recomputes
    * the ingested corpus: candidates are (batch × index) plus
    * (batch × earlier-batch-row) band-key equi-joins, verification is
    * exact Jaccard over the stored shingle sets, and the per-document
    * decision is "drop iff it near-dups any indexed doc or any
    * SMALLER-id doc of the same batch" (arrival order within the batch).
    *
    * Returns one row per `batchIds` doc: (doc_id, verdict keep|drop,
    * matched_id, matched_jac_e4, matched_in corpus|batch|none), where
    * matched_id is the SMALLEST qualifying partner id (deterministic).
    *
    * Scale shape: the index is probed by band-key equi-join only — cost ∝
    * batch size + collided-bucket membership, never corpus size; with the
    * [[writeSignatureIndex]] layout, [[dedupDeltaBatchPruned]] additionally
    * prunes the index SCAN itself to collided shards.
    * `batchSigs` is persisted here: it feeds both candidate arms and both
    * verification joins. */
  def dedupDeltaBatch(batchIds: DataFrame, batchSigs: DataFrame,
                      indexSigs: DataFrame, minJac: Double): DataFrame = {
    val bs = batchSigs.persist()
    dedupDeltaCore(batchIds, bs,
      indexSigs.select(col("doc_id"), explode(col("bands")).as("bk")),
      indexSigs.select("doc_id", "hs"), minJac)
  }

  /** Shared delta-dedup core: `iBand` is the corpus-side candidate band
    * rows (doc_id, bk) — the full index exploded for the flat path, or
    * just the batch-collided rows for the pruned path (equivalent: an
    * index band with no batch match joins nothing) — and `idxHs` the
    * (doc_id, hs) verification payloads covering at least every `iBand`
    * doc. `bs` must already be persisted: it feeds both candidate arms
    * and the batch-side verification join. */
  private def dedupDeltaCore(batchIds: DataFrame, bs: DataFrame,
                             iBand: DataFrame, idxHs: DataFrame,
                             minJac: Double): DataFrame = {
    val bBand = bs.select(col("doc_id"), explode(col("bands")).as("bk"))
    // batch-vs-corpus: unordered (the corpus partner qualifies regardless
    // of id order); batch-vs-batch: earlier (smaller id) doc wins
    val candCorpus = bBand.select(col("doc_id").as("id_d"), col("bk"))
      .join(iBand.select(col("doc_id").as("id_p"), col("bk")), Seq("bk"))
      // self-match guard: a retried batch whose kept signatures were
      // already appended to the index would otherwise match itself at
      // Jaccard 1.0 and be wrongly dropped against its own index row
      .where(col("id_d") =!= col("id_p"))
      .select("id_d", "id_p").distinct()
      .withColumn("src", lit("corpus"))
    val candBatch = bucketPairs(bBand, "doc_id", "bk")
      .select(col("id_r").as("id_d"), col("id_l").as("id_p"))
      .withColumn("src", lit("batch"))
    val partnerHs = bs.select(col("doc_id").as("id_p"), col("hs").as("hs_p"))
      .unionByName(idxHs.select(col("doc_id").as("id_p"), col("hs").as("hs_p")))
    val verified = candCorpus.unionByName(candBatch)
      .join(bs.select(col("doc_id").as("id_d"), col("hs").as("hs_d")), Seq("id_d"))
      .join(partnerHs, Seq("id_p"))
      .withColumn("inter", intersectSizeSorted(col("hs_d"), col("hs_p")))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("hs_d")) + size(col("hs_p")) - col("inter")))
      .where(col("jac") >= minJac)
      .withColumn("jac_e4", round(col("jac") * 10000).cast("long"))
    // smallest qualifying partner = min over the (id_p-first) struct;
    // (id_d, id_p) is unique across both arms (corpus and batch partner
    // id spaces are disjoint), so the struct min is total
    val best = verified.groupBy("id_d")
      .agg(min(struct(col("id_p"), col("jac_e4"), col("src"))).as("b"))
    batchIds.select(col("doc_id").cast("long").as("doc_id"))
      .join(best.withColumnRenamed("id_d", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("b").isNull, "keep").otherwise("drop").as("verdict"),
        coalesce(col("b.id_p"), lit(-1L)).as("matched_id"),
        coalesce(col("b.jac_e4"), lit(-1L)).as("matched_jac_e4"),
        coalesce(col("b.src"), lit("none")).as("matched_in"))
  }

  // ----- incremental near-dup cluster store --------------------------------
  //
  // [[connectedComponents]] labels a STATIC pair set; production keeps the
  // labels as state and folds each micro-batch's near-dup pairs in — the
  // missing incremental piece between per-batch verdicts
  // ([[dedupDeltaBatchPruned]]) and corpus-wide keep/drop decisions. The
  // store is two sharded tables (the signature-index idiom):
  //
  //  - `by_doc/doc_pt=K`      — (doc_id, cluster_id), the LOOKUP side: a
  //    batch resolves its endpoints' labels with a doc_pt partition filter
  //    + broadcast semi (batch-shard-sized I/O, never store-sized);
  //  - `by_cluster/cluster_pt=K` — (cluster_id, doc_id), the MERGE side:
  //    when clusters merge, the losing clusters' members are enumerated
  //    with a cluster_pt filter and only affected shards are rewritten.
  //
  // Merging contracts each existing component to its label node (labels
  // are min-member ids, so min-root union-find over {labels} ∪ {batch ids}
  // reproduces min-reachable-id over the FULL edge history — the catalog
  // entry proves equality to the from-scratch recompute cross-engine).
  // The contracted graph is batch-grain (batch pairs + touched labels), so
  // the driver union-find is bounded by the micro-batch, never the corpus;
  // member relabeling stays distributed. Shard rewrites are the crash-safe
  // stage-then-swap with `_pts` manifests: both tables stage completely
  // before either swaps, so a crash anywhere rolls FORWARD to the merged
  // state ([[recoverClusterStore]] at open). Replay-idempotent: a retried
  // batch finds its roots already merged and its docs already present, and
  // writes nothing.

  private val byDocSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, cluster_id BIGINT, doc_pt INT")
  private val byClusterSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "cluster_id BIGINT, doc_id BIGINT, cluster_pt INT")

  /** Rolls both cluster-store tables to a rewrite boundary (the
    * [[recoverSignatureIndex]] sibling); run at store open. */
  def recoverClusterStore(spark: org.apache.spark.sql.SparkSession,
                          storePath: String): Unit =
    for ((t, pt) <- Seq(("by_doc", "doc_pt"), ("by_cluster", "cluster_pt")))
      recoverTable(spark, s"$storePath/$t", pt)

  private def clusterManifestFile(storePath: String) =
    new org.apache.hadoop.fs.Path(s"$storePath/_manifest.json")

  private def readClusterManifest(spark: org.apache.spark.sql.SparkSession,
                                  storePath: String): Int = {
    val fs = hadoopFs(spark, storePath)
    require(fs.exists(clusterManifestFile(storePath)),
      s"cluster store at $storePath has no manifest — not a mergeClustersBatch " +
        "layout (or an incomplete bootstrap)")
    val in = fs.open(clusterManifestFile(storePath))
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    "\"nParts\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"cluster-store manifest at $storePath missing 'nParts': $s"))
  }

  private def writeClusterStore(labels: DataFrame, storePath: String,
                                nParts: Int): Unit = {
    val spark = labels.sparkSession
    val l = labels.persist()
    try {
      l.select(col("doc_id"), col("cluster_id"))
        .withColumn("doc_pt", pmod(col("doc_id"), lit(nParts.toLong)).cast("int"))
        .repartition(nParts, col("doc_pt"))
        .write.mode("overwrite").partitionBy("doc_pt").parquet(s"$storePath/by_doc")
      l.select(col("cluster_id"), col("doc_id"))
        .withColumn("cluster_pt", pmod(col("cluster_id"), lit(nParts.toLong)).cast("int"))
        .repartition(nParts, col("cluster_pt"))
        .write.mode("overwrite").partitionBy("cluster_pt").parquet(s"$storePath/by_cluster")
    } finally l.unpersist()
    // manifest written LAST: a readable manifest implies a complete bootstrap
    val out = hadoopFs(spark, storePath).create(clusterManifestFile(storePath), true)
    try out.write(s"""{"nParts":$nParts}""".getBytes("UTF-8")) finally out.close()
  }

  /** Folds one micro-batch of near-dup PAIRS (and its node set) into the
    * persisted cluster store — incremental connected components with the
    * min-member-id labeling of [[connectedComponents]] (the catalog entry
    * pins equality to the from-scratch recompute against the DuckDB
    * recursive-CTE oracle). First call bootstraps the store. Returns one
    * (doc_id, cluster_id) row per batch node — the batch's final labels.
    *
    * `nodes` needs column `id`; `pairs` columns `id_l`,`id_r` (either
    * endpoint may be new or already stored). Batch-grain driver state
    * only (pairs + touched labels, guarded by `driverPairLimit`); member
    * relabeling is a distributed, shard-pruned staged rewrite. */
  def mergeClustersBatch(nodes: DataFrame, pairs: DataFrame, storePath: String,
                         nParts: Int = IndexParts,
                         driverPairLimit: Long = 1000000L): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    recoverClusterStore(spark, storePath)
    val ns = nodes.select(col("id").cast("long").as("id")).distinct()
    val ps = pairs.select(col("id_l").cast("long").as("id_l"),
      col("id_r").cast("long").as("id_r")).distinct()
    val fs = hadoopFs(spark, storePath)
    if (!fs.exists(new org.apache.hadoop.fs.Path(storePath)) ||
        !fs.exists(clusterManifestFile(storePath))) {
      val allNodes = ns.union(ps.select(col("id_l").as("id")))
        .union(ps.select(col("id_r").as("id"))).distinct()
      val cc = connectedComponents(allNodes, ps)
        .select(col("node").as("doc_id"), col("cluster_id"))
        .localCheckpoint(true)
      writeClusterStore(cc, storePath, nParts)
      return cc.join(ns.select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
    }
    val mParts = readClusterManifest(spark, storePath)
    require(mParts == nParts,
      s"cluster store at $storePath has nParts=$mParts, caller supplied $nParts" +
        " — partition pruning would miss shards")
    // batch-grain driver state: pairs + node ids, guarded
    val pairRows = ps.collect().map(r => (r.getLong(0), r.getLong(1)))
    require(pairRows.length <= driverPairLimit,
      s"mergeClustersBatch: ${pairRows.length} pairs exceeds driverPairLimit=" +
        s"$driverPairLimit — split the batch")
    val nodeIds = ns.collect().map(_.getLong(0))
    val touched = (nodeIds ++ pairRows.flatMap(p => Seq(p._1, p._2))).distinct
    if (touched.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, cluster_id BIGINT"))
    // resolve touched ids' existing labels: doc_pt prune + broadcast semi
    val dpts = touched.map(id => (((id % nParts) + nParts) % nParts).toInt).distinct.toSeq
    val known: Map[Long, Long] = spark.read.schema(byDocSchema)
      .parquet(s"$storePath/by_doc")
      .where(col("doc_pt").isin(dpts: _*))
      .join(broadcast(touched.toSeq.toDF("doc_id")), Seq("doc_id"), "left_semi")
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contracted union-find over {labels} ∪ {new ids} — min-root, so the
    // final labels are min-reachable-id over the full edge history
    val parent = new java.util.HashMap[Long, Long]()
    def add(x: Long): Unit = { parent.putIfAbsent(x, x): Unit }
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    def rep(id: Long): Long = known.getOrElse(id, id)
    touched.foreach(id => add(rep(id)))
    pairRows.foreach { case (l, r) =>
      val (a, b) = (find(rep(l)), find(rep(r)))
      if (a != b) { if (a < b) parent.put(b, a) else parent.put(a, b) }
    }
    import scala.jdk.CollectionConverters._
    val rootOf: Map[Long, Long] =
      parent.keySet().asScala.map(k => k -> find(k)).toMap
    // losers: stored labels whose component now has a smaller root (their
    // members must relabel); newDocs: touched ids absent from the store
    val losers = known.values.toSet.filter(l => rootOf(l) != l)
    val newDocs = touched.filterNot(known.contains)
      .map(id => (id, rootOf(rep(id)))).toSeq
    val receipt = nodeIds.map(id => (id, rootOf(find(rep(id))))).toSeq
      .toDF("doc_id", "cluster_id")
    if (losers.isEmpty && newDocs.isEmpty) return receipt
    val remap = losers.toSeq.map(l => (l, rootOf(l))).toDF("cluster_id", "__root")
    // every component that changed contributes its final root's shard
    val finalRoots = (losers.map(rootOf) ++ newDocs.map(_._2)).toSeq.distinct
    def ptOf(id: Long) = (((id % nParts) + nParts) % nParts).toInt
    // phase 0 (settled reads): the losing clusters' members — needed for
    // the by_doc rewrite's shard list — are read from live dirs and
    // settled BEFORE any staging/swap touches the store
    val loserPts = losers.map(ptOf).toSeq.distinct
    val loserMembers = if (losers.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT"))
    else spark.read.schema(byClusterSchema).parquet(s"$storePath/by_cluster")
      .where(col("cluster_pt").isin(loserPts: _*))
      .join(broadcast(losers.toSeq.toDF("cluster_id")), Seq("cluster_id"), "left_semi")
      .select("doc_id").localCheckpoint(true)
    val docPts = (loserMembers.select(
        pmod(col("doc_id"), lit(nParts.toLong)).cast("int").as("pt"))
      .distinct().collect().map(_.getInt(0)) ++ newDocs.map(d => ptOf(d._1)))
      .distinct.toSeq
    // phase 1 (stage both tables completely, live dirs untouched)
    val clusterPts = (loserPts ++ finalRoots.map(ptOf)).distinct
    val newRows = newDocs.toDF("doc_id", "cluster_id")
    val byClusterKept = spark.read.schema(byClusterSchema)
      .parquet(s"$storePath/by_cluster")
      .where(col("cluster_pt").isin(clusterPts: _*))
      .join(broadcast(remap), Seq("cluster_id"), "left")
      .select(coalesce(col("__root"), col("cluster_id")).as("cluster_id"),
        col("doc_id"))
      .unionByName(newRows.select(col("cluster_id"), col("doc_id")))
      .withColumn("cluster_pt", pmod(col("cluster_id"), lit(nParts.toLong)).cast("int"))
    stageShards(byClusterKept, s"$storePath/by_cluster", "cluster_pt",
      math.min(nParts, clusterPts.size), clusterPts)
    val byDocKept = spark.read.schema(byDocSchema).parquet(s"$storePath/by_doc")
      .where(col("doc_pt").isin(docPts: _*))
      .join(broadcast(remap), Seq("cluster_id"), "left")
      .select(col("doc_id"), coalesce(col("__root"), col("cluster_id")).as("cluster_id"))
      .unionByName(newRows)
      .withColumn("doc_pt", pmod(col("doc_id"), lit(nParts.toLong)).cast("int"))
    stageShards(byDocKept, s"$storePath/by_doc", "doc_pt",
      math.min(nParts, docPts.size), docPts)
    // phase 2: both stagings are complete, so a crash anywhere from here
    // rolls FORWARD to the merged state at the next open
    swapShards(spark, s"$storePath/by_cluster", "cluster_pt", clusterPts)
    swapShards(spark, s"$storePath/by_doc", "doc_pt", docPts)
    receipt
  }

  /** Small-graph path: min-root union-find on the driver. The root of each
    * tree is always its component's minimum id (union attaches the larger
    * root under the smaller), so labels equal min-reachable-id exactly. */
  private def ccViaDriver(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    pairs.collect().foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val spark = nodes.sparkSession
    import scala.jdk.CollectionConverters._
    val labels = parent.keySet().asScala.toSeq.map(k => (k, find(k)))
    import spark.implicits._
    val labelDf = labels.toDF("node", "__cc_label")
    nodes.select(col("id").as("node"))
      .join(broadcast(labelDf), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__cc_label"), col("node")).as("cluster_id"))
  }
}
