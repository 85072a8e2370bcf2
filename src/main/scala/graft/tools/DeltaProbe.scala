package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DedupOps
import graft.queries.DedupQueries._

/** Scratch stage-timer for the dedup_delta_batch2 protocol
  * (args = sfDir [nParts]). Times each stage of the two-batch
  * bootstrap/probe/append/probe flow separately so regressions can be
  * attributed (round 13: found the doubled signature computation and the
  * per-shard small-file overhead). Not part of the catalog. */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val np = if (args.length > 1) args(1).toInt else TestIndexParts
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config(graft.Sessions.defaults)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[delta] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def part(m: Int) = docs.where(col("doc_id") % 3 === m)
    val indexPath = graft.ops.Staging.dir("/tmp/graft_dedup_index", dir, "probe_evo")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (nParts=$np)")
      val corpusSigs = t("corpus sigs (lazy)") {
        DedupOps.signatureIndex(part(0), ShingleK, NumPerms, NumBands, RowsPerBand)
      }
      t("bootstrap write")(DedupOps.writeSignatureIndex(
        corpusSigs, indexPath, NumPerms, NumBands, RowsPerBand, nParts = np))
      val b1 = t("b1 sigs (lazy+persist)") {
        DedupOps.signatureIndex(part(1), ShingleK, NumPerms, NumBands, RowsPerBand).persist()
      }
      val kept1 = t("delta1 + kept collect") {
        val k = DedupOps.dedupDeltaBatchPruned(
            part(1).select("doc_id"), b1, indexPath, JaccardThreshold, nParts = np)
          .where(col("verdict") === "keep").select("doc_id").persist()
        k.count(); k
      }
      t("append kept1") {
        DedupOps.writeSignatureIndex(
          b1.join(kept1, Seq("doc_id"), "left_semi"), indexPath,
          NumPerms, NumBands, RowsPerBand, mode = "append", nParts = np)
      }
      val b2 = t("b2 sigs (lazy+persist)") {
        DedupOps.signatureIndex(part(2), ShingleK, NumPerms, NumBands, RowsPerBand).persist()
      }
      t("delta2 full") {
        DedupOps.dedupDeltaBatchPruned(
            part(2).select("doc_id"), b2, indexPath, JaccardThreshold, nParts = np)
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
