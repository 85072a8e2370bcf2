package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in strategies: as-of (point-in-time)
  * lookup and radius/interval joins — both expressed as shuffle-bounded
  * built-in plans (union+window, bucket equi-join) rather than O(n·m)
  * theta joins, which is the shape that survives 100 TB.
  */
object JoinOps {

  /** As-of lookup: for every left row, the greatest `rightTs` of a right
    * row with the same keys and rightTs ≤ leftTs (null if none).
    *
    * Implemented as the classic merge formulation: union the two sides
    * tagged, sort within key by (ts, side) via one window, and carry the
    * last seen right timestamp forward — ONE shuffle on the keys, no
    * range-join explosion. Right rows at exactly leftTs are visible
    * (ties order right before left).
    *
    * Returns the left rows + `asof_ts` column.
    */
  def asofLookup(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__isR", lit(0))
      .withColumn("__rts", lit(null).cast(left.schema(leftTs).dataType))
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(1).as("__isR"), col(rightTs).as("__rts")): _*)
    // align schemas in ONE projection: right side carries nulls for
    // non-key left columns (a withColumn-per-column fold would build
    // O(columns) nested Projects)
    val rAligned = r2.select(
      lCols.toIndexedSeq.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__isR"), col("__rts")): _*)
    val unioned = l2.select(lCols.toIndexedSeq.map(col) ++ Seq(col("__ts"), col("__isR"), col("__rts")): _*)
      .unionByName(rAligned)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .where(col("__isR") === 0)
      .drop("__ts", "__isR", "__rts")
  }

  /** Size-based as-of formulation selection, mirroring how Catalyst picks
    * broadcast-vs-shuffle for equi-joins: if the timeline's OPTIMIZED-plan
    * size estimate fits `spark.sql.autoBroadcastJoinThreshold`, plan the
    * custom broadcast operator (graft.plans.AsOfJoin — zero probe-side
    * shuffle); otherwise fall back to the union+window merge
    * ([[asofLookup]] + value join-back — everything distributed, one
    * shuffle on the keys). Both paths return the left rows + the right
    * `values` columns, so callers can switch freely. `values` names must
    * not collide with left column names (checked). */
  def asofAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, values: Seq[String]): DataFrame = {
    val clash = values.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"asofAuto: value columns $clash collide with left columns")
    require(!left.columns.contains("asof_ts"),
      "asofAuto: left must not already have an `asof_ts` column")
    // the shuffle fallback renames rightTs to asof_ts before selecting the
    // value columns, so a values list containing rightTs only works on the
    // broadcast path — refuse it so behavior can't flip with the threshold
    require(!values.contains(rightTs),
      s"asofAuto: `$rightTs` cannot appear in values (it is returned as `asof_ts`)")
    val thresholdStr =
      left.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val threshold = // "-1" (disabled) is not byte-string syntax
      if (thresholdStr.trim.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thresholdStr)
    val rightSize = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold >= 0 && rightSize <= threshold)
      graft.plans.AsOfJoin(left, right, keys, leftTs, rightTs, values)
    else {
      // drop null-KEY timeline rows up front — the broadcast path does the
      // same (SQL `=` semantics: a null key never matches), so the two
      // formulations stay interchangeable for null-keyed data
      val rKeyed =
        if (keys.isEmpty) right
        else right.where(keys.map(col(_).isNotNull).reduce(_ && _))
      val matchedTs = asofLookup(left, rKeyed.selectExpr((keys :+ rightTs).map(c => s"`$c`"): _*),
        keys, leftTs, rightTs)
      // drop null-ts timeline rows (they can never be as-of matches — same
      // rule the broadcast exec applies) and join back NULL-SAFELY on the
      // keys, so null keys behave identically in both formulations
      val timeline = rKeyed.select((keys :+ rightTs).map(col) ++ values.map(col): _*)
        .where(col(rightTs).isNotNull)
        .withColumnRenamed(rightTs, "asof_ts")
      // prefix-alias the timeline (fresh expr-ids): left and right often
      // derive from the same scan, and same-id columns make the join-back
      // ambiguous
      val tl = timeline.select(
        timeline.columns.toIndexedSeq.map(c => col(c).as("__tl_" + c)): _*)
      val cond = (keys :+ "asof_ts")
        .map(c => matchedTs(c) <=> col("__tl_" + c)).reduce(_ && _)
      matchedTs.join(tl, cond, "left")
        .select(left.columns.toIndexedSeq.map(matchedTs(_)) ++
          values.map(v => col("__tl_" + v).as(v)): _*)
    }
  }

  /** Radius join on a timestamp axis: pairs (l, r) with
    * |ts_l − ts_r| ≤ radiusMicros. Buckets both sides into radius-sized
    * epochs and equi-joins each left bucket to {b−1, b, b+1} — turns the
    * inequality theta join into a bounded equi-join + residual filter
    * (same grid trick as GeoOps.distanceBandJoin, on the time axis). */
  def timeRadiusJoin(left: DataFrame, right: DataFrame, leftTs: String,
                     rightTs: String, radiusMicros: Long): DataFrame = {
    // exact integer bucket (SQL `div`): Column `/` is double division and
    // can land one ulp across a bucket boundary
    val lB = left.withColumn("__b", expr(s"unix_micros($leftTs) div ${radiusMicros}L"))
    val offsets = array(lit(-1L), lit(0L), lit(1L))
    val rB = right
      .withColumn("__d", explode(offsets))
      .withColumn("__b", expr(s"unix_micros($rightTs) div ${radiusMicros}L") + col("__d"))
      .drop("__d")
    lB.join(rB, Seq("__b"))
      .where(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= radiusMicros)
      .drop("__b")
  }

  /** Bloom-filter semi-join reduction: build a Bloom filter over the (small,
    * already-filtered) dim side's long key, broadcast it, and pre-filter the
    * fact side BEFORE the equi-join. The join re-verifies every survivor, so
    * false positives cost only wasted shuffle rows — the result is exactly
    * the plain join.
    *
    * At 100 TB this is the semi-join reduction AQE's runtime row-level
    * filters apply automatically to some plans: a KB–MB bitset prunes the
    * fact at the scan/map side, so the shuffle moves only rows that can
    * match. The explicit form also covers shapes AQE won't inject into
    * (multi-stage pipelines, keyed sinks, non-equi residuals). */
  def bloomPruneJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, expectedItems: Long,
                     fpp: Double): DataFrame = {
    // building the filter is inherently eager (an aggregation job over dim
    // runs at construction time — dim is the SMALL side, so this is cheap);
    // a filter aggregated over zero non-null keys carries a null bitset and
    // NPEs on probe, so that case is guarded explicitly and skips the prune
    // (the plain join of an empty dim is empty anyway)
    val hasKeys = !dim.where(col(dimKey).isNotNull).isEmpty
    val pruned = if (!hasKeys) fact else {
      val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
      val bc = fact.sparkSession.sparkContext.broadcast(bf)
      val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      fact.where(might(col(factKey)))
    }
    pruned.join(dim, col(factKey) === col(dimKey))
  }
}
