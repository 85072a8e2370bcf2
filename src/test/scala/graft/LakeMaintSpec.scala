package graft

import org.apache.spark.sql.functions._
import graft.queries.SourceQueries

/** Invariant checks for the lake-maintenance planners (the oracle gate
  * checks engine parity; this spec checks the plans mean what they claim). */
class LakeMaintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q_compaction_plan: bins are contiguous day ranges covering all bytes") {
    val bins = SourceQueries.compactionPlan.run(spark, dir).collect()
    assert(bins.nonEmpty)
    // bin ids are dense from 0 and day ranges are disjoint and ordered
    assert(bins.map(_.getAs[Long]("bin")).toSeq === bins.indices.map(_.toLong))
    bins.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[java.sql.Date]("last_day").before(
          hi.getAs[java.sql.Date]("first_day")), "bin day ranges overlap")
      case _ => ()
    }
    // plan conserves bytes: bin totals equal the per-day manifest total
    val total = Tables.events(spark, dir)
      .groupBy(to_date(col("ts"))).agg(
        (sum(length(col("props")).cast("long")) + count(lit(1)) * 32L).as("s"))
      .agg(sum("s")).collect().head.getLong(0)
    assert(bins.map(_.getAs[Long]("bin_bytes")).sum === total)
  }

  test("q_dq_checks: pass flag is count-consistent and both paths exercised") {
    val rows = SourceQueries.dqChecks.run(spark, dir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("n_violations") == 0L) 1L else 0L
      assert(r.getAs[Long]("passed") === expected, s"flag inconsistent: $r")
    }
    // the deliberately-tight discount rule must fail; the FK rules must pass
    assert(rows.exists(r => r.getAs[Long]("passed") == 0L), "no rule failed")
    assert(rows.count(_.getAs[Long]("passed") == 1L) === 5)
  }

  test("q_cdc_replay: replayed state matches a driver-side log replay") {
    val rows = graft.queries.AdvancedQueries.qCdcReplay.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        graft.queries.Q.cents(col("o_totalprice")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byStatus = orders.groupBy(_._2)
    rows.foreach { r =>
      val os = byStatus(r.getAs[String]("o_orderstatus"))
      val deleted = os.count(_._1 % 5 == 0)
      val live = os.filterNot(_._1 % 5 == 0)
      assert(r.getAs[Long]("n_deleted") === deleted.toLong)
      assert(r.getAs[Long]("n_live") === live.length.toLong)
      val cents = live.map { case (k, _, v) => if (k % 3 == 0) v + 1000L else v }.sum
      assert(r.getAs[Long]("live_cents") === cents, s"replayed value drifted: $r")
    }
  }

  test("q_table_profile: consistent row counts, exact NDV bounded by rows") {
    val rows = SourceQueries.tableProfile.run(spark, dir).collect()
    assert(rows.length === 4)
    val nRows = rows.map(_.getAs[Long]("n_rows")).distinct
    assert(nRows.length === 1, "profiled columns disagree on table size")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_nulls") === 0L)
      val (mn, mx) = (r.getAs[String]("min_val"), r.getAs[String]("max_val"))
      r.getAs[String]("column_name") match {
        case "l_orderkey" | "l_partkey" => assert(mn.toLong <= mx.toLong)
        case _ => assert(mn <= mx) // string / ISO-date: lexicographic is semantic
      }
    }
  }

  test("deleteWhere: targeted rows gone, others byte-identical, emptied partition dropped") {
    import java.nio.file.{Files, Paths}
    import graft.ops.Sinks
    val base = Files.createTempDirectory("graft-del").toString + "/snap"
    // partitioned snapshot: events by day
    val ev = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")).cast("string"))
    Sinks.writePartitioned(ev, base, Seq("day"))
    val before = spark.read.parquet(base)
    val totalBefore = before.count()
    // pick a victim user
    val victim = before.select("user_id").head.getLong(0)
    // record an untouched partition's file listing + sizes
    // NB: hive partition-column inference reads `day` back as DATE
    val untouchedDay = before.where(col("user_id") =!= victim)
      .select("day").except(before.where(col("user_id") === victim).select("day"))
      .head.get(0).toString
    def listing(day: String) =
      Files.list(Paths.get(s"$base/day=$day")).toArray.map(_.toString).sorted.toSeq
    val untouchedBefore = listing(untouchedDay)
    val expectDeleted = before.where(col("user_id") === victim).count()
    val deleted = Sinks.deleteWhere(spark, base, col("user_id") === victim, Seq("day"))
    assert(deleted === expectDeleted)
    val after = spark.read.parquet(base)
    assert(after.where(col("user_id") === victim).count() === 0L, "victim rows remain")
    assert(after.count() === totalBefore - deleted, "non-victim rows lost")
    assert(listing(untouchedDay) === untouchedBefore,
      "untouched partition was rewritten")
    // a delete that empties a whole partition must remove its directory
    // (predicate on the partition column empties day=untouchedDay exactly)
    val fullDayDeleted = Sinks.deleteWhere(spark, base,
      col("day") === untouchedDay, Seq("day"))
    assert(fullDayDeleted > 0L)
    assert(!Files.exists(Paths.get(s"$base/day=$untouchedDay")),
      "fully-emptied partition directory not removed")
    // NULL-evaluating predicate deletes nothing
    val n0 = Sinks.deleteWhere(spark, base,
      org.apache.spark.sql.functions.lit(null).cast("boolean"), Seq("day"))
    assert(n0 === 0L)
    assert(spark.read.parquet(base).count() === totalBefore - deleted - fullDayDeleted)
  }

  test("deleteWhere: hive-escaped and NULL partition values still cleaned up") {
    import java.nio.file.{Files, Paths}
    import graft.ops.Sinks
    import spark.implicits._
    val base = Files.createTempDirectory("graft-del-esc").toString + "/snap"
    // partition values that exercise Spark's hive-style escaping (space,
    // colon) and the null → __HIVE_DEFAULT_PARTITION__ rendering — a raw
    // "col=value" directory name matches NONE of these on disk
    val rows = Seq(
      (1L, "US east"), (2L, "US east"),
      (3L, "a:b"), (4L, "a:b"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]),
      (7L, "plain"))
      .toDF("id", "zone")
    Sinks.writePartitioned(rows, base, Seq("zone"))
    assert(Files.exists(Paths.get(s"$base/zone=__HIVE_DEFAULT_PARTITION__")))
    // empty out each tricky partition entirely: its escaped directory
    // must be REMOVED, not silently stranded
    val d1 = Sinks.deleteWhere(spark, base, col("id") <= 2L, Seq("zone"))
    assert(d1 === 2L)
    assert(!Files.list(Paths.get(base)).toArray.map(_.toString)
      .exists(_.contains("US%20east")),
      "escaped-space partition directory survived a full delete")
    val d2 = Sinks.deleteWhere(spark, base, col("id").isin(3L, 4L), Seq("zone"))
    assert(d2 === 2L)
    assert(!Files.list(Paths.get(base)).toArray.map(_.toString)
      .exists(_.contains("a%3Ab")),
      "escaped-colon partition directory survived a full delete")
    val d3 = Sinks.deleteWhere(spark, base, col("zone").isNull, Seq("zone"))
    assert(d3 === 2L)
    assert(!Files.exists(Paths.get(s"$base/zone=__HIVE_DEFAULT_PARTITION__")),
      "null partition directory survived a full delete")
    val left = spark.read.parquet(base)
    assert(left.count() === 1L && left.head.getLong(0) === 7L)
  }
}
