package graft

import graft.queries.LayoutQueries

/** Round-10 wave 28: z-order layout planning — a full driver recompute of
  * the Morton interleave, zone maps, and pruning workload on sf0.001,
  * plus a bit-level check of the interleave kernel and the economic
  * property the family exists to demonstrate (z-order strictly dominates
  * the time layout on user-range probes).
  */
class Wave28QueriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def morton(u: Long, d: Long): Long =
    (0 until 16).map(i => (((u >> i) & 1L) << (2 * i)) | (((d >> i) & 1L) << (2 * i + 1)))
      .reduce(_ | _)

  private def quantized: Seq[(Long, Long)] = {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(datediff(to_date(ts), DATE '1970-01-01') AS LONG) AS eday")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (uLo, uHi) = (ev.map(_._1).min, ev.map(_._1).max)
    val (dLo, dHi) = (ev.map(_._2).min, ev.map(_._2).max)
    ev.map { case (u, d) =>
      ((u - uLo) * 65536L / (uHi - uLo + 1), (d - dLo) * 65536L / (dHi - dLo + 1))
    }
  }

  test("the shared zExpr kernel IS bit interleave (crafted and random values)") {
    val vals = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (43690L, 21845L)) ++
      (0 until 50).map(i => ((i * 2654435761L) % 65536L, (i * 40503L) % 65536L))
    val got = vals.toDF("u16", "d16")
      .selectExpr(s"${LayoutQueries.zExpr("u16", "d16")} AS z")
      .collect().map(_.getLong(0))
    vals.zip(got).foreach { case ((u, d), z) =>
      assert(z == morton(u, d), s"zExpr($u, $d) = $z, want ${morton(u, d)}")
    }
    // even/odd bit lanes never collide
    assert(morton(65535L, 0L) == 0x55555555L && morton(0L, 65535L) == 0xAAAAAAAAL)
  }

  test("q_zonemap_layouts matches a driver recompute of both layouts' zone maps") {
    val q = quantized
    def maps(assign: ((Long, Long)) => Long, layout: String) =
      q.groupBy(assign).toSeq.map { case (f, rows) =>
        (layout, f, rows.size.toLong,
          rows.map(_._1).min, rows.map(_._1).max,
          rows.map(_._2).min, rows.map(_._2).max)
      }
    val want = (maps(t => morton(t._1, t._2) / LayoutQueries.ZShift, "zorder") ++
      maps(_._2 / LayoutQueries.TShift, "time"))
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7,
        t._5 - t._4 + 1, t._7 - t._6 + 1))
      .sortBy(t => (t._1, t._2))
    val got = LayoutQueries.qZonemapLayouts.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == want && want.nonEmpty)
  }

  test("q_zorder_pruning_gain matches the zone-map intersection workload and z dominates") {
    val layout = LayoutQueries.qZonemapLayouts.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // probes matching no file still emit a zero row (left-join semantics)
    val want = (0L until 16L).map { p =>
      val (from, to) = (p * 4096L, p * 4096L + 4095L)
      val hit = layout.filter(f => f._4 >= from && f._3 <= to)
      val z = hit.filter(_._1 == "zorder"); val t = hit.filter(_._1 == "time")
      (p, from, to, z.size.toLong, z.map(_._2).sum, t.size.toLong, t.map(_._2).sum)
    }
    val got = LayoutQueries.qZorderPruningGain.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want.toSeq && got.nonEmpty)
    // the family's reason to exist: on every user probe the z layout reads
    // no more rows than the time layout, and strictly fewer in total
    got.foreach(g => assert(g._5 <= g._7, s"probe ${g._1}: z reads more rows"))
    assert(got.map(_._5).sum < got.map(_._7).sum, "z-order shows no pruning gain")
  }
}
