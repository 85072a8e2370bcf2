package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd nearest-neighbor argmin against a small literal zone dimension
  * — the whole-operator replacement for the reference's crossJoin + window
  * top-1 (save_mes_geo.py:38-44).
  *
  * Per input row it scans the embedded (zone_id, name, lat, lon) arrays,
  * ranking by the monotone pre-`asin` haversine term (so the inner loop does
  * 2 sin + 2 cos + 2 pow per zone, no asin/sqrt), then materializes the
  * exact great-circle distance of the winner with the same operation
  * sequence Spark's built-in `radians`/`sin`/`pow`/`asin` column expressions
  * produce — results are bit-identical to the compositional formulation, so
  * the DuckDB oracle is unaffected.
  *
  * At scale this makes geo enrichment a map-only narrow stage: no join, no
  * window shuffle, one O(|zones|) register-resident loop per row inside
  * whole-stage codegen. Ties (equal distance) resolve to the lowest zone_id
  * because the scan is in ascending zone_id order with strict `<`.
  */
case class NearestZone(
    lat: Expression,
    lon: Expression,
    zoneIds: Array[Long],
    zoneNames: Array[String],
    zoneLats: Array[Double],
    zoneLons: Array[Double]) extends Expression {

  require(zoneIds.nonEmpty && zoneIds.length == zoneNames.length &&
    zoneIds.length == zoneLats.length && zoneIds.length == zoneLons.length)

  override def children: Seq[Expression] = Seq(lat, lon)
  override def nullable: Boolean = lat.nullable || lon.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("zone_id", LongType, nullable = false),
    StructField("zone_name", StringType, nullable = false),
    StructField("dist_km", DoubleType, nullable = false)))

  @transient private lazy val utf8Names: Array[UTF8String] =
    zoneNames.map(UTF8String.fromString)

  /** The pre-asin haversine term — matches
    * pow(sin(radians(zlat-lat)/2),2) + cos(radians(lat))*cos(radians(zlat))*pow(sin(radians(zlon-lon)/2),2). */
  private def bestIndex(latV: Double, lonV: Double): Int = {
    var best = 0
    var bestA = Double.MaxValue
    var i = 0
    while (i < zoneIds.length) {
      val a = math.pow(math.sin(math.toRadians(zoneLats(i) - latV) / 2), 2) +
        math.cos(math.toRadians(latV)) * math.cos(math.toRadians(zoneLats(i))) *
          math.pow(math.sin(math.toRadians(zoneLons(i) - lonV) / 2), 2)
      if (a < bestA) { bestA = a; best = i }
      i += 1
    }
    best
  }

  override def eval(input: InternalRow): Any = {
    val latV = lat.eval(input)
    val lonV = lon.eval(input)
    if (latV == null || lonV == null) return null
    val la = latV.asInstanceOf[Double]
    val lo = lonV.asInstanceOf[Double]
    val i = bestIndex(la, lo)
    val a = math.pow(math.sin(math.toRadians(zoneLats(i) - la) / 2), 2) +
      math.cos(math.toRadians(la)) * math.cos(math.toRadians(zoneLats(i))) *
        math.pow(math.sin(math.toRadians(zoneLons(i) - lo) / 2), 2)
    val dist = 2 * 6371.0 * math.asin(math.sqrt(a))
    InternalRow(zoneIds(i), utf8Names(i), dist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val latCode = lat.genCode(ctx)
    val lonCode = lon.genCode(ctx)
    val ids = ctx.addReferenceObj("zoneIds", zoneIds, "long[]")
    val names = ctx.addReferenceObj("zoneNames", utf8Names,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val lats = ctx.addReferenceObj("zoneLats", zoneLats, "double[]")
    val lons = ctx.addReferenceObj("zoneLons", zoneLons, "double[]")
    val la = ctx.freshName("la")
    val lo = ctx.freshName("lo")
    val best = ctx.freshName("best")
    val bestA = ctx.freshName("bestA")
    val i = ctx.freshName("i")
    val a = ctx.freshName("a")
    val dist = ctx.freshName("dist")
    val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
    val code =
      code"""
        ${latCode.code}
        ${lonCode.code}
        boolean ${ev.isNull} = ${latCode.isNull} || ${lonCode.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          final double $la = ${latCode.value};
          final double $lo = ${lonCode.value};
          int $best = 0;
          double $bestA = Double.MAX_VALUE;
          for (int $i = 0; $i < $ids.length; $i++) {
            double $a = Math.pow(Math.sin(Math.toRadians($lats[$i] - $la) / 2), 2)
              + Math.cos(Math.toRadians($la)) * Math.cos(Math.toRadians($lats[$i]))
                * Math.pow(Math.sin(Math.toRadians($lons[$i] - $lo) / 2), 2);
            if ($a < $bestA) { $bestA = $a; $best = $i; }
          }
          double $dist = 2 * 6371.0 * Math.asin(Math.sqrt($bestA));
          ${ev.value} = new $rowClass(new Object[] {
            (Object) java.lang.Long.valueOf($ids[$best]),
            (Object) $names[$best],
            (Object) java.lang.Double.valueOf($dist) });
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lat = newChildren(0), lon = newChildren(1))
}
