package graft

class GraftExtensionsSpec extends SparkSpec {

  test("kernels are callable from SQL via SparkSessionExtensions") {
    val dot = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(dot === 11.0)

    val sig = spark.sql(
      "SELECT graft_minhash(array(CAST(17 AS BIGINT), CAST(99 AS BIGINT)), 8)")
      .head().getSeq[Long](0)
    assert(sig.length === 8)
    assert(sig.forall(v => v >= 0 && v < 1000000007L))

    // arbitrary longs (negative / > P) are reduced mod P, never overflow
    val sigWild = spark.sql(
      "SELECT graft_minhash(array(CAST(-17 AS BIGINT), CAST(9223372036854775807 AS BIGINT)), 8)")
      .head().getSeq[Long](0)
    assert(sigWild.forall(v => v >= 0 && v < 1000000007L))

    val inter = spark.sql(
      "SELECT graft_intersect_size(array(1L, 3L, 7L), array(3L, 7L, 9L))")
      .head().getInt(0)
    assert(inter === 2)

    val sh = spark.sql(
      "SELECT graft_shingle_hashes(array('a', 'b', 'c', 'd'), 3)")
      .head().getSeq[Long](0)
    assert(sh.length === 2) // "a b c", "b c d"

    val seq = spark.sql(
      "SELECT graft_shingle_hash_seq(array('a', 'b', 'a', 'b'), 3)")
      .head().getSeq[Long](0)
    assert(seq.length === 2) // positional: "a b a", "b a b" — order kept
    val seqDup = spark.sql(
      "SELECT graft_shingle_hash_seq(array('x', 'x', 'x', 'x'), 3)")
      .head().getSeq[Long](0)
    assert(seqDup.length === 2 && seqDup(0) === seqDup(1)) // multiset: dups kept

    val ah = spark.sql("SELECT graft_ahash64('aaaaaaaaaaaaaaaa')")
      .head().getLong(0)
    assert(ah === 0L) // flat payload: no sample exceeds the mean
    val ah2 = spark.sql("SELECT graft_ahash64(repeat('az', 64))").head().getLong(0)
    assert(ah2 === graft.expressions.MediaHashExprs.aHash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("az" * 64)))
  }

  test("BoundedTopK aggregate equals the ranking-window formulation") {
    import spark.implicits._
    val window = graft.queries.Relational.qTopkOrdersPerCust
      .run(spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    val agg = graft.queries.Relational.qTopkOrdersAgg
      .run(spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    assert(agg === window)

    // SQL surface too
    val viaSql = spark.sql(
      """SELECT k, graft_topk(v, id, 2) AS top FROM VALUES
        | (1, 10L, 100L), (1, 30L, 101L), (1, 20L, 102L), (2, 5L, 103L)
        | AS t(k, v, id) GROUP BY k ORDER BY k""".stripMargin)
      .as[(Int, Seq[(Long, Long)])].collect().toSeq
    assert(viaSql === Seq(
      (1, Seq((30L, 101L), (20L, 102L))),
      (2, Seq((5L, 103L)))))
  }

  test("VectorSum aggregate sums float vectors element-wise") {
    import spark.implicits._
    val got = spark.sql(
      """SELECT k, graft_vector_sum(v, 2) FROM VALUES
        | (1, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))),
        | (1, array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
        | (2, array(CAST(5.0 AS FLOAT), CAST(6.0 AS FLOAT)))
        | AS t(k, v) GROUP BY k ORDER BY k""".stripMargin)
      .as[(Int, Seq[Double])].collect().toSeq
    assert(got === Seq((1, Seq(4.0, 6.0)), (2, Seq(5.0, 6.0))))
  }

  test("VectorSumLong aggregate is exact and StopwordCount counts set hits from SQL") {
    import spark.implicits._
    val sums = spark.sql(
      """SELECT k, graft_vector_sum_long(v, 2) FROM VALUES
        | (1, array(1L, 2L)), (1, array(30L, 40L)), (2, array(5L, 6L))
        | AS t(k, v) GROUP BY k ORDER BY k""".stripMargin)
      .as[(Int, Seq[Long])].collect().toSeq
    assert(sums === Seq((1, Seq(31L, 42L)), (2, Seq(5L, 6L))))
    val hits = spark.sql(
      """SELECT graft_stopword_count(array('the','cat','and','the'), 'the,and,of')""")
      .as[Long].head()
    assert(hits === 3L)
  }

  test("non-literal parameter yields a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), CAST(rand() * 4 AS INT))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("KernelizeStopwordCount rewrites size∘filter∘IN to the codegen kernel") {
    import spark.implicits._
    // short list (stays In) and long list (OptimizeIn turns it into InSet
    // past the 10-element threshold) — the rule must catch both forms
    val shortList = "'the','and'"
    val longList = (1 to 12).map(i => s"'w$i'").mkString(",") + ",'the'"
    // a real (file-source) relation column: both constant folding AND
    // ConvertToLocalRelation would pre-evaluate a literal/LocalRelation
    // plan before the rewrite is observable
    Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("text AS txt").createOrReplaceTempView("graft_kern_docs")
    for (inList <- Seq(shortList, longList)) {
      val df = spark.sql(
        s"""SELECT size(filter(split(txt, ' '), t -> t IN ($inList))) AS n
           |FROM graft_kern_docs""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("stopwordcount"),
        s"rule did not fire for IN ($inList): $optimized")
      // rewritten results must equal an independent interpreted
      // formulation of the same count — aggregate() is a different HOF the
      // rule never touches, so this is NOT the kernel comparing to itself
      val kern = df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
      val ref = spark.sql(
        s"""SELECT aggregate(split(txt, ' '), 0,
           |  (acc, t) -> acc + IF(t IN ($inList), 1, 0)) AS n
           |FROM graft_kern_docs""".stripMargin)
        .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
      assert(kern === ref)
      assert(kern.exists(_ > 0), "fixture produced no hits — test is vacuous")
    }
    // non-literal membership (column reference) must NOT be rewritten
    val dyn = spark.sql(
      """SELECT size(filter(split(txt, ' '), t -> t IN (txt))) AS n
        |FROM graft_kern_docs""".stripMargin)
    assert(!dyn.queryExecution.optimizedPlan.toString.toLowerCase.contains("stopwordcount"))
    spark.catalog.dropTempView("graft_kern_docs")
  }

  test("KernelizeDotProduct rewrites aggregate∘zip_with double-mul to the kernel, exactly") {
    // a real file-source float-array column — embeddings at sf0.001
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("vec_id", "embedding AS a",
        "reverse(embedding) AS b").createOrReplaceTempView("graft_kern_vec")
    val dotSql =
      """aggregate(zip_with(a, b,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D,
        |  (s, x) -> s + x)""".stripMargin
    val df = spark.sql(s"SELECT vec_id, $dotSql AS d FROM graft_kern_vec")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("dotproduct"),
      s"rule did not fire:\n$optimized")
    // value parity vs an interpreted formulation the rule never touches
    // (explicit index fold — no zip_with in sight)
    val kern = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ref = spark.sql(
      """SELECT vec_id, aggregate(sequence(1, size(a)), 0D,
        |  (s, i) -> s + CAST(element_at(a, i) AS DOUBLE)
        |             * CAST(element_at(b, i) AS DOUBLE)) AS d
        |FROM graft_kern_vec""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(kern == ref && kern.nonEmpty && kern.values.exists(_ != 0.0))

    // ragged inputs: zip_with pads with null ⇒ null; the rewrite's size
    // guard must preserve that (the raw kernel would truncate instead)
    val ragged = spark.sql(
      """SELECT aggregate(zip_with(a, slice(b, 1, 3),
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D,
        |  (s, x) -> s + x) AS d
        |FROM graft_kern_vec""".stripMargin)
    assert(ragged.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproduct"))
    assert(ragged.collect().forall(_.isNullAt(0)),
      "ragged zip_with must stay null after the rewrite")

    // float multiply (no double casts) rounds differently — NOT rewritten
    val floatMul = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
        |  (s, x) -> s + x) AS d FROM graft_kern_vec""".stripMargin)
    assert(!floatMul.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproduct"),
      "float-multiply spelling must not be kernelized")
    spark.catalog.dropTempView("graft_kern_vec")
  }
}
