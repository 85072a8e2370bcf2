package graft

import graft.queries.FuzzQueries

/** The fuzz catalog's stability contract: the seeded generator must
  * produce the SAME queries every run (names, schemas, oracle SQL) —
  * otherwise the driver's hash gate would chase a moving target — and
  * every instance must run non-degenerately. Value parity is the DuckDB
  * gate's job. */
class FuzzQueriesSpec extends SparkSpec {

  test("generator is deterministic: two evaluations agree on names and SQL") {
    val a = FuzzQueries.all
    val b = FuzzQueries.all
    assert(a.map(_.name) == b.map(_.name))
    assert(a.map(_.oracle) == b.map(_.oracle))
    assert(a.map(_.name).distinct.size == a.size, "fuzz names must be unique")
  }

  test("every fuzz query runs and returns grouped, key-ordered rows") {
    val dir = "/root/testdata/sf0.001"
    FuzzQueries.all.foreach { q =>
      val rows = q.run(spark, dir).collect()
      assert(rows.nonEmpty, s"${q.name}: empty result at sf0.001")
      // grouped arms collapse to few rows; the window/frame arms are
      // per-row by design
      val bound = if (q.name.startsWith("q_fuzzw") ||
        q.name.startsWith("q_fuzzf")) 2000 else 500
      assert(rows.length < bound, s"${q.name}: unexpected size (${rows.length} rows)")
    }
  }

  test("every top-k instance plans TakeOrderedAndProject, never a global sort") {
    val dir = "/root/testdata/sf0.001"
    FuzzQueries.all.filter(_.name.startsWith("q_fuzzt")).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"${q.name}: top-k not TakeOrdered:\n$plan")
    }
  }

  test("fuzz schemas are stable across SparkSessions (fixed agg aliases)") {
    val dir = "/root/testdata/sf0.001"
    FuzzQueries.all.foreach { q =>
      val cols = q.run(spark, dir).columns
      assert(cols.distinct.length == cols.length,
        s"${q.name}: duplicate output columns ${cols.mkString(",")}")
    }
  }
}
