package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity: the driver consumes Maps keyed by query name, so a
  * duplicated name would silently drop a query from the gate. */
class CatalogSpec extends AnyFunSuite {

  test("query names are unique (no silent Map collapse)") {
    val names = SparkEntry.catalog.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === names.size)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("CatalogDump family partition covers SparkEntry.catalog exactly (no drift)") {
    val dumped = graft.tools.CatalogDump.families.flatMap(_._2).map(_.name)
    assert(dumped.size === SparkEntry.catalog.size,
      s"CatalogDump lists ${dumped.size} queries, catalog has ${SparkEntry.catalog.size} " +
        "— a query family is missing from the generated inventory")
    assert(dumped.toSet === SparkEntry.catalog.map(_.name).toSet)
  }

  test("oracle SQL strings are non-empty and reference a table or a synthesized corpus") {
    val tables = Seq("lineitem", "orders", "customer", "nation", "region",
      "events", "documents", "embeddings", "part", "supplier")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // a fully-synthesized entry (in-row id-derived corpus) legitimately
      // reads no input table; its oracle must then generate rows itself
      assert(tables.exists(sql.contains) || sql.contains("FROM range(") ||
        sql.contains("JOIN range("),
        s"$name: oracle references no known table and synthesizes nothing")
    }
  }
}
