package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeMart is an idempotent full overwrite") {
    val dir = Files.createTempDirectory("graft-mart").toString + "/mart"
    Sinks.writeMart(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    Sinks.writeMart(Seq((3, "c")).toDF("k", "v"), dir) // overwrite, not append
    val got = spark.read.parquet(dir).as[(Int, String)].collect().toSet
    assert(got === Set((3, "c")))
  }

  test("writePartitioned lays out hive partitions and pruning works") {
    val dir = Files.createTempDirectory("graft-part").toString + "/mart"
    val df = Seq((1, 10, "x"), (1, 11, "y"), (2, 20, "z")).toDF("week", "k", "v")
    Sinks.writePartitioned(df, dir, Seq("week"))
    val root = new java.io.File(dir)
    assert(root.list().toSet.filter(_.startsWith("week=")) === Set("week=1", "week=2"))
    val pruned = Sinks.readPartition(spark, dir, "week", 1)
    assert(pruned.count() === 2)
    // the physical scan must only touch the week=1 partition
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.relation.location.inputFiles.forall(_.contains("week=1")) ||
      scan.metadata.get("PartitionFilters").exists(_.contains("week")))
  }
}
