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

  test("readPaths unions explicit partition directories (reference S2)") {
    val dir = Files.createTempDirectory("graft-paths").toString + "/mart"
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("week", "v")
    Sinks.writePartitioned(df, dir, Seq("week"))
    val got = Sinks.readPaths(spark, Seq(s"$dir/week=1", s"$dir/week=3"))
      .select("v").as[String].collect().toSet
    assert(got === Set("a", "c"))
  }

  test("readDateWindow prunes to the N-day partition window (reference S3)") {
    val dir = Files.createTempDirectory("graft-dates").toString + "/events"
    val df = Seq(
      ("2024-01-05", 1L), ("2024-01-06", 2L), ("2024-01-07", 3L),
      ("2024-01-08", 4L), ("2024-01-10", 5L))
      .toDF("date", "event_id")
    Sinks.writePartitioned(df, dir, Seq("date"))
    val got = Sinks.readDateWindow(spark, dir, "date", "2024-01-08", 3)
      .select("event_id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 4L)) // window [01-06, 01-08]; 01-10 out, 01-05 out
    val scan = Sinks.readDateWindow(spark, dir, "date", "2024-01-08", 3)
      .queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("date")),
      "window filter not applied as partition pruning")
  }

  test("bucketed tables join without a shuffle on either side") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Sinks.writeBucketed(a, "graft_bkt_a", Seq("k"), 4)
    Sinks.writeBucketed(b, "graft_bkt_b", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() === 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("overwritePartitions replaces only the incoming partitions") {
    val dir = Files.createTempDirectory("graft-dyn").toString + "/mart"
    val day1 = Seq(("2024-01-01", 1L, "old1"), ("2024-01-02", 2L, "old2"))
      .toDF("date", "id", "v")
    Sinks.writePartitioned(day1, dir, Seq("date"))
    // incremental batch touches only 2024-01-02 (revised) and 2024-01-03 (new)
    val batch = Seq(("2024-01-02", 2L, "new2"), ("2024-01-03", 3L, "new3"))
      .toDF("date", "id", "v")
    Sinks.overwritePartitions(batch, dir, Seq("date"))
    val got = spark.read.parquet(dir)
      .select("date", "v").as[(String, String)].collect().toSet
    assert(got === Set(("2024-01-01", "old1"), ("2024-01-02", "new2"),
      ("2024-01-03", "new3")),
      "untouched partitions must survive; incoming ones must be replaced")
  }

  test("mergeUpsert: latest version wins, new keys append, untouched partitions keep their files") {
    val dir = Files.createTempDirectory("graft-merge").toString + "/snap"
    val snap = Seq(
      ("A", 1L, 1L, "a1-v1"), ("A", 2L, 1L, "a2-v1"),
      ("B", 3L, 5L, "b3-v5"), ("C", 4L, 1L, "c4-v1"))
      .toDF("part", "id", "ver", "v")
    Sinks.writePartitioned(snap, dir, Seq("part"))
    val untouched = new java.io.File(s"$dir/part=C").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val batch = Seq(
      ("A", 1L, 2L, "a1-v2"),   // newer version → replaces
      ("A", 9L, 1L, "a9-v1"),   // new key → appends
      ("B", 3L, 4L, "b3-v4"))   // STALE (ver 4 < snapshot's 5) → ignored
      .toDF("part", "id", "ver", "v")
    Sinks.mergeUpsert(spark, dir, batch, Seq("part", "id"), Seq("part"), "ver")
    val got = spark.read.parquet(dir)
      .select("part", "id", "ver", "v").as[(String, Long, Long, String)].collect().toSet
    assert(got === Set(
      ("A", 1L, 2L, "a1-v2"), ("A", 2L, 1L, "a2-v1"), ("A", 9L, 1L, "a9-v1"),
      ("B", 3L, 5L, "b3-v5"), ("C", 4L, 1L, "c4-v1")))
    val after = new java.io.File(s"$dir/part=C").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(after === untouched, "partition absent from the batch must not be rewritten")
    assert(!new java.io.File(dir + "__merge_tmp").exists(), "staging dir must be cleaned up")
  }

  test("mergeUpsert on a version tie prefers the update batch") {
    val dir = Files.createTempDirectory("graft-merge-tie").toString + "/snap"
    Sinks.writePartitioned(Seq(("A", 1L, 3L, "old")).toDF("part", "id", "ver", "v"),
      dir, Seq("part"))
    Sinks.mergeUpsert(spark, dir,
      Seq(("A", 1L, 3L, "new")).toDF("part", "id", "ver", "v"),
      Seq("part", "id"), Seq("part"), "ver")
    assert(spark.read.parquet(dir).select("v").as[String].collect().toSeq === Seq("new"))
  }

  test("zValue interleaves bits (Morton order)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Sinks.zValue($"a", $"b", 4)).as[Long].collect().toSeq
    // interleave: a bits at even positions, b bits at odd
    // (3,5) = a=0011, b=0101 → z = b3 a3 b2 a2 b1 a1 b0 a0 = 0 0 1 0 0 1 1 1
    assert(got === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("z-ordered write tightens per-file bounding boxes on both dimensions") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    // uniform grid of 4096 (x, y) points in [0,64)²
    val pts = (0 until 4096).map(i => (i % 64, i / 64)).toDF("x", "y")
    val shuffled = pts.orderBy(md5(concat($"x", lit(":"), $"y"))) // random layout
    shuffled.repartitionByRange(16, $"x".asc).write.parquet(s"$dir/rows")
    Sinks.writeZOrdered(shuffled, s"$dir/zord", $"x", $"y", bits = 6, nFiles = 16)
    def avgBoxArea(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max($"x") - min($"x") + 1) * (max($"y") - min($"y") + 1)).as("area"))
      perFile.agg(avg($"area")).as[Double].head()
    }
    val rowLayout = avgBoxArea(s"$dir/rows")  // tight in x, 64-wide in y
    val zLayout = avgBoxArea(s"$dir/zord")
    // 16 z-files over a 64×64 grid ≈ 16×16 tiles (area ~256+slack); the
    // x-range layout is 4-wide in x but full-height → area 4·64 = 256 too,
    // BUT z-order must be tight in BOTH dims: assert per-dimension spans
    val spans = spark.read.parquet(s"$dir/zord")
      .groupBy(input_file_name())
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(max($"sx"), max($"sy")).as[(Int, Int)].head()
    assert(spans._1 <= 31 && spans._2 <= 31,
      s"z-order files must be bounded in BOTH dims, got spans $spans")
    assert(zLayout <= rowLayout * 2,
      s"z-order area $zLayout should be comparable or better than $rowLayout")
  }

  test("compact rewrites a fragmented table into few files, preserving rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    df.repartition(64).write.parquet(dir) // simulate small-file accretion
    def nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles >= 32, "fixture should start fragmented")
    val out = Sinks.compact(spark, dir, targetRowsPerFile = 500L)
    assert(out === 2)
    assert(nFiles === 2, s"expected 2 compacted files, found $nFiles")
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(got === (1 to 1000).map(i => (i.toLong, s"v$i")).toSet)
  }
}
