package graft.load

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wiring test for the cloud write entry point (SURVEY §2.5 /
  * VERDICT r6 item 7): the reference's `df.to_parquet("s3://…")`
  * destinations map to `Warehouse.writePath` with the s3a committer
  * configuration applied scoped-to-the-write. The sandbox has no
  * egress and no hadoop-aws jar, so the s3a leg asserts the CONFIG
  * mapping (the part that is wiring, not transport) while the
  * `file://` leg drives the identical code path end-to-end through a
  * real Hadoop FS write + read-back.
  */
class WritePathSpec extends SparkSpec {
  import spark.implicits._

  test("file:// leg: writePath round-trips through the shared entry " +
      "point and applies no cloud conf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-writepath")
    val uri = s"file://$dir/out"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val applied = Warehouse.writePath(df, uri)
    assert(applied.isEmpty, "file:// must not receive s3a committer conf")
    val back = spark.read.parquet(uri).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("s3a:// leg: the committer mapping is the magic committer with " +
      "Spark's cloud bindings, and session conf is restored after") {
    val conf = Warehouse.committerConfFor("s3a://bucket/prefix/table")
    assert(conf("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(conf("spark.hadoop.fs.s3a.committer.magic.enabled") == "true")
    assert(conf("spark.sql.sources.commitProtocolClass")
      .endsWith("PathOutputCommitProtocol"))
    assert(conf("spark.sql.parquet.output.committer.class")
      .endsWith("BindingParquetOutputCommitter"))
    // the write itself cannot run here (no hadoop-aws on the classpath,
    // no egress) — assert it fails BEFORE leaking conf into the session:
    // writePath scopes its settings with restore-on-exit
    val before = conf.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    intercept[Exception] {
      Warehouse.writePath(Seq(1L).toDF("id"), "s3a://nope/x")
    }
    conf.keys.foreach { k =>
      assert(spark.conf.getOption(k) == before(k),
        s"$k leaked into the session after a failed s3a write")
    }
  }
}
