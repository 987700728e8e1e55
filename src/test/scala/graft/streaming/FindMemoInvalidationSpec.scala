package graft.streaming

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.prom.Prom

/** The Prometheus find memo under streaming index updates.
  *
  * `Prom.findPathsCached` keys its LocalRelation replay on the tags
  * DataFrame INSTANCE. The freshness contract is therefore: a
  * streaming ingest batch that appends tag rows rotates the serving
  * layer onto a NEW derived-table instance (a fresh read), and the
  * memo must serve the fresh path set through it — while the old
  * instance keeps replaying its own snapshot (point-in-time
  * semantics; TTL-based refresh is [[graft.engine.FindCache]]'s job
  * one level up). This spec drives the full loop: ingest batch →
  * tags parquet append → table rotation → find.
  */
class FindMemoInvalidationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))

  test("streaming tag append + table rotation serves fresh paths; old instance stays a snapshot") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-findmemo")
    try {
      val tables = s"$dir/t"
      val matchers = Seq(("a", "=", "b"))

      // batch 1: one tagged series lands in the tags table
      Ingest.processBatch(
        Ingest.parseLines(Seq("m;a=b 1.0 1700000000").toDF("value")), tables)
      val tags1 = spark.read.parquet(s"$tables/tags")
      def find(tags: org.apache.spark.sql.DataFrame): Set[String] =
        Prom.findPathsCached(tags, matchers).collect().map(_.getString(0)).toSet
      assert(find(tags1) == Set("m?a=b"))

      // batch 2: a NEW series with the same tag arrives via streaming
      // ingest (append-only tag rows, ReplacingMergeTree analog)
      Ingest.processBatch(
        Ingest.parseLines(Seq("m2;a=b 2.0 1700000100").toDF("value")), tables)

      // rotation = a fresh read of the maintained table: the memo
      // must compute (and then replay) the FRESH path set — no stale
      // LocalRelation can leak across instances
      val tags2 = spark.read.parquet(s"$tables/tags")
      assert(find(tags2) == Set("m?a=b", "m2?a=b"))
      // replay through the same fresh instance is stable (memo hit)
      assert(find(tags2) == Set("m?a=b", "m2?a=b"))

      // the pre-rotation instance keeps its point-in-time snapshot —
      // the documented instance-keyed semantics (freshness policy
      // lives in FindCache's TTL, not here)
      assert(find(tags1) == Set("m?a=b"))
    } finally deleteRecursively(dir)
  }
}
