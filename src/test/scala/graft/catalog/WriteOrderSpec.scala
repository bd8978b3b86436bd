package graft.catalog

import graft.SparkSpec
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Declared write-time clustering ([[WriteOrder]] — Iceberg's `WRITE
  * ORDERED BY` as `TBLPROPERTIES ('write.order'='c1,c2')`): writes
  * through the V2 writer sort on (partition transforms, order
  * columns), so parquet ROW GROUPS inside each file carry tight,
  * disjoint min/max ranges — the reader's row-group pruning skips
  * inside files the way file skipping prunes between them. Laws:
  *
  *  - ordered inserts produce monotone, non-overlapping row-group
  *    ranges on the order column; an unordered twin (shuffled input,
  *    no property) overlaps;
  *  - results are row-identical either way (pure write-path layout);
  *  - `ALTER TABLE … SET TBLPROPERTIES` declares/validates the order
  *    on a live table; unknown columns and flat tables fail loudly;
  *  - `CALL compact` restores the clustering;
  *  - bucket-transform ordering resolves through the catalog's V2
  *    bucket function (no crash, rows intact). */
class WriteOrderSpec extends SparkSpec {
  import spark.implicits._

  private def withLake(tag: String)(body: (String, Path) => Unit): Unit = {
    val lake = Files.createTempDirectory(s"graft-ord-$tag")
    Files.createDirectories(lake.resolve("m"))
    val cat = s"ord$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    // force several row groups per file: tiny block size (parquet
    // checks the flush threshold every 100 records)
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try body(cat, lake)
    finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.path")
    }
  }

  /** (min, max) of column `col` per row group of the given files. */
  private def rangesOf(files: Seq[Path], col: String): Seq[(Long, Long)] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == col).get
        val st = c.getStatistics
        (st.genericGetMin.asInstanceOf[Number].longValue,
          st.genericGetMax.asInstanceOf[Number].longValue)
      } finally r.close()
    }
  }

  /** [[rangesOf]] over every data file under the table's partition
    * dirs. */
  private def rowGroupRanges(dir: Path, col: String): Seq[(Long, Long)] =
    rangesOf(PartitionedWrite.filesUnderDirs(dir,
      PartitionedWrite.leafPartitionDirs(dir)).map(dir.resolve), col)

  private def overlaps(ranges: Seq[(Long, Long)]): Boolean = {
    val sorted = ranges.sortBy(_._1)
    sorted.zip(sorted.tail).exists { case ((_, aMax), (bMin, _)) =>
      bMin <= aMax
    }
  }

  test("write.order clusters row groups; unordered twin overlaps; rows identical") {
    withLake("a") { (cat, lake) =>
      for ((name, prop) <- Seq(
          ("t_ord", ", 'write.order'='n'"), ("t_raw", ""))) {
        spark.sql(
          s"""CREATE TABLE $cat.m.$name (n BIGINT, v STRING, region STRING)
             |PARTITIONED BY (region)
             |TBLPROPERTIES ('versioned'='true'$prop)""".stripMargin)
        // shuffled input: without the declared order, row groups
        // land in arrival order and overlap
        (1L to 40000L).map(i => ((i * 7919L) % 40000L, s"v$i", "EU"))
          .toDF("n", "v", "region")
          .write.mode("append").insertInto(s"$cat.m.$name")
      }
      val ord = rowGroupRanges(lake.resolve("m/t_ord.parquet"), "n")
      val raw = rowGroupRanges(lake.resolve("m/t_raw.parquet"), "n")
      assert(ord.size > 1, s"need several row groups, got ${ord.size}")
      assert(!overlaps(ord),
        s"declared order must yield disjoint row-group ranges: $ord")
      assert(overlaps(raw),
        s"shuffled unordered write should overlap (else the law is vacuous): $raw")
      // layout only — the rows are identical
      assert(spark.table(s"$cat.m.t_ord").as[(Long, String, String)]
        .collect().sortBy(_._1).toSeq ==
        spark.table(s"$cat.m.t_raw").as[(Long, String, String)]
          .collect().sortBy(_._1).toSeq)
      assert(spark.table(s"$cat.m.t_ord").count() == 40000L)
    }
  }

  test("ALTER TABLE SET TBLPROPERTIES declares the order; validation is loud; compact restores clustering") {
    withLake("b") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.t (n BIGINT, v STRING, region STRING)
           |PARTITIONED BY (region)
           |TBLPROPERTIES ('versioned'='true')""".stripMargin)
      // unordered history first
      (1L to 40000L).map(i => ((i * 7919L) % 40000L, s"v$i", "EU"))
        .toDF("n", "v", "region")
        .write.mode("append").insertInto(s"$cat.m.t")
      val dir = lake.resolve("m/t.parquet")
      assert(overlaps(rowGroupRanges(dir, "n")))

      intercept[Exception](spark.sql(
        s"ALTER TABLE $cat.m.t SET TBLPROPERTIES('write.order'='nope')"))
      // case-mismatched declaration CANONICALIZES to the schema's
      // exact field case (consumers filter case-sensitively)
      spark.sql(s"ALTER TABLE $cat.m.t SET TBLPROPERTIES('write.order'='N')")
      assert(WriteOrder.read(dir) == Seq("n"))

      // compaction rewrites the unordered history CLUSTERED — only
      // the current snapshot's files matter (manifest-resolved; the
      // pre-compact files stay on disk for history)
      spark.sql(s"CALL $cat.system.compact('m.t', 1)")
      val curRanges = rangesOf(
        Snapshots.latest(dir).get.files.map(dir.resolve), "n")
      assert(curRanges.size > 1 && !overlaps(curRanges),
        s"compact must restore the declared clustering: $curRanges")
      assert(spark.table(s"$cat.m.t").count() == 40000L)
    }
  }

  test("bucket-transform ordering resolves through the catalog; flat tables reject the property") {
    withLake("c") { (cat, lake) =>
      spark.sql(
        s"""CREATE TABLE $cat.m.bt (k BIGINT, n BIGINT)
           |PARTITIONED BY (bucket(4, k))
           |TBLPROPERTIES ('write.order'='n')""".stripMargin)
      (1L to 5000L).map(i => (i, (i * 7919L) % 5000L)).toDF("k", "n")
        .write.mode("append").insertInto(s"$cat.m.bt")
      assert(spark.table(s"$cat.m.bt").count() == 5000L)
      val dir = lake.resolve("m/bt.parquet")
      assert(WriteOrder.read(dir) == Seq("n"))
      intercept[Exception](spark.sql(
        s"""CREATE TABLE $cat.m.flat (k BIGINT)
           |TBLPROPERTIES ('write.order'='k')""".stripMargin))
    }
  }
}
