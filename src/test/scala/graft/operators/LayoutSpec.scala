package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton-code correctness vs a bit-at-a-time reference, and the
  * point of the layout: per-file bounding boxes shrink, so min/max
  * pruning answers rectangle predicates from a fraction of the files
  * a single-dim sort would touch. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("mortonCode == bit-at-a-time reference on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonCode(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y)) }
  }

  test("spreadSql mirrors spread16 (SQL text == Column result)") {
    val df = (0L until 300L).map(i => i * 219 % 65536).toDF("x")
    val both = df.select(
      Layout.mortonCode(col("x"), lit(0L)).as("a"),
      expr(Layout.mortonSql("x", "0")).as("b"))
      .as[(Long, Long)].collect()
    both.foreach { case (a, b) => assert(a == b) }
  }

  test("z-order layout: min/max pruning works on the SECOND dimension") {
    // Uniform 64x64 grid, 16 output "files". A single-dim sort on x
    // answers y-predicates from ALL files (every x-stripe spans all
    // y); z-order confines y too, so a y-range predicate prunes most
    // files by footer stats alone — the reason the layout exists.
    val pts = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 16, y.toLong * 16)).toDF("x", "y")
    def bboxes(laidOut: org.apache.spark.sql.DataFrame) = laidOut
      .withColumn("_pid", spark_partition_id())
      .groupBy("_pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .as[(Int, Long, Long, Long, Long)].collect()
    // files a y<128 scan must open, by min/max stats
    def touchedByY(boxes: Array[(Int, Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, _, y0, _) => y0 < 128 }
    val zBoxes = bboxes(Layout.zorderLayout(pts, col("x"), col("y"), 16))
    val linBoxes = bboxes(
      pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    assert(touchedByY(linBoxes) == linBoxes.length,
      "x-sort should leave every file open to a y predicate")
    assert(touchedByY(zBoxes) <= zBoxes.length / 2,
      s"z-order still touches ${touchedByY(zBoxes)}/${zBoxes.length} files for y<128")
    // and the x dimension stays prunable too: an x<128 scan opens
    // a strict subset of files under BOTH layouts
    assert(zBoxes.count { case (_, x0, _, _, _) => x0 < 128 } < zBoxes.length)
  }
}
