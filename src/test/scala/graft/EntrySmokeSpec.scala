package graft

/** The driver's smoke contract: `SparkEntry.entry(spark)` on sf0.001
  * returns rows. Pinned here so a refactor can never break the one
  * call the driver makes before anything else. */
class EntrySmokeSpec extends SparkSpec {
  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0L)
  }
}
