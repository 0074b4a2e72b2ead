package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins BOTH halves of the ANN recall story to their documented bands by
  * RUNNING the registered audit queries on the sf0.001 testdata, so a
  * silent drift of the LSH/IVF configuration (or the fixture) cannot
  * flip either audit's meaning without a test failing:
  *
  *  - q126 (the failure the audit surfaces): sign-bucket LSH on
  *    uniform-random embeddings recovers only a small fraction of the
  *    true top-3 — mean recall measured 0.10 at sf0.001 / 0.13 at
  *    sf0.01. If this number ever goes HIGH, the fixture stopped being
  *    the adversarial input the audit documents (or the config silently
  *    changed) — either way the q126 comment is now wrong and must be
  *    revisited.
  *  - q128 (the remedy): the IVF dial moves recall — partial probing
  *    (nprobe = 4 of 16) lands mid-band, and full probing
  *    (nprobe = nlist) is EXACT by construction, recall 1.0 on every
  *    query, which is the green ≥ 0.9 configuration on registered data.
  */
class AnnRecallBandSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("q126: registered LSH audit stays in its documented LOW band") {
    val rows = SparkEntry.queries("q126_ann_recall")(spark, sfDir)
      .agg(count(lit(1)).as("n"), avg(col("recall_at_3")).as("mean"))
      .head()
    assert(rows.getLong(0) > 0, "audit produced no queries")
    val mean = rows.getDouble(1)
    assert(mean < 0.35,
      f"LSH recall mean $mean%.3f left the documented low band — the " +
        "uniform-random fixture or the q34 config changed; update the " +
        "q126 narrative (QueriesText) before trusting either audit")
  }

  test("q129: multi-probe moves LSH recall up without touching the corpus index") {
    val out = SparkEntry.queries("q129_lsh_multiprobe")(spark, sfDir)
      .groupBy(col("probes"))
      .agg(count(lit(1)).as("n"), avg(col("recall_at_3")).as("mean"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(1, 4), s"unexpected probe configs: ${out.keySet}")
    val (n1, mean1) = out(1)
    val (n4, mean4) = out(4)
    assert(n1 > 0 && n1 == n4, "probe configs cover different query sets")
    // probes=1 IS classic LSH — it must sit in q126's documented low band
    assert(mean1 < 0.35,
      f"single-probe mean $mean1%.3f left the q126 low band")
    // the dial's whole point: strictly more recall from the same index
    assert(mean4 > mean1,
      f"multi-probe (4) mean $mean4%.3f did not improve on single-probe $mean1%.3f")
  }

  test("q128: IVF remedy is green at full probe, mid-band at nprobe=4") {
    val out = SparkEntry.queries("q128_ann_recall_remedy")(spark, sfDir)
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n"), avg(col("recall_at_3")).as("mean"),
        min(col("recall_at_3")).as("min"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(4, 16), s"unexpected probe configs: ${out.keySet}")
    val (n16, mean16, min16) = out(16)
    assert(n16 > 0 && min16 == 1.0 && mean16 == 1.0,
      s"full probe (nprobe = nlist) must be exact — got min=$min16 mean=$mean16")
    val (n4, mean4, _) = out(4)
    assert(n4 == n16, "probe configs cover different query sets")
    assert(mean4 < 0.9 && mean4 > 0.0,
      f"nprobe=4 mean $mean4%.3f left its mid band — the dial narrative " +
        "in q128's comment no longer matches the data")
  }
}
