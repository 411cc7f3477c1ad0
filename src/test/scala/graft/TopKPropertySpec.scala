package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic property sweep for [[graft.functions.TopKByScore]] — the
  * bounded aggregate behind every top-k in the library (search
  * rungs, probe twins, session evidence, outlier triage). The claim
  * under test is exactly the one the oracles assume: the aggregate's
  * output equals `sort by (score desc, id asc) take k` (asc variant:
  * (score asc, id asc)) REGARDLESS of partitioning, including merge
  * paths across many partials and groups whose size is under k.
  * Scores are drawn from a tiny value set so ties are dense — the
  * regime where a sloppy merge tie-break silently diverges from the
  * row_number oracle.
  */
class TopKPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("topk/topkAsc equal sort-take under dense ties, any partitioning") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 6) {
      val nGroups = 1 + rnd.nextInt(5)
      val n = 50 + rnd.nextInt(400)
      val k = Seq(1, 3, 5)(rnd.nextInt(3))
      val parts = Seq(1, 3, 13)(rnd.nextInt(3))
      // dense ties: scores from 7 distinct values; unique ids
      val rows = (0 until n).map { i =>
        (rnd.nextInt(nGroups).toLong, rnd.nextInt(7) / 3.0, i.toLong)
      }
      val df = rows.toDF("g", "score", "id").repartition(parts)
      def got(desc: Boolean) = df.groupBy("g")
        .agg((if (desc)
          graft.functions.TopKByScore.topk(col("score"), col("id"), k)
        else
          graft.functions.TopKByScore.topkAsc(col("score"), col("id"), k))
          .as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("p", "t")))
        .select(col("g"), col("p"), col("t.score"), col("t.id"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .toSet
      def expected(desc: Boolean) = rows.groupBy(_._1).toSeq.flatMap {
        case (g, es) =>
          val sorted =
            if (desc) es.sortBy { case (_, s, id) => (-s, id) }
            else es.sortBy { case (_, s, id) => (s, id) }
          sorted.take(k).zipWithIndex.map { case ((_, s, id), p) =>
            (g, p, s, id)
          }
      }.toSet
      assert(got(desc = true) === expected(desc = true),
        s"trial $trial desc: n=$n k=$k parts=$parts groups=$nGroups")
      assert(got(desc = false) === expected(desc = false),
        s"trial $trial asc: n=$n k=$k parts=$parts groups=$nGroups")
    }
  }
}
