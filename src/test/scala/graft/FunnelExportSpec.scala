package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TextOps}
import graft.sources.TrainingExport

/** The text funnel's export loop: funnelCorpus must tie to the
  * survival funnel row-for-row (same universe, same verdicts, same
  * token mass), carry the mixture plan's weights, and flow through
  * TrainingExport unchanged.
  */
class FunnelExportSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("funnelCorpus counts and token mass tie to the funnel reports " +
      "row-for-row, and weights match the mixture plan") {
    val fc = DedupOps.funnelCorpus(spark, sfDir).localCheckpoint(true)
    // per-source keep census == survivalFunnel's raw + stage-5 columns
    val census = fc.groupBy("source")
      .agg(count(lit(1)).as("n_raw2"),
        sum(col("keep").cast("long")).as("n_lang2"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .as("t_lang2"))
    val funnel = DedupOps.survivalFunnel(spark, sfDir)
      .select(col("source").as("s1"), col("n_raw"), col("n_lang"))
    val tokens = DedupOps.funnelTokens(spark, sfDir)
      .select(col("source").as("s2"), col("t_lang"))
    val tied = census
      .join(funnel, col("source") === col("s1"))
      .join(tokens, col("source") === col("s2"))
      .collect()
    assert(tied.nonEmpty)
    tied.foreach { r =>
      assert(r.getAs[Long]("n_raw2") === r.getAs[Long]("n_raw"),
        s"raw universe drifted: $r")
      assert(r.getAs[Long]("n_lang2") === r.getAs[Long]("n_lang"),
        s"keep verdicts drifted from the funnel: $r")
      assert(r.getAs[Long]("t_lang2") === r.getAs[Long]("t_lang"),
        s"token mass drifted from the token funnel: $r")
    }
    // every doc carries its source's sampling weight, verbatim
    val weights = TextOps.mixWeights(spark, sfDir)
      .select(col("source").as("ws"), col("sampling_weight").as("w"))
    assert(fc.join(weights, col("source") === col("ws"))
      .filter(col("sampling_weight") =!= col("w")).count() === 0L)
  }

  test("the kept corpus exports through TrainingExport and reads " +
      "back complete, weights intact") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_funnel_export").toString + "/corpus"
    val kept = DedupOps.funnelCorpus(spark, sfDir)
      .filter(col("keep"))
      .select("doc_id", "source", "lang", "text", "n_tokens",
        "sampling_weight")
      .localCheckpoint(true)
    TrainingExport.exportCorpus(spark, kept, out, nShards = 8)
    // the manifest's total is exactly the funnel's stage-5 survivors
    val exported = TrainingExport.manifest(spark, out)
      .agg(sum("n_docs")).head().getLong(0)
    val nLang = DedupOps.survivalFunnel(spark, sfDir)
      .agg(sum("n_lang")).head().getLong(0)
    assert(exported === nLang)
    // round trip: every kept doc lands once, with its weight
    val back = spark.read.parquet(out)
    assert(back.count() === kept.count())
    assert(back.select("doc_id").distinct().count() === kept.count())
    assert(back.join(kept.select(col("doc_id"),
        col("sampling_weight").as("w0")), "doc_id")
      .filter(col("sampling_weight") =!= col("w0")).count() === 0L)
  }
}
