package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorOps
import graft.plans.GraftExtensions
import graft.sources.ImagingStore

class SourcesSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("partitioned store round-trips and prunes partitions") {
    val out = Files.createTempDirectory("graft_store").toString
    ImagingStore.writeFrames(spark, sfDir, out)
    val prj = ImagingStore.readProject(spark, out, "PRJ1")
    assert(prj.count() > 0)
    assert(prj.filter(col("project") =!= "PRJ1").count() === 0)
    // partition pruning must show up in the scan, not as a post-filter
    val plan = prj.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(project"), plan)
  }

  test("streaming frame ingest drains exactly-once into project " +
      "partitions and compacts to the canonical layout") {
    val src = Files.createTempDirectory("graft_imgsrc").toString
    val ckpt = Files.createTempDirectory("graft_imgckpt").toString
    val store = Files.createTempDirectory("graft_imgstream").toString + "/st"
    val d = graft.imaging.ImagingModel.dataSet(spark, sfDir)
      .select(col("id").as("ds_id"),
        expr("split_part(dataset_serial, '-', 1)").as("project"))
    val frames = graft.imaging.ImagingModel.frames(spark, sfDir)
      .join(broadcast(d), col("frames_global_id") === col("ds_id"))
      .drop("ds_id")
    frames.filter(col("frames_global_id") % 2 === 0).coalesce(1)
      .write.parquet(src + "/f1.parquet")
    frames.filter(col("frames_global_id") % 2 === 1).coalesce(1)
      .write.parquet(src + "/f2.parquet")
    val source = spark.readStream.schema(frames.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src + "/*.parquet")
    graft.streaming.ImgStream
      .ingestFrames(spark, source, store, ckpt).awaitTermination()

    val streamed = graft.streaming.ImgStream.readStreamed(spark, store)
    assert(streamed.count() === frames.count())
    assert(streamed.select("batch").distinct().count() >= 2)
    // project pruning across every batch directory
    val prj = graft.streaming.ImgStream
      .readStreamedProject(spark, store, "PRJ1")
    assert(prj.count() > 0)
    val plan = prj.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("(project"), plan)

    // replaying the rows that actually landed in batch 0 is idempotent
    // (batch 0 is whichever parity file the mtime ordering picked
    // first; frame ids are NOT unique in the synthetic fact, so the
    // replay set is reconstructed by parity, not an id join)
    val before = streamed.count()
    val b0even = graft.streaming.ImgStream.readStreamed(spark, store)
      .filter(col("batch") === 0)
      .select((col("frames_global_id") % 2 === 0).as("e"))
      .head().getBoolean(0)
    graft.streaming.ImgStream.landBatch(spark,
      frames.filter(col("frames_global_id") % 2 ===
        (if (b0even) 0 else 1)), store, 0L)
    assert(graft.streaming.ImgStream.readStreamed(spark, store).count()
      === before)

    // compact folds the batch dirs into the canonical project layout
    val dest = Files.createTempDirectory("graft_imgcanon").toString + "/c"
    graft.streaming.ImgStream.compactStreamed(spark, store, dest)
    val canon = spark.read.parquet(dest)
    assert(canon.count() === frames.count())
    val cols = frames.columns.map(col)
    assert(canon.select(cols: _*).exceptAll(frames).isEmpty)
    intercept[IllegalArgumentException] {
      graft.streaming.ImgStream.compactStreamed(spark, store, store)
    }
    // overlapping-path variants must also be rejected (a raw string
    // compare would let these Overwrite the batch dirs mid-scan)
    intercept[IllegalArgumentException] {
      graft.streaming.ImgStream.compactStreamed(spark, store, store + "/")
    }
    intercept[IllegalArgumentException] {
      graft.streaming.ImgStream
        .compactStreamed(spark, store, store + "/batches/sub")
    }
  }

  test("compaction shrinks file counts and preserves the data") {
    val store = Files.createTempDirectory("graft_frag").toString
    val compacted = Files.createTempDirectory("graft_comp").toString
    // fragment: write the store with many tiny output tasks — the
    // append-per-upload failure mode
    val d = graft.imaging.ImagingModel.dataSet(spark, sfDir)
      .select(col("id").as("ds_id"),
        expr("split_part(dataset_serial, '-', 1)").as("project"))
    graft.imaging.ImagingModel.frames(spark, sfDir)
      .join(broadcast(d), col("frames_global_id") === col("ds_id"))
      .drop("ds_id")
      .repartition(64)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("project").parquet(store)
    def parquetFiles(root: String): Long = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))
    }
    val before = parquetFiles(store)
    ImagingStore.compact(spark, store, compacted)
    val after = parquetFiles(compacted)
    assert(after < before / 4,
      s"expected compaction to merge files: $before -> $after")
    val a = spark.read.parquet(store)
    val b = spark.read.parquet(compacted)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("word_ngrams is callable from SQL once extensions install") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      "SELECT word_ngrams('a b c d', 3) AS g, word_ngrams('a b') AS short")
      .head()
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(row.getSeq[String](1) === Seq("a b"))
  }

  test("topk_by_score is callable from SQL once extensions install") {
    GraftExtensions.install(spark)
    val top = spark.sql("""
      SELECT topk_by_score(s, i, 2) AS top FROM VALUES
        (1.0D, 10L), (3.0D, 30L), (2.0D, 20L), (3.0D, 7L) AS t(s, i)""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    // best-first: score 3.0 tie broken to the smaller id
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) ===
      Seq((3.0, 7L), (3.0, 30L)))
  }

  test("vec_dot is callable from SQL and matches the HOF fold") {
    GraftExtensions.install(spark)
    val row = spark.sql("""
      SELECT vec_dot(array(cast(1.5 as float), cast(-2.0 as float)),
                     array(cast(4.0 as float), cast(0.5 as float))) AS d,
             vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dd,
             aggregate(zip_with(array(1.0D, 2.0D), array(3.0D, 4.0D),
               (x, y) -> x * y), 0D, (a, v) -> a + v) AS hof""").head()
    assert(row.getDouble(0) === 1.5 * 4.0 + (-2.0) * 0.5)
    assert(row.getDouble(1) === row.getDouble(2))
    // type misuse is an analysis error, not a runtime cast failure
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot('a', array(1.0D))").collect()
    }
    // the L2 twin: same SQL surface, same HOF-fold parity
    val l2 = spark.sql(
      "SELECT vec_l2(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d").head()
    assert(l2.getDouble(0) === 9.0 + 16.0)
  }

  test("hyperplane_bits and minhash_sig work from SQL") {
    GraftExtensions.install(spark)
    // a constant vector: fp bit j = 1 iff plane j's signs sum positive
    val fp = spark.sql(
      s"SELECT hyperplane_bits(array_repeat(cast(1.0 as float), 64)) AS fp")
      .head().getLong(0)
    val expected = (0 until 64).foldLeft(0L) { (acc, j) =>
      if (graft.functions.Hyperplanes.signs(j).sum > 0) acc | (1L << j)
      else acc
    }
    assert(fp === expected)
    // minhash of a single base hash = (a_i * h + b_i) % P elementwise
    val sig = spark.sql(
      "SELECT minhash_sig(h, 4) AS s FROM (SELECT 12345L AS h)")
      .head().getSeq[Long](0)
    val P = 2147483647L
    val want = (0 until 4).map { i =>
      val a = (1000003L * i + 12345L) % P
      val b = (998244353L * (i + 1) + 7L) % P
      (a * 12345L + b) % P
    }
    assert(sig === want)
  }

  test("embedding near-dup recovers the planted copies") {
    val planted = VectorOps.embNearDup(spark, sfDir)
      .filter(col("v2") === col("v1") + 1000000L)
    assert(planted.count() ===
      graft.tables.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") % 50 === 0).count())
    assert(planted.filter(col("cos") < 0.999999).count() === 0)
  }
}
