package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TextOps, VectorOps}
import graft.sources.{DocumentStore, MinHashStore, SemDedupStore,
  TermIndexStore, VectorIndex}

/** Right-to-be-forgotten across the persisted store family: every
  * store supports a targeted delete that (a) rewrites ONLY the
  * affected buckets / cell partitions — untouched layout units'
  * files survive byte-identical — and (b) leaves the store equal to
  * a from-scratch build of the kept set (the compliance contract: no
  * trace of the victims in any serving path, no collateral damage to
  * anything else).
  */
class TakedownSpec extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  /** part-file / dir snapshot: name -> (length, modification time). */
  private def listing(dir: org.apache.hadoop.fs.Path,
      prefix: String): Map[String, (Long, Long)] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith(prefix))
      .map(st => st.getPath.getName ->
        (st.getLen, st.getModificationTime))
      .toMap
  }

  private val bucketRe = "_(\\d{5})\\.".r
  private def bucketIdOf(name: String): Option[Int] =
    bucketRe.findFirstMatchIn(name).map(_.group(1).toInt)

  /** Assert every part file NOT in `affected` buckets is unchanged. */
  private def assertUntouched(table: String, affected: Set[Int],
      before: Map[String, (Long, Long)]): Unit = {
    val dir = DocumentStore.tableDir(spark, table)
    val after = listing(dir, "part-")
    val untouchedBefore = before.filter { case (n, _) =>
      bucketIdOf(n).exists(b => !affected.contains(b)) }
    for ((name, meta) <- untouchedBefore)
      assert(after.get(name) === Some(meta),
        s"untouched-bucket file $name of $table changed or vanished")
    // and nothing NEW landed in untouched buckets either
    for ((name, _) <- after
         if bucketIdOf(name).exists(b => !affected.contains(b)))
      assert(before.contains(name),
        s"file $name appeared in an untouched bucket of $table")
  }

  private def ids(vals: Long*): DataFrame = {
    import spark.implicits._
    vals.toDF("doc_id")
  }

  test("DocumentStore.deleteDocs rewrites only victim buckets, " +
      "decrements the census and re-elects keepers — equal to a " +
      "from-scratch build of the kept set") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tkd_ds").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_tkd LOCATION '$tmp'")
    val t = "graft_tkd.docs"
    val c = "graft_tkd.census"
    val t2 = "graft_tkd.docs_fresh"
    val c2 = "graft_tkd.census_fresh"
    try {
      val corpus = DedupOps.corpus(spark, sfDir)
      DocumentStore.write(corpus, t)
      DocumentStore.writeCensus(spark, t, c)
      // victims: a full planted-dup group (5 and its +1e6 copy — the
      // digest must vanish from the census) and one copy-only member
      // (10's copy — group shrinks to 1, keeper re-elects to 10)
      val victims = ids(5L, 1000005L, 1000010L)
      val beforeDocs = listing(DocumentStore.tableDir(spark, t), "part-")
      val beforeCensus = listing(DocumentStore.tableDir(spark, c), "part-")
      val stats = DocumentStore.deleteDocs(spark, t, victims, Some(c))
      assert(stats.removedRows === 3L)
      assert(stats.affectedBuckets.nonEmpty)
      assertUntouched(t, stats.affectedBuckets.toSet, beforeDocs)
      assertUntouched(c, stats.affectedBuckets.toSet, beforeCensus)
      // store == from-scratch build of the kept corpus
      val kept = corpus.join(victims, Seq("doc_id"), "left_anti")
      DocumentStore.write(kept, t2)
      DocumentStore.writeCensus(spark, t2, c2)
      assert(spark.table(t).orderBy("doc_id").collect().toSeq ===
        spark.table(t2).orderBy("doc_id").collect().toSeq)
      // census == from-scratch census (counts decremented, keepers
      // re-elected, emptied digests gone)
      assert(spark.table(c).orderBy("h").collect().toSeq ===
        spark.table(c2).orderBy("h").collect().toSeq)
      // idempotent: nothing left to find
      val again = DocumentStore.deleteDocs(spark, t, victims, Some(c))
      assert(again === DocumentStore.DeleteStats(Nil, 0L))
    } finally {
      Seq(t, c, t2, c2).foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
      spark.sql("DROP DATABASE IF EXISTS graft_tkd")
    }
  }

  test("TermIndexStore.deleteDocs stops serving victims immediately " +
      "and search equals a fresh index of the kept corpus") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tkd_ti").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_tkt LOCATION '$tmp'")
    val t = "graft_tkt.idx"
    try {
      TermIndexStore.build(spark, sfDir, t)
      val victims = ids(20L, 21L)
      val beforePost = listing(DocumentStore.tableDir(spark, t), "part-")
      val st = TermIndexStore.deleteDocs(spark, t, victims)
      assert(st.doclen.removedRows === 2L)
      assert(st.postings.removedRows > 0L)
      assertUntouched(t, st.postings.affectedBuckets.toSet, beforePost)
      // the capped companion is invalidated (victim postings lived in
      // it and the per-term M+1-th must re-promote at next compact)
      assert(!spark.catalog.tableExists(s"${t}_capped"))
      // no victim row survives in either layout
      assert(TermIndexStore.docLens(spark, t)
        .join(victims, Seq("doc_id"), "left_semi").count() === 0L)
      assert(TermIndexStore.postings(spark, t)
        .join(victims, Seq("doc_id"), "left_semi").count() === 0L)
      // search == the inline BM25 over the kept corpus (from-scratch
      // equivalence: same parts a fresh build would tokenize)
      val keptTf = TermIndexStore.tfOf(
        graft.tables.Tables.documents(spark, sfDir)
          .filter(!col("doc_id").isin(20L, 21L))
          .select("doc_id", "text"))
      val expect = TextOps.bm25From(keptTf,
        keptTf.groupBy("tok").agg(count(lit(1)).as("df")),
        keptTf.groupBy("doc_id").agg(sum(col("tf")).as("dl")),
        None).collect().toSeq
      assert(TermIndexStore.search(spark, t).collect().toSeq === expect)
      // compact restores the capped companion at the recorded M; the
      // pruned path serves again, still victim-free
      TermIndexStore.compact(spark, t)
      assert(spark.catalog.tableExists(s"${t}_capped"))
      assert(spark.table(s"${t}_capped")
        .join(victims, Seq("doc_id"), "left_semi").count() === 0L)
      assert(TermIndexStore.search(spark, t).collect().toSeq === expect)
    } finally {
      Seq(t, s"${t}_doclen", s"${t}_capped", s"${t}_bounds").foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
      spark.sql("DROP DATABASE IF EXISTS graft_tkt")
    }
  }

  test("MinHashStore.deleteDocs removes a survivor from docs AND " +
      "band index; a later copy of the victim is accepted, a copy " +
      "of a kept survivor still drops") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tkd_mh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_tkm LOCATION '$tmp'")
    val t = "graft_tkm.nd"
    try {
      import spark.implicits._
      MinHashStore.build(spark, sfDir, t)
      val stored = MinHashStore.read(spark, t)
        .select("doc_id", "text").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val (victimId, victimText) = stored.last
      val (keptId, keptText) = stored.head
      assert(victimId !== keptId)
      // pre-delete: an exact copy of the victim drops against the
      // store (the state we are about to erase)
      val pre = MinHashStore.ingest(spark,
        Seq((8000001L, victimText)).toDF("doc_id", "text"), t)
      assert(pre.nDroppedVsStore === 1L && pre.nAppended === 0L)

      val beforeBands = listing(
        DocumentStore.tableDir(spark, s"${t}_bands"), "part-")
      val beforeDocs = listing(DocumentStore.tableDir(spark, t), "part-")
      val st = MinHashStore.deleteDocs(spark, t, ids(victimId))
      assert(st.docs.removedRows === 1L)
      assert(st.bandRowsRemoved === 16L,
        s"a stored doc carries 16 band rows, got $st")
      assertUntouched(t, st.docs.affectedBuckets.toSet, beforeDocs)
      assertUntouched(s"${t}_bands", st.bandBuckets.toSet, beforeBands)
      assert(MinHashStore.read(spark, t)
        .filter(col("doc_id") === victimId).count() === 0L)
      assert(spark.table(s"${t}_bands")
        .filter(col("doc_id") === victimId).count() === 0L)

      // post-delete: the victim's text is genuinely forgotten — a
      // copy now ingests as fresh (from-scratch-build behavior)...
      val post = MinHashStore.ingest(spark,
        Seq((8000002L, victimText)).toDF("doc_id", "text"), t)
      assert(post.nDroppedVsStore === 0L && post.nAppended === 1L,
        s"the forgotten text must be accepted again: $post")
      // ...while a kept survivor still guards its own text
      val guard = MinHashStore.ingest(spark,
        Seq((8000003L, keptText)).toDF("doc_id", "text"), t)
      assert(guard.nDroppedVsStore === 1L && guard.nAppended === 0L)
    } finally {
      Seq(t, s"${t}_bands").foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
      spark.sql("DROP DATABASE IF EXISTS graft_tkm")
    }
  }

  test("SemDedupStore.deleteVecs rewrites only victim cells, drops " +
      "an emptied cell's directory, and forgets the victims' " +
      "geometry") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tkd_sd").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_tks LOCATION '$tmp'")
    val t = "graft_tks.store"
    try {
      import spark.implicits._
      SemDedupStore.build(spark, sfDir, t)
      val byCell = spark.table(t).groupBy("cell")
        .agg(count(lit(1)).as("n"), collect_list("vec_id").as("idsv"))
        .orderBy("n", "cell").collect()
      // the smallest cell empties wholesale; one extra victim from
      // the biggest cell proves partial rewrites coexist
      val emptiedCell = byCell.head.getLong(0)
      val emptiedIds = byCell.head.getSeq[Long](2)
      val partialVictim = byCell.last.getSeq[Long](2).head
      val victims = (emptiedIds :+ partialVictim)
        .toDF("vec_id")
      val storeDir = DocumentStore.tableDir(spark, t)
      val fs = storeDir.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val cellsBefore = listing(storeDir, "cell=")
      val keptRows = spark.table(t)
        .join(victims, Seq("vec_id"), "left_anti")
        .orderBy("vec_id").collect().toSeq

      val st = SemDedupStore.deleteVecs(spark, t, victims)
      assert(st.removedRows === emptiedIds.size + 1L)
      assert(st.affectedCells.toSet ===
        Set(emptiedCell, byCell.last.getLong(0)))
      // untouched cell directories keep their exact files
      val after = listing(storeDir, "cell=")
      for ((name, meta) <- cellsBefore
           if !st.affectedCells.map(c => s"cell=$c").contains(name))
        assert(after.get(name) === Some(meta),
          s"untouched cell $name changed")
      // the emptied cell's directory is gone
      assert(!fs.exists(new org.apache.hadoop.fs.Path(storeDir,
        s"cell=$emptiedCell")))
      // survivors intact, victims gone
      assert(spark.table(t).orderBy("vec_id").collect().toSeq ===
        keptRows)
      // the geometry is forgotten: an exact copy of a victim is now
      // accepted (its only tau-neighbor left the store)
      val vcopy = graft.tables.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") === partialVictim)
        .select((col("vec_id") + 7000000L).as("vec_id"),
          col("embedding"))
      val acc = SemDedupStore.ingest(spark, vcopy, t, sfDir)
      assert(acc.nDroppedVsStore === 0L && acc.nAppended === 1L,
        s"forgotten vector's copy must append: $acc")
      // idempotent
      val again = SemDedupStore.deleteVecs(spark, t, victims)
      assert(again === SemDedupStore.DeleteStats(Nil, 0L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql("DROP DATABASE IF EXISTS graft_tks")
    }
  }

  test("VectorIndex.deleteVecs leaves exactly the index a fresh " +
      "build of the kept set would serve") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tkd_vi").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_tkv LOCATION '$tmp'")
    val t = "graft_tkv.idx"
    try {
      import spark.implicits._
      VectorIndex.build(spark, sfDir, t)
      val victims = Seq(100L, 101L, 102L).toDF("vec_id")
      val before = listing(DocumentStore.tableDir(spark, t), "part-")
      val st = VectorIndex.deleteVecs(spark, t, victims)
      assert(st.removedRows === 3L)
      assertUntouched(t, st.affectedBuckets.toSet, before)
      // rows == indexRowsOf(kept corpus, frozen codebooks): the
      // FAISS remove_ids contract — codebooks deliberately unchanged
      val e = graft.tables.Tables.embeddings(spark, sfDir)
      val expectRows = VectorOps.indexRowsOf(
          e.filter(!col("vec_id").isin(100L, 101L, 102L)), e)
        .orderBy("vec_id").collect().toSeq
      assert(VectorIndex.read(spark, t).orderBy("vec_id")
        .collect().toSeq === expectRows)
      // and search serves the kept set exactly (no victim neighbor,
      // parity with a search over the from-scratch rows)
      val served = VectorOps.searchIndex(spark, sfDir,
        VectorIndex.read(spark, t))
      assert(served.filter(col("neighbor").isin(100L, 101L, 102L))
        .count() === 0L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql("DROP DATABASE IF EXISTS graft_tkv")
    }
  }
}
