package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch chunk-dedup invariants (the q232 operator,
  * `graft.llm.ChunkDedup`): exactly one keeper per distinct chunk, the
  * keeper is the minimum encoded (doc_id, chunk_idx), and token
  * accounting survives the marking join.
  */
class ChunkDedupSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("firstOccurrence keeps exactly one row per distinct chunk, " +
      "the minimum encoded (doc_id, chunk_idx)") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val marked = graft.llm.ChunkDedup.firstOccurrence(
      graft.llm.ChunkDedup.chunkMembership(docs, "doc_id", "text", 20, 7))
    val enc = col("doc_id") * lit(graft.llm.ChunkDedup.IdxEncode) +
      col("chunk_idx")
    val perChunk = marked.groupBy(col("chash"))
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        min(enc).as("min_enc"),
        min(when(col("kept"), enc)).as("kept_enc"))
    assert(perChunk.where(col("n_kept") =!= 1L).count() === 0L,
      "every distinct chunk must have exactly one kept occurrence")
    assert(perChunk.where(col("kept_enc") =!= col("min_enc")).count() === 0L,
      "the kept occurrence must be the minimum encoded (doc_id, idx)")
    // marking never loses or duplicates rows
    val membership = graft.llm.ChunkDedup.chunkMembership(
      docs, "doc_id", "text", 20, 7)
    assert(marked.count() === membership.count())
    // chunk token counts partition the document token counts
    val fromChunks = marked.groupBy(col("doc_id"))
      .agg(sum(col("ctoks")).as("n"))
    val fromDocs = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        size(graft.llm.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .where(col("n") > 0)
    assert(fromChunks.as[(Long, Long)].collect().toMap ===
      fromDocs.as[(Long, Long)].collect().toMap,
      "chunk token counts must partition each document's tokens")
  }

  test("chunkStructs emits ceil(n/c) chunks, last chunk carries the " +
      "remainder") {
    val df = Seq((1L, (1 to 47).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ch = graft.llm.ChunkDedup.chunkMembership(df, "doc_id", "text", 20, 7)
      .orderBy(col("chunk_idx"))
      .select(col("chunk_idx"), col("ctoks")).as[(Long, Long)].collect()
    assert(ch.toSeq === Seq((0L, 20L), (1L, 20L), (2L, 7L)))
  }

  test("chunkStructs yields an EMPTY chunk array on an empty token " +
      "array (public helper, no caller pre-filter)") {
    // without the guard, sequence(0, nChunks - 1) with nChunks = 0 is
    // sequence(0, -1) which defaults its step to -1 and fabricates TWO
    // bogus chunks of the empty slice
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a", "b", "c")))
      .toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
        size(graft.llm.ChunkDedup.chunkStructs(col("t"), 2, 7)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) === 0, "empty token array must produce zero chunks")
    assert(out(2L) === 2) // ceil(3/2)
  }

  test("slidingChunkStructs: max(1, ceil((n-c)/s)+1) windows, stride " +
      "overlap, truncated tail, empty guard") {
    val df = Seq(
        (1L, (1 to 47).map(i => s"w$i")), // 47 toks, c=20 s=10 -> 4 windows
        (2L, (1 to 20).map(i => s"w$i")), // exactly c -> 1 window
        (3L, Seq("a", "b")),              // n < c -> 1 truncated window
        (4L, Seq.empty[String]))          // empty -> no windows
      .toDF("doc_id", "t")
    val out = df.select(col("doc_id"), posexplode(
        graft.llm.ChunkDedup.slidingChunkStructs(col("t"), 20, 10, 7)))
      .select(col("doc_id"), col("pos"), col("col.ctoks"))
      .as[(Long, Int, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(1L) === Seq(20L, 20L, 20L, 17L)) // starts 1,11,21,31
    assert(byDoc(2L) === Seq(20L))
    assert(byDoc(3L) === Seq(2L))
    assert(!byDoc.contains(4L))
    // overlap check: window 1 of doc 1 starts at token 11
    val texts = df.where(col("doc_id") === 1L).select(posexplode(
        graft.llm.ChunkDedup.slidingChunkStructs(col("t"), 20, 10, 7)))
      .select(col("col.chash")).as[Long].collect()
    assert(texts.distinct.length === 4, "overlapping windows differ")
  }

  test("firstOccurrence raises past the IdxEncode margin instead of " +
      "silently colliding keeper keys across documents") {
    val bad = Seq((1L, 0L, 20L, 42L),
        (2L, graft.llm.ChunkDedup.IdxEncode, 20L, 42L))
      .toDF("doc_id", "chunk_idx", "ctoks", "chash")
    val e = intercept[Exception] {
      graft.llm.ChunkDedup.firstOccurrence(bad).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("IdxEncode"), s"unexpected failure: $chain")
    // in-margin rows are untouched by the guard
    val ok = Seq((1L, 0L, 20L, 42L), (2L, 999999L, 20L, 42L))
      .toDF("doc_id", "chunk_idx", "ctoks", "chash")
    val kept = graft.llm.ChunkDedup.firstOccurrence(ok)
      .where(col("kept")).select(col("doc_id")).as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }

  test("native chunk_structs equals the Column-composed form on the " +
      "fixture plus edge cases, both strides, under CODEGEN_ONLY") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val fixture = graft.core.Tables.documents(spark, sfDir)
        .select(graft.llm.TextFunctions.tokens(col("text")).as("t"))
      val edges = Seq(Seq.empty[String], Seq("a"), (1 to 20).map(i =>
          s"w$i").toSeq, (1 to 21).map(i => s"w$i").toSeq,
          (1 to 47).map(i => s"w$i").toSeq)
        .toDF("t")
        // null elements: concat_ws skips them (no bytes, no separator)
        // while size(slice) still counts them — native must match both.
        .union(Seq(
          Seq[String](null, "a", null, "b", null),
          Seq[String](null), (1 to 25).map(i =>
            if (i % 3 == 0) null else s"w$i").toSeq)
          .toDF("t"))
      Seq(fixture, edges).foreach { df =>
        val rows = df.select(
            graft.llm.ChunkDedup.chunkStructs(col("t"), 20, 7).as("n1"),
            graft.llm.ChunkDedup.chunkStructsHof(col("t"), 20, 7).as("h1"),
            graft.llm.ChunkDedup
              .slidingChunkStructs(col("t"), 20, 10, 7).as("n2"),
            graft.llm.ChunkDedup
              .slidingChunkStructsHof(col("t"), 20, 10, 7).as("h2"),
            graft.llm.ChunkDedup
              .slidingChunkStructs(col("t"), 20, 7, 11).as("n3"),
            graft.llm.ChunkDedup
              .slidingChunkStructsHof(col("t"), 20, 7, 11).as("h3"))
          .collect()
        rows.foreach { r =>
          assert(r.getSeq[org.apache.spark.sql.Row](0) === r.getSeq(1),
            "non-overlapping chunking must match the HOF form")
          assert(r.getSeq[org.apache.spark.sql.Row](2) === r.getSeq(3),
            "stride-10 windows must match the HOF form")
          assert(r.getSeq[org.apache.spark.sql.Row](4) === r.getSeq(5),
            "stride-7 windows must match the HOF form")
        }
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
