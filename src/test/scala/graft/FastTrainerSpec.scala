package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production-scale driver-side trainers
  * (`graft.llm.FastTrainers`): pinned RULE-FOR-RULE equal to the
  * oracle-gated distributed trainers on the same census (the
  * equivalence that lets q326/q328 train ≥1024 merges in seconds),
  * plus the scale/early-stop/partition invariants.
  */
class FastTrainerSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  import graft.llm.{Bpe, FastTrainers, WordPiece}

  private def docs = graft.core.Tables.documents(spark, TestSession.sfDir)

  // the q326 enrichment: a deterministic per-doc hash-digit word makes
  // the tiny fixture vocabulary deep enough to learn 1024+ merges
  private def enriched = docs.select(col("doc_id"),
    concat(col("text"), lit(" q"),
      ((col("doc_id") * 2654435761L) % 100000L).cast("string")).as("text"))

  test("fast BPE == distributed trainFromVocab, rule-for-rule with " +
      "counts AND post-merge mass, on the byte-level segment census " +
      "(8 rounds)") {
    val wv = Bpe.segmentVocabBytes(enriched, "text")
    val slow = Bpe.trainFromVocab(wv, rounds = 8)
      .select(col("merge_round"), col("x"), col("y"), col("pair_n"),
        col("mass_after"))
      .as[(Long, String, String, Long, Long)].collect().toSeq.sortBy(_._1)
    val fast = FastTrainers.trainBpe(Bpe.collectVocab(wv), rounds = 8)
      .rules.map(r => (r.round, r.x, r.y, r.n, r.massAfter))
    assert(fast === slow)
    // ... and the two DataFrame/rule faces the queries consume match too
    assert(Bpe.trainFastFromVocab(wv, 8) ===
      slow.map(t => (t._2, t._3)))
    val fastDf = Bpe.trainFromVocabFast(wv, 8)
      .as[(Long, String, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(fastDf === slow)
  }

  test("fast WordPiece == distributed train, rule-for-rule with the " +
      "published score (8 rounds), and the derived piece vocabulary " +
      "matches trainWithVocab's") {
    val slow = WordPiece.train(docs, "text", rounds = 8)
      .select(col("merge_round"), col("x"), col("y"), col("pair_n"),
        col("score"))
      .as[(Long, String, String, Long, Double)].collect().toSeq
      .sortBy(_._1)
    val (fastRules, fastPieces) = WordPiece.trainFastWithVocab(
      Bpe.charVocab(docs, "text"), rounds = 8)
    assert(fastRules === slow)
    val (_, slowPieces) = WordPiece.trainWithVocab(docs, "text",
      rounds = 8)
    assert(fastPieces === slowPieces)
  }

  test("scale + invariants: >=1024 merges learn from the enriched " +
      "census; final symbols still partition each word; early stop on " +
      "an unmergeable census") {
    val wv = Bpe.segmentVocabBytes(enriched, "text")
    val census = Bpe.collectVocab(wv)
    val t = FastTrainers.trainBpe(census, rounds = 1100)
    assert(t.rules.size >= 1024,
      s"enrichment must leave >=1024 learnable merges: ${t.rules.size}")
    // ranks are 1..k and every rule's pair count is positive
    assert(t.rules.map(_.round) === (1L to t.rules.size.toLong))
    assert(t.rules.forall(_.n >= 1L))
    // char-mass invariant: symbols only ever concatenate
    census.zip(t.finalSymbols).foreach { case ((_, s0), s1) =>
      assert(s1.mkString === s0.mkString)
    }
    // asking for more rounds than the census supports stops at the
    // empty pair table, identically
    val t2 = FastTrainers.trainBpe(census, rounds = 100000)
    assert(t2.rules.size >= t.rules.size)
    assert(t2.finalSymbols.forall(_.size == 1),
      "exhaustive training must fully merge every census word")
    // an already-fully-merged census trains zero rules
    val t3 = FastTrainers.trainBpe(
      Seq((5L, IndexedSeq("ab")), (2L, IndexedSeq("cd"))), rounds = 4)
    assert(t3.rules.isEmpty)
    // min-rank apply of the fast rules == the trainer's own final
    // state (the BpeSpec drop-in contract, here at 1000+ rules)
    val rules = t.rules.map(r => (r.x, r.y))
    val applied = wv.select(col("s"), Bpe.applyMergesBytes(
        graft.llm.ByteLevel.decodeCol(array_join(col("s"), "")), rules)
      .as("a")).select(col("a")).as[Seq[String]].collect().toSeq
    val byWord = census.map(_._2.mkString).zip(t.finalSymbols).toMap
    applied.foreach { a =>
      assert(byWord(a.mkString) === a)
    }
  }

  test("heap argmax == a naive recount-every-round reference on " +
      "random censuses (the lazy-deletion path has no unverified " +
      "branch)") {
    // independent reference: recompute the full pair census from the
    // current word state every round — no deltas, no heap, no shared
    // code with the implementation beyond the tie order
    def utf8 = graft.llm.TextFunctions.utf8Ordering
    def refTrain(census0: Seq[(Long, IndexedSeq[String])], rounds: Int)
        : Seq[(String, String, Long)] = {
      var ws = census0.map { case (wt, s) => (wt, s.toList) }
      val out = Seq.newBuilder[(String, String, Long)]
      var r = 0
      var stop = false
      while (r < rounds && !stop) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        ws.foreach { case (wt, s) =>
          s.zip(s.drop(1)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + wt
          }
        }
        if (counts.isEmpty) stop = true
        else {
          val ((x, y), n) = counts.minBy { case ((px, py), pn) =>
            (-pn, px, py)
          }(Ordering.Tuple3(Ordering.Long, utf8, utf8))
          out += ((x, y, n))
          ws = ws.map { case (wt, s) =>
            val b = List.newBuilder[String]
            var rest = s
            while (rest.nonEmpty) rest match {
              case a :: b2 :: t if a == x && b2 == y =>
                b += x + y; rest = t
              case a :: t => b += a; rest = t
              case Nil =>
            }
            (wt, b.result())
          }
          r += 1
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(2024)
    (1 to 25).foreach { trial =>
      val census = (1 to 5 + rnd.nextInt(40)).map { _ =>
        ((1 + rnd.nextInt(9)).toLong,
          (1 to 1 + rnd.nextInt(10))
            .map(_ => ('a' + rnd.nextInt(3)).toChar.toString)
            .toIndexedSeq)
      }.distinct
      val rounds = 1 + rnd.nextInt(200)
      val got = graft.llm.FastTrainers.trainBpe(census, rounds)
        .rules.map(r => (r.x, r.y, r.n))
      assert(got === refTrain(census, rounds),
        s"trial $trial: census $census rounds $rounds")
    }
  }

  test("REAL production scale: 30k merges train driver-side in " +
      "seconds on a 6k-word census (the 30k-50k vocabulary a real " +
      "tokenizer ships)") {
    // deterministic synthetic census — the fixture's content caps near
    // 20k merges, a real vocab needs 30k+: 6000 distinct 12-char words
    // (seeded, letters skewed so pair counts are non-trivial)
    val rnd = new scala.util.Random(1016)
    val words = (0 until 9000).map { _ =>
      (0 until 14).map { _ =>
        val r = rnd.nextInt(10)
        ('a' + (if (r < 3) r else rnd.nextInt(26))).toChar
      }.mkString
    }.distinct
    val census = words.map(w =>
      ((1 + rnd.nextInt(50)).toLong, w.map(_.toString).toIndexedSeq))
    val capacity = census.map(_._2.size - 1).sum
    assert(capacity >= 30000, s"census capacity $capacity")
    val t0 = System.nanoTime()
    val t = graft.llm.FastTrainers.trainBpe(census, rounds = 30000)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"trained ${t.rules.size} merges in $secs%.1f s")
    assert(t.rules.size >= 30000,
      s"expected >=30000 learned merges: ${t.rules.size}")
    assert(secs < 300.0, f"30k merges too slow driver-side: $secs%.1f s")
    // ranks dense, counts positive, mass invariant
    assert(t.rules.map(_.round) === (1L to t.rules.size.toLong))
    assert(t.rules.forall(_.n >= 1L))
    census.zip(t.finalSymbols).foreach { case ((_, s0), s1) =>
      assert(s1.mkString === s0.mkString)
    }
  }
}
