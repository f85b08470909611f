package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineQueries

/** Specs for the pipeline widening (q107–q112): semantics the DuckDB
  * oracle can't see — sessionization gap laws on crafted timelines,
  * the bloom prune's no-false-negative guarantee and its actual row
  * reduction, salted-agg ≡ direct-agg equivalence, and cleaning-
  * transform invariants.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("every pipeline query runs and has an oracle") {
    PipelineQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
      assert(PipelineQueries.oracles.contains(name), s"$name lacks an oracle")
    }
  }

  test("sessionize splits exactly at gaps > 30 min and never within") {
    import spark.implicits._
    // user 1: events at 0, 10 min, 45 min (gap 35 → new session), 50 min
    // user 2: single event
    val us = 1000L * 1000
    val rows = Seq(
      (1L, 101L, 0L), (1L, 102L, 600L * us), (1L, 103L, 2700L * us),
      (1L, 104L, 3000L * us), (2L, 201L, 0L))
      .toDF("user_id", "event_id", "ts_us")
      .select(col("user_id"), col("event_id"), timestamp_micros(col("ts_us")).as("ts"))
    // run the same shape as q107 on the crafted frame
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(ord)
    val out = rows
      .withColumn("newb", when(prev.isNull
        .or(unix_micros(col("ts")) - unix_micros(prev) > 1800L * us), lit(1L)).otherwise(lit(0L)))
      .withColumn("session_idx", sum(col("newb")).over(
        ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("session_idx")).as[(Long, Long)].collect().toMap
    assert(out(101L) == 1 && out(102L) == 1, "10-min gap must not split")
    assert(out(103L) == 2, "35-min gap must split")
    assert(out(104L) == 2, "5-min gap must not split")
    assert(out(201L) == 1, "each user starts at session 1")
  }

  test("bloom prune has no false negatives and actually prunes rows") {
    import spark.implicits._
    val kH = 3; val mBits = 1 << 14
    val members = (1L to 300L).map(_.toString)
    val words = spark.createDataset(members)
      .select(new graft.operators.BloomAggregator(kH, mBits).toColumn).head()
    // every member probes true (the filter's hard guarantee)…
    members.foreach { m =>
      assert(graft.operators.Bloom.contains(words, m, kH, mBits), s"false negative: $m")
    }
    // …and the probe side sees real pruning: most of 10k non-members drop
    val nonMembers = (10000L to 20000L).map(_.toString)
    val kept = nonMembers.count(graft.operators.Bloom.contains(words, _, kH, mBits))
    assert(kept < nonMembers.size / 10,
      s"bloom with ${members.size} keys in $mBits bits must prune >90% ($kept survived)")
    // end-to-end: the query's final exact join makes FPs invisible
    val q = PipelineQueries.queries("q108_bloom_join")(spark, sfDir)
    val direct = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val got = q.select(col("o_orderpriority"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp, "bloom-prefiltered join must equal the plain join")
  }

  test("salted aggregation equals the direct groupBy bit-for-bit") {
    val direct = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(graft.core.Money.dec(col("l_extendedprice"))).cast("decimal(38,2)").as("revenue"))
    val salted = PipelineQueries.queries("q109_salted_agg")(spark, sfDir)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty,
      "salting must not change any group's result")
  }

  test("stopword strip removes exactly the stopwords and keeps order") {
    val out = PipelineQueries.queries("q112_stopword_strip")(spark, sfDir)
      .select(col("cleaned")).collect().map(_.getString(0))
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    out.foreach { c =>
      val toks = c.split("\\s+").filter(_.nonEmpty)
      assert(toks.forall(t => !stop.contains(t)), s"stopword survived in: $c")
    }
    // and at least one fixture doc actually had something removed
    val removed = PipelineQueries.queries("q112_stopword_strip")(spark, sfDir)
      .agg(sum(col("n_removed"))).head().getLong(0)
    assert(removed > 0, "fixture corpus contains stopwords; none were removed")
  }

  test("salted join equals the plain join bit-for-bit") {
    val direct = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(graft.core.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        graft.core.Money.sumDec(col("l_extendedprice")).as("revenue"))
    val salted = PipelineQueries.queries("q113_salted_join")(spark, sfDir)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty,
      "salting must not change the join result")
  }

  test("weighted sample is deterministic and weight-biased") {
    val a = PipelineQueries.queries("q114_weighted_sample")(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val b = PipelineQueries.queries("q114_weighted_sample")(spark, sfDir)
      .repartition(7) // different partitioning must not change the sample
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must be a pure function of the rows")
    // longer docs are preferred: the sampled mean length beats the corpus mean
    val corpusMean = graft.core.Tables.documents(spark, sfDir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleMean = PipelineQueries.queries("q114_weighted_sample")(spark, sfDir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighting by n_chars must bias toward long docs ($sampleMean vs $corpusMean)")
  }

  test("minmax normalization lands every value in [0,1] with both extremes") {
    val df = PipelineQueries.queries("q115_minmax_normalize")(spark, sfDir)
    assert(df.filter(col("scaled") < 0 || col("scaled") > 1).count() == 0)
    val perLang = df.groupBy(col("lang"))
      .agg(min(col("scaled")).as("lo"), max(col("scaled")).as("hi")).collect()
    perLang.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0,
        s"each group must span [0,1]: $r")
    }
  }

  test("vocab OOV rates are consistent fractions and vocab is bounded") {
    val df = PipelineQueries.queries("q111_vocab_oov")(spark, sfDir)
    val bad = df.filter(
      col("oov_rate") < 0 || col("oov_rate") > 1 ||
        col("n_oov") > col("n_tokens")).count()
    assert(bad == 0, "oov must be a fraction of tokens")
    // top-30 vocab over this corpus covers most tokens (zipf head)
    val mean = df.agg(avg(col("oov_rate"))).head().getDouble(0)
    assert(mean < 0.5, s"top-30 vocab should cover most of the corpus (mean OOV $mean)")
  }

  test("snapshot diff classes partition the key space and counts reconcile") {
    val df = PipelineQueries.queries("q127_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(df.keySet === Set("added", "removed", "changed", "same"))
    // column-drift counters only ever count rows classified as changed
    val (nChanged, pc, sc) = df("changed")
    assert(pc <= nChanged && sc <= nChanged && pc + sc >= nChanged,
      "every changed row drifted in at least one tracked column")
    df.filterKeys(k => k == "added" || k == "removed").values.foreach {
      case (_, p, s) => assert(p == 0 && s == 0,
        "one-sided rows carry no column drift")
    }
    // the classes reconcile with the snapshot definitions: keys in A are
    // those not ≡0 mod 10, in B not ≡0 mod 7 — |A∩B| = same+changed etc.
    val o = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val inA = o.filter(_ % 10 != 0).toSet
    val inB = o.filter(_ % 7 != 0).toSet
    assert(df("removed")._1 == (inA -- inB).size)
    assert(df("added")._1 == (inB -- inA).size)
    assert(nChanged + df("same")._1 == (inA & inB).size)
  }

  test("cdc compaction plans as one hash aggregate, no ranking window") {
    val plan = PipelineQueries.queries("q128_cdc_compact")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "LWW fold must not plan a ranking window")
    assert(plan.contains("Aggregate"), "expected the max_by hash aggregate")
  }

  test("cdc compaction drops tombstoned keys and keeps the latest row") {
    import spark.implicits._
    val df = PipelineQueries.queries("q128_cdc_compact")(spark, sfDir)
    // winner rows must never carry a tombstone key (op D ⇔ key % 13 == 0)
    assert(df.filter(col("last_key") % 13 === 0).count() == 0,
      "a tombstone won the fold but survived the filter")
    // per surviving customer the winner is the max-(day, orderkey) row of
    // the changelog — recompute independently via a typed fold
    val expect = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("date"))
      .as[(Long, Long, java.sql.Date)].collect()
      .groupBy(_._1).view.mapValues(_.maxBy(r => (r._3.getTime, r._2))).toMap
    val got = df.select(col("cust"), col("last_key"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (cust, key) =>
      assert(expect(cust)._2 == key, s"cust $cust kept $key, latest is ${expect(cust)._2}")
    }
    // and every customer whose latest op is U appears
    val survivors = expect.count { case (_, (_, k, _)) => k % 13 != 0 }
    assert(got.size == survivors)
  }

  test("psi drift terms are non-negative and cover all ten bins") {
    val rows = PipelineQueries.queries("q143_psi_drift")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSet === (0L to 9L).toSet,
      "equi-width binning over global extremes must populate every bin")
    rows.foreach { r =>
      // (p−q)·ln(p/q) has matching signs in both factors, so every
      // term is ≥ 0 up to one 1e-9 grid step of floor rounding
      assert(r.getAs[Double]("term") >= -1e-9, s"negative PSI term: $r")
      assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur") > 0)
    }
  }

  test("merge-into applies update/insert/delete classes and drops noop deletes") {
    import spark.implicits._
    import graft.operators.MergeInto
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val delta = Seq((2L, "b2", 25.0, "U"), (4L, "d", 40.0, "I"),
                    (3L, "c", 30.0, "D"), (9L, "x", 99.0, "D"))
      .toDF("k", "s", "v", "op")
    val out = MergeInto(base, delta, Seq("k"), "op")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getString(3))).toMap
    assert(out === Map(
      1L -> ("a", 10.0, "kept"),
      2L -> ("b2", 25.0, "updated"), // delta row wins wholesale
      3L -> ("c", 30.0, "deleted"),  // base values surface for audit
      4L -> ("d", 40.0, "inserted")),
      "delete of a missing key (9) must vanish, not insert or error")
    val applied = MergeInto.applied(base, delta, Seq("k"), "op")
      .collect().map(_.getLong(0)).toSet
    assert(applied === Set(1L, 2L, 4L), "writer view excludes tombstones")
  }

  test("merge-into rejects a null-op delta row loudly") {
    import spark.implicits._
    import graft.operators.MergeInto
    val base = Seq((1L, "a")).toDF("k", "s")
    val delta = Seq((1L, "a2", null: String), (5L, "e", null: String))
      .toDF("k", "s", "op")
    // a null op is a contract violation: it must raise, not silently
    // classify as 'kept' (which would drop the update and emit an
    // all-null row for the unmatched key)
    val e = intercept[Exception] {
      MergeInto(base, delta, Seq("k"), "op").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("MergeInto: null op")),
      s"expected the contract-violation message, got: $e")
  }

  test("merge-into laws: re-apply is idempotent, empty delta is identity") {
    import spark.implicits._
    import graft.operators.MergeInto
    val m = pmod(col("o_orderkey"), lit(7))
    val orders = graft.core.Tables.orders(spark, sfDir).limit(2000)
    val base = orders.filter(m =!= 3)
    val delta = orders.filter(m.isin(3, 5, 6))
      .withColumn("_op",
        when(m === 3, lit("I")).when(m === 5, lit("U")).otherwise(lit("D")))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
        .collect().toMap
    val once = MergeInto.applied(base, delta, Seq("o_orderkey"), "_op")
    val twice = MergeInto.applied(once, delta, Seq("o_orderkey"), "_op")
    assert(snap(twice) === snap(once), "MERGE apply must be idempotent")
    val identity = MergeInto.applied(base, delta.limit(0), Seq("o_orderkey"), "_op")
    assert(snap(identity) === snap(base), "empty delta must be identity")
  }

  test("quantile bins are equi-depth within interpolation tolerance") {
    val df = PipelineQueries.queries("q120_quantile_bins")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df.keySet === Set(1L, 2L, 3L, 4L), "exactly four bins")
    val total = df.values.sum.toDouble
    df.foreach { case (bin, n) =>
      val frac = n / total
      assert(frac > 0.2 && frac < 0.3, s"bin $bin holds $frac of rows, not ~25%")
    }
  }
}
