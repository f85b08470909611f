package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Fixture-drift early warning (VERDICT r5 item 5).
  *
  * Rounds 4 and 5 each lost hours to silent fixture type flips
  * (decimal→float money columns, TIMESTAMP(NANOS)→NTZ event times): the
  * first symptom was 11 bench queries erroring at once, three layers
  * away from the cause. This spec pins the POST-normalization schema of
  * every fixture table as seen through `graft.core.Tables` (the surface
  * every query builds on). On the next flip the failure names the table,
  * the column, and both types — instead of a bench crater.
  *
  * Asserts sf0.01 (the driver's oracle gate SF) and the spec-default
  * sf0.001; the generators keep all SFs structurally identical, so one
  * drifting SF also flags here.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import TestSession.spark

  private val expected: Map[String, String] = Map(
    "region"   -> "r_regionkey INT,r_name STRING",
    "nation"   -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" -> ("c_custkey BIGINT,c_name STRING,c_nationkey INT," +
      "c_acctbal DOUBLE,c_mktsegment STRING"),
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" -> ("p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING," +
      "p_size INT,p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING," +
      "o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT," +
      "l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE," +
      "l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING," +
      "l_linestatus STRING,l_shipdate TIMESTAMP_NTZ"),
    // events.ts must normalize to session-zone TIMESTAMP (not NTZ, not a
    // nanos BIGINT) — the event-time operators build on unix_micros/window()
    "events" -> ("event_id BIGINT,ts TIMESTAMP,user_id BIGINT," +
      "event_type STRING,value DOUBLE,props STRING"),
    "documents" -> ("doc_id BIGINT,text STRING,lang STRING,source STRING," +
      "n_chars BIGINT"),
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT",
  )

  private val accessors: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "region" -> Tables.region, "nation" -> Tables.nation,
    "customer" -> Tables.customer, "supplier" -> Tables.supplier,
    "part" -> Tables.part, "orders" -> Tables.orders,
    "lineitem" -> Tables.lineitem, "events" -> Tables.events,
    "documents" -> Tables.documents, "embeddings" -> Tables.embeddings,
  )

  // strip backtick quoting and nullability so the pin is about names+types
  private def ddl(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(",")

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf fixture tables normalize to the pinned schemas") {
      val dir = s"/root/testdata/$sf"
      val drifted = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
        val got = ddl(accessors(name)(spark, dir))
        if (got == want) None
        else Some(s"""$name DRIFTED
                     |  expected: $want
                     |  actual:   $got""".stripMargin)
      }
      assert(drifted.isEmpty,
        "fixture schema drift detected — queries and Tables normalization " +
          "must be re-checked:\n" + drifted.mkString("\n"))
    }
  }
}
