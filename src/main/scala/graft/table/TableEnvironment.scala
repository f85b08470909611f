package graft.table

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Relational/SQL surface mirroring the reference's `ITableEnvironment`
  * (FlinkDotNet.Table.Api/TableEnvironment.cs:13-39): `fromDataStream`,
  * `registerTable`, `sqlQuery`, `getTable`, `listTables`.
  *
  * The reference's `BasicSqlParser` handles only
  * `SELECT .. FROM one_table [WHERE ..] [GROUP BY ..]` via substring search
  * (TableEnvironment.cs:211-260) and never actually evaluates conditions
  * (StreamTable.cs:126-145). Here `sqlQuery` is `spark.sql` — the full ANSI
  * surface (joins, subqueries, set ops, window functions) with Catalyst
  * optimization, strictly more capable and actually executed.
  */
final class TableEnvironment private (val spark: SparkSession) {

  /** FromDataStream (TableEnvironment.cs:44-76): any Dataset becomes a
    * named relational view; schema is the Dataset schema (the reference
    * reflects over POCO properties, TableEnvironment.cs:170-201 — encoders
    * already did that for us).
    */
  def fromDataStream[T](name: String, ds: Dataset[T]): DataFrame = {
    val df = ds.toDF()
    df.createOrReplaceTempView(name)
    df
  }

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** SqlQuery (TableEnvironment.cs:80-95) → full Spark SQL. */
  def sqlQuery(q: String): DataFrame = spark.sql(q)

  def getTable(name: String): Option[DataFrame] =
    if (spark.catalog.tableExists(name)) Some(spark.table(name)) else None

  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq
}

object TableEnvironment {
  def create(spark: SparkSession): TableEnvironment = new TableEnvironment(spark)
}
