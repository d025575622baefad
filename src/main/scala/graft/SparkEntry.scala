package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.exec.{HardExec, OracleSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * kg_2p: two-hop path query (customers in region 0) through the derived
    * KG edges view. */
  def entry(spark: SparkSession): DataFrame = {
    val (_, lstr, b) = KGQueries.all.find(_._1 == "kg_2p").get
    HardExec.run(spark, "/root/testdata/sf0.001", lstr, b)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val kg = KGQueries.all.map { case (name, lstr, b) =>
      name -> ((s: SparkSession, dir: String) => HardExec.run(s, dir, lstr, b))
    }.toMap
    val pipe = (PipelineQueries.entries ++ SystemQueries.entries ++
        OperatorQueries.entries ++ LayoutQueries.entries ++
        AacQueries.entries ++ FlacQueries.entries).map {
      case (name, fn, _) => name -> fn
    }.toMap
    kg ++ pipe
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val kg = KGQueries.all.map { case (name, lstr, b) =>
      name -> OracleSql.formulaSql(lstr, b)
    }.toMap
    val pipe = (PipelineQueries.entries ++ SystemQueries.entries ++
        OperatorQueries.entries ++ LayoutQueries.entries ++
        AacQueries.entries ++ FlacQueries.entries).collect {
      case (name, _, Some(sql)) => name -> sql
    }.toMap
    kg ++ pipe
  }
}
