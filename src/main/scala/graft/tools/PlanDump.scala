package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit aid: print the formatted physical plan of one or more
  * declared queries without executing them. Usage:
  *
  *   sbt "runMain graft.tools.PlanDump q_decontaminate[,q_x,...] [sfDir]"
  *
  * What to look for (the per-operator scale checklist): filters and
  * column pruning reaching the parquet scan (PushedFilters / ReadSchema),
  * broadcast vs shuffle join sides, `*(n)` whole-stage-codegen spans,
  * and the absence of `WindowExec: No Partition Defined` shapes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump q_name[,q_name...] [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query $name"))
      println(s"\n===== $name =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
