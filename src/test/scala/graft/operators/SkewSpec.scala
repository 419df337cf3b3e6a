package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val skewed = (
    // hot key: 10k rows on "hot", a few on others
    (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 5).map(i => ("cold" + i, i.toDouble))
  ).toDF("k", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(skewed, Seq("k"), Seq("v"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("missing", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(plain.exists(_._1 == "hot"))
  }
}
