package graft

import org.apache.spark.sql.functions._
import graft.operators.Quarantine

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("split routes violating rows with their violation list") {
    val df = Seq(
      ("r1", "O", 10.0),
      ("r2", "X", 10.0),        // bad enum
      ("r3", "F", -5.0),        // bad range
      ("r4", null, -1.0))       // both (null enum counts as violation)
      .toDF("id", "status", "price")
    val s = Quarantine.split(df, Seq(
      Quarantine.enumRule("valid_status", $"status", Seq("O", "F")),
      Quarantine.Rule("price_range", $"price" > 0)))
    assert(s.valid.select("id").collect().map(_.getString(0)).toSeq == Seq("r1"))
    val q = s.quarantined.collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[String]]("violations").toSeq).toMap
    assert(q("r2") == Seq("valid_status"))
    assert(q("r3") == Seq("price_range"))
    assert(q("r4") == Seq("price_range", "valid_status"))
  }
}

class GraftSqlSpec extends SparkSpec {

  test("SQL surface: temp views + custom functions answer queries") {
    GraftSql.registerTables(spark, sf0001)
    GraftSql.registerFunctions(spark)
    val r = spark.sql(
      """SELECT r_name, count(*) AS n,
        |       base32_encode(CAST(count(*) AS BIGINT), 4) AS n32,
        |       similarity_ratio(r_name, lower(r_name)) AS self_sim
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getString(2).length == 4))
    val g = spark.sql("SELECT gen_gsid() AS g FROM nation").collect()
    assert(g.map(_.getString(0)).distinct.length == g.length)
  }
}
