package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset[Lineitem] round-trips the schema") {
    val ds = Models.lineitem(spark, sfDir)
    val row = ds.head
    assert(row.l_quantity > 0 && row.l_returnflag.nonEmpty)
  }

  test("typed groupByKey aggregation equals the untyped groupBy") {
    val ds = Models.lineitem(spark, sfDir)
    val typedAgg = ds.groupByKey(_.l_returnflag)
      .mapGroups((k, it) => (k, it.map(_.l_quantity.toLong).sum))
      .collect().toMap
    val untyped = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(sum($"l_quantity").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typedAgg == untyped)
  }

  test("typed filter keeps compile-time field checks honest") {
    val ds = Models.orders(spark, sfDir)
    val n = ds.filter(_.o_totalprice > 400000).count()
    assert(n == Tables.orders(spark, sfDir).filter($"o_totalprice" > 400000).count())
  }
}
