package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.SortedIntersectSize

/** Session extensions: registers the engine's native expressions into the
  * SQL function registry, so `spark.sql("... sorted_intersect_size(a,b)")`
  * works next to the Column API. Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (GraftSession
  * does) or spark.sql.extensions=graft.GraftExtensions on spark-submit. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "sorted_intersect_size takes exactly 2 arguments")
        SortedIntersectSize(exprs.head, exprs(1))
      }))
  }
}

/** Convenience catalog: register every testdata table as a temp view so the
  * whole engine surface is reachable through plain `spark.sql`. */
object GraftCatalog {
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach {
      case "events" =>
        // events needs the nanos-timestamp loader, not a raw read
        graft.operators.Tables.events(spark, sfDir)
          .createOrReplaceTempView("events")
      case t =>
        graft.operators.Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
