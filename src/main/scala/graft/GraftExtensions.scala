package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature, MisraGries, ShingleSet, SimHash64, SortedIntersectSize, TopKByScore, VectorSum}

/** Session extensions: registers the engine's native expressions into the
  * SQL function registry, so `spark.sql("... sorted_intersect_size(a,b)")`
  * works next to the Column API. Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (GraftSession
  * does) or spark.sql.extensions=graft.GraftExtensions on spark-submit. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register1(e: SparkSessionExtensions, name: String,
      clazz: Class[_], build: Expression => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"$name takes exactly 1 argument")
        build(exprs.head)
      }))

  private def register2(e: SparkSessionExtensions, name: String,
      clazz: Class[_], build: (Expression, Expression) => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"$name takes exactly 2 arguments")
        build(exprs.head, exprs(1))
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator extension: the native as-of join's planner strategy
    // (logical node graft.plans.AsOfJoinPlan → physical AsOfJoinExec)
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    register2(e, "sorted_intersect_size", classOf[SortedIntersectSize],
      SortedIntersectSize(_, _))
    register2(e, "cosine_similarity", classOf[CosineSimilarity],
      CosineSimilarity(_, _))
    register2(e, "dot_product", classOf[DotProduct], DotProduct(_, _))
    register1(e, "minhash_signature", classOf[MinHashSignature],
      MinHashSignature(_))
    register1(e, "shingle_set", classOf[ShingleSet], ShingleSet(_))
    register1(e, "simhash64", classOf[SimHash64], SimHash64(_))
    // aggregates: the analyzer wraps a returned AggregateFunction in an
    // AggregateExpression automatically
    register1(e, "vector_sum", classOf[VectorSum], VectorSum(_))
    e.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "topk_by_score takes (score, id, k)")
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score: k must be an integer literal, got $other")
        }
        TopKByScore(exprs.head, exprs(1), k)
      }))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "misra_gries takes (item, k)")
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"misra_gries: k must be an integer literal, got $other")
        }
        MisraGries(exprs.head, k)
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
