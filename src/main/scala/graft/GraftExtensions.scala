package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType}

import graft.functions.{CosineSimilarity, DotProduct, JaroWinkler, KllSketch, MinHashSignature, MisraGries, NfcNormalize, ShingleSet, SimHash64, SortedIntersectSize, TopKByScore, VectorSum}

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
    // SQL surface for the same operator: asof_join(...) table function →
    // UnresolvedAsOfJoin placeholder → resolution rule → AsOfJoinPlan
    e.injectResolutionRule(_ => new graft.plans.ResolveAsOfJoin)
    e.injectTableFunction((
      FunctionIdentifier("asof_join"),
      new ExpressionInfo(classOf[graft.plans.AsOfJoinPlan].getName,
        "asof_join"),
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 5 && exprs.length <= 7,
          "asof_join takes (left_table, right_table, keys_csv, left_time, " +
            "right_time[, direction[, strict]])")
        def str(i: Int, what: String): String = exprs(i) match {
          case Literal(v, StringType) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"asof_join: $what must be a string literal, got $other")
        }
        val dir =
          if (exprs.length >= 6) str(5, "direction") else "backward"
        require(dir == "backward" || dir == "forward",
          s"asof_join: direction must be 'backward' or 'forward', got $dir")
        val strict = exprs.length >= 7 && (exprs(6) match {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new IllegalArgumentException(
            s"asof_join: strict must be a boolean literal, got $other")
        })
        graft.plans.UnresolvedAsOfJoin(
          UnresolvedRelation(str(0, "left_table").split('.').toSeq),
          UnresolvedRelation(str(1, "right_table").split('.').toSeq),
          str(2, "keys").split(',').map(_.trim).toSeq,
          str(3, "left_time"), str(4, "right_time"),
          forward = dir == "forward", strict = strict, rightSuffix = "_r")
      }))
    register2(e, "sorted_intersect_size", classOf[SortedIntersectSize],
      SortedIntersectSize(_, _))
    register2(e, "cosine_similarity", classOf[CosineSimilarity],
      CosineSimilarity(_, _))
    register2(e, "dot_product", classOf[DotProduct], DotProduct(_, _))
    register2(e, "jaro_winkler", classOf[JaroWinkler], JaroWinkler(_, _))
    register1(e, "minhash_signature", classOf[MinHashSignature],
      MinHashSignature(_))
    register1(e, "shingle_set", classOf[ShingleSet], ShingleSet(_))
    register1(e, "simhash64", classOf[SimHash64], SimHash64(_))
    register1(e, "nfc", classOf[NfcNormalize], NfcNormalize(_))
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
    e.injectFunction((
      FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketch].getName, "kll_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "kll_sketch takes (value, k)")
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"kll_sketch: k must be an integer literal, got $other")
        }
        KllSketch(exprs.head, k)
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
