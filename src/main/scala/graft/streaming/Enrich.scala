package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment: join a streaming frame against a STATIC
  * dimension (the lookup/metadata table every event pipeline decorates
  * with). The static side broadcasts into every micro-batch — no stream
  * state, no watermark, unmatched events keep flowing (left join), and
  * the dimension is re-resolvable per trigger if the underlying source
  * changes between batches. This is the third join mode next to the
  * stream-stream interval join (FoodOrdersStream) and the batch surface:
  * at 100 TB the stream never shuffles for a dimension lookup.
  */
object Enrich {
  def withDimension(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")
}
