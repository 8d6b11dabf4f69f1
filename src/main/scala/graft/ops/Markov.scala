package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov next-state model over per-entity event
  * sequences, with a time-split backtest — the SEQUENCE rung of the
  * prediction ladder (the `Forecast` family predicts per-key COUNTS
  * over time; this predicts the next discrete STATE from the current
  * one). The reference's pipelines stop at co-occurrence affinity
  * (`prod-recommendation-pyspark` has no sequence model at all); this
  * is the minimal next-step model a recommendation / event pipeline
  * backtests before reaching for anything learned.
  *
  * Semantics, end to end deterministic:
  *   1. Adjacent pairs (cur → next) come from `lead` over each
  *      entity's sequence ordered by (tCol, tieCol) — the tie column
  *      (a unique event id) makes the sequence, and therefore every
  *      number downstream, reproducible under any row order.
  *   2. The train/test split is TEMPORAL, not random: pairs whose
  *      current event falls in the first `trainNum/trainDen` of the
  *      observed [min, max] time range (integer arithmetic, floor
  *      division — no float cutoff) train the model; the rest score
  *      it. Backtesting a sequence model on a random split would leak
  *      the future into training.
  *   3. The model is argmax: per current state, the most frequent
  *      next state in training, ties broken by the smaller state
  *      string — a closed-form rank, not an iterative fit.
  *   4. Test accuracy is exact-integer hits/n_test, divided once and
  *      rounded to 6 — the q244 discipline (fixed float expression
  *      over exact longs; no unordered float accumulation anywhere).
  *
  * States never seen in training are dropped (no model row to score);
  * states with no test pairs report n_test 0, acc 0.
  *
  * Scale shape: one window sort per entity (entity-partitioned — the
  * only data-proportional stage), then everything is |states|²-bounded
  * aggregate rows; the time cutoff arrives via a one-row broadcast.
  * Nothing shuffles event payloads after the pair projection.
  *
  * @param events   input frame
  * @param seqKey   entity column partitioning the sequences (user id)
  * @param tCol     integer-typed event time (hours, epoch units, …)
  * @param tieCol   unique per-event column ordering equal-time rows
  * @param stateCol discrete state column (event type)
  * @return (state, n_train, n_test, top_next, acc), one row per state
  *         seen as "current" in training
  */
object Markov {
  def firstOrderBacktest(events: DataFrame, seqKey: String, tCol: String,
                         tieCol: String, stateCol: String,
                         trainNum: Int = 4, trainDen: Int = 5): DataFrame = {
    require(trainNum > 0 && trainDen > trainNum,
      s"train fraction must be in (0,1): $trainNum/$trainDen")
    val seq = Window.partitionBy(col(seqKey))
      .orderBy(col("__t"), col(tieCol))
    val pairs = events
      .select(col(seqKey), col(tCol).cast("long").as("__t"),
        col(tieCol), col(stateCol).as("__cur"))
      .withColumn("__next", lead(col("__cur"), 1).over(seq))
      .filter(col("__next").isNotNull)
      .select(col("__cur"), col("__next"), col("__t"))
    // Integer time cutoff, one-row broadcast (floor division keeps the
    // split reproducible across engines — no float boundary).
    val cut = pairs.agg(min(col("__t")).as("__lo"), max(col("__t")).as("__hi"))
      .select(expr(s"__lo + ((__hi - __lo) * $trainNum) div $trainDen")
        .as("__cut"))
    val split = pairs.crossJoin(broadcast(cut))
    val train = split.filter(col("__t") < col("__cut"))
    val test = split.filter(col("__t") >= col("__cut"))
    val counts = train.groupBy(col("__cur"), col("__next"))
      .agg(count(lit(1)).as("__c"))
    val byFreq = Window.partitionBy(col("__cur"))
      .orderBy(col("__c").desc, col("__next").asc)
    val model = counts.withColumn("__rn", row_number().over(byFreq))
      .filter(col("__rn") === 1)
      .select(col("__cur"), col("__next").as("top_next"))
    val trainN = train.groupBy(col("__cur"))
      .agg(count(lit(1)).as("n_train"))
    val scored = test.join(model, "__cur")
      .groupBy(col("__cur"))
      .agg(count(lit(1)).as("__n_test"),
        sum(when(col("__next") === col("top_next"), 1L).otherwise(0L))
          .as("__hits"))
    model.join(trainN, "__cur").join(scored, Seq("__cur"), "left")
      .select(col("__cur").as(stateCol), col("n_train"),
        coalesce(col("__n_test"), lit(0L)).as("n_test"), col("top_next"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") /
          when(coalesce(col("__n_test"), lit(0L)) === 0L, lit(1L))
            .otherwise(col("__n_test")).cast("double"), 6).as("acc"))
  }
}
